"""CLI surface: the ``webgraph`` binary analogue drives the library
end-to-end through stored graphs (read_graph/write_graph round trips)."""

from __future__ import annotations

import json
import os


def _run(capsys, *argv: str) -> list[dict]:
    from webgraph_rs_spark.cli import main

    assert main(["--master", "local[4]", "--shuffle-partitions", "4", *argv]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    return [json.loads(line) for line in out if line.startswith("{")]


def test_cli_roundtrip_and_algorithms(spark, tmp_path, capsys):
    arcs = tmp_path / "arcs.tsv"
    arcs.write_text("0\t1\n1\t2\n2\t0\n2\t3\n3\t4\n")
    gdir = str(tmp_path / "g")

    man = _run(capsys, "from-arcs", "--input", str(arcs), "--output", gdir)[-1]
    assert (man["nodes"], man["arcs"]) == (5, 5)

    stats = _run(capsys, "stats", "--graph", gdir, "--validate")[-1]
    assert stats["dangling"] == 1 and stats["max_out_deg"] == 2

    pr_out = str(tmp_path / "ranks")
    hdr = _run(capsys, "pagerank", "--graph", gdir, "--threshold", "1e-7",
               "--out", pr_out)[0]
    assert hdr["err"] < 1e-7
    ranks = spark.read.parquet(pr_out)
    assert abs(ranks.groupBy().sum("rank").collect()[0][0] - 1.0) < 1e-9

    scc_out = str(tmp_path / "scc")
    hdr = _run(capsys, "sccs", "--graph", gdir, "--renumber", "--out", scc_out)[0]
    assert hdr["components"] == 3  # {0,1,2} cycle + singletons 3, 4
    labels = {r["id"]: r["label"] for r in spark.read.parquet(scc_out).collect()}
    assert labels[0] == labels[1] == labels[2] == 0  # largest first

    ss = _run(capsys, "sumsweep", "--graph", gdir, "--mode", "radius_diameter")[0]
    assert ss["converged"]
    # ecc: 0->..->4 longest is from 0: 0,1,2,3,4 => ecc(0)=... path 0-1-2-3-4
    assert ss["diameter"] == 4

    tdir = str(tmp_path / "gt")
    _run(capsys, "transpose", "--graph", gdir, "--output", tdir)
    assert os.path.exists(os.path.join(tdir, "manifest.json"))
    bfs_rows = _run(capsys, "bfs", "--graph", tdir, "--root", "4", "--tree")
    by_id = {r["id"]: r for r in bfs_rows}
    assert by_id[3]["distance"] == 1 and by_id[3]["pred"] == 4


def test_cli_bv_roundtrip(spark, tmp_path, capsys):
    """to-bv -> from-bv closes the real-format loop from the CLI."""
    arcs = tmp_path / "arcs3.tsv"
    arcs.write_text("0\t1\n0\t2\n1\t2\n2\t0\n3\t1\n")
    gdir = str(tmp_path / "g3")
    _run(capsys, "from-arcs", "--input", str(arcs), "--output", gdir)

    bv = str(tmp_path / "bv" / "g3")
    stats = _run(capsys, "to-bv", "--graph", gdir, "--output", bv)[-1]
    assert (stats["nodes"], stats["arcs"]) == (4, 5)
    assert os.path.exists(bv + ".graph")
    assert os.path.exists(bv + ".offsets")
    assert os.path.exists(bv + ".properties")

    g2dir = str(tmp_path / "g3_back")
    man = _run(capsys, "from-bv", "--input", bv, "--output", g2dir)[-1]
    assert (man["nodes"], man["arcs"]) == (4, 5)
    edges = {
        (r["src"], r["dst"])
        for r in spark.read.parquet(os.path.join(g2dir, "edges")).collect()
    }
    assert edges == {(0, 1), (0, 2), (1, 2), (2, 0), (3, 1)}


def test_cli_transform_and_check_surface(spark, tmp_path, capsys):
    arcs = tmp_path / "arcs2.tsv"
    arcs.write_text("0\t1\n1\t0\n1\t2\n2\t1\n")
    gdir = str(tmp_path / "g2")
    _run(capsys, "from-arcs", "--input", str(arcs), "--output", gdir)

    chk = _run(capsys, "check-symm", "--graph", gdir)[-1]
    assert chk == {"asymmetric_arcs": 0, "symmetric": True}

    eq = _run(capsys, "check-eq", "--graph", gdir, "--other", gdir)[-1]
    assert eq == {"equal": True}

    loc = _run(capsys, "locality", "--graph", gdir)[-1]
    assert loc["arcs"] == 4

    perm_out = str(tmp_path / "perm")
    _run(capsys, "perm-rand", "--n", "3", "--seed", "7", "--out", perm_out)
    prm = {r["old_id"]: r["new_id"] for r in spark.read.parquet(perm_out).collect()}
    assert sorted(prm.values()) == [0, 1, 2]

    pg = str(tmp_path / "gp")
    _run(capsys, "permute", "--graph", gdir, "--perm", perm_out, "--output", pg)
    eq2 = _run(capsys, "check-eq", "--graph", gdir, "--other", pg)[-1]
    # a permuted graph generally differs as an edge set but keeps arc count
    man = json.loads(open(os.path.join(pg, "manifest.json")).read())
    assert man["arcs"] == 4

    comp_out = str(tmp_path / "comp")
    _run(capsys, "perm-comp", "--first", perm_out, "--second", perm_out,
         "--out", comp_out)
    comp = {r["old_id"]: r["new_id"] for r in spark.read.parquet(comp_out).collect()}
    assert comp == {k: prm[prm[k]] for k in prm}

    # bipartite birank through the CLI
    bip = tmp_path / "bip"
    spark.createDataFrame(
        [(0, 10), (0, 11), (1, 10), (2, 12)], "u long, p long"
    ).write.parquet(str(bip))
    uout, iout = str(tmp_path / "bu"), str(tmp_path / "bi")
    hdr = _run(capsys, "birank", "--edges", str(bip), "--max-iter", "5",
               "--threshold", "1e-12", "--out-users", uout,
               "--out-items", iout)[0]
    assert hdr["iterations"] >= 1
    assert spark.read.parquet(uout).count() == 3
    assert spark.read.parquet(iout).count() == 3
