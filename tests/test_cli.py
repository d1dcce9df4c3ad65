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
