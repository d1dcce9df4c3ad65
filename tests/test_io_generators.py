"""io (write/read graph, exports, vertex-state formats), generators,
labeled-graph helpers, random permutations."""

from __future__ import annotations

import numpy as np

from tests.oracles import canonical8
from webgraph_rs_spark.graph import graph_from_pandas
from webgraph_rs_spark import io as gio
from webgraph_rs_spark.generators import (
    erdos_renyi,
    pref_attach_like,
    random_permutation,
)
from webgraph_rs_spark.transforms import (
    graphs_equal,
    project_left,
    project_labels,
    zip_labels,
)


def test_graph_roundtrip_with_manifest(spark, tmp_path):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    m = gio.write_graph(g, str(tmp_path / "g"))
    assert m["nodes"] == 8 and m["arcs"] == 11
    back = gio.read_graph(spark, str(tmp_path / "g"), validate=True)
    assert back.num_nodes == 8 and back.num_arcs == 11
    assert graphs_equal(g, back)


def test_manifest_validation_detects_corruption(spark, tmp_path):
    import json
    import pytest

    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    gio.write_graph(g, str(tmp_path / "g2"))
    mpath = tmp_path / "g2" / "manifest.json"
    m = json.loads(mpath.read_text())
    m["edge_checksum"] += 1
    mpath.write_text(json.dumps(m))
    with pytest.raises(ValueError):
        gio.read_graph(spark, str(tmp_path / "g2"), validate=True)


def test_ascii_adjacency_and_arcs_export(spark, tmp_path):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    adj = {r["id"]: r["successors"] for r in gio.to_ascii_adjacency(g).collect()}
    assert adj[2] == "4 7"
    assert adj[7] == ""
    gio.to_arcs_csv(g, str(tmp_path / "arcs"))
    back = spark.read.option("sep", "\t").csv(str(tmp_path / "arcs"))
    assert back.count() == 11


def test_vertex_state_formats(spark, tmp_path):
    st = spark.range(10).selectExpr("id", "cast(id * 0.5 as double) as value")
    for fmt in ("parquet", "csv", "json"):
        gio.write_vertex_state(st, str(tmp_path / fmt), fmt=fmt)
        back = gio.read_vertex_state(spark, str(tmp_path / fmt), fmt=fmt)
        rows = {int(r["id"]): float(r["value"]) for r in back.collect()}
        assert rows == {i: i * 0.5 for i in range(10)}


def test_erdos_renyi_seeded_and_loopless(spark):
    g1 = erdos_renyi(spark, 50, 0.1, seed=7)
    g2 = erdos_renyi(spark, 50, 0.1, seed=7)
    g3 = erdos_renyi(spark, 50, 0.1, seed=8)
    assert graphs_equal(g1, g2)
    assert not graphs_equal(g1, g3)
    assert g1.edges.filter("src = dst").count() == 0
    m = g1.num_arcs
    assert 0.05 * 50 * 49 < m < 0.15 * 50 * 49  # p=0.1 +- slack


def test_pref_attach_like_skew(spark):
    g = pref_attach_like(spark, 2000, out_deg=8, seed=1)
    indeg = (
        g.edges.groupBy("dst").count().orderBy("count", ascending=False).limit(10)
    ).collect()
    avg_in = g.num_arcs / 2000
    # hubs exist: top in-degree way above average
    assert indeg[0]["count"] > 10 * avg_in


def test_random_permutation_is_bijection(spark):
    p = random_permutation(spark, 100, seed=3)
    rows = p.collect()
    assert sorted(r["old_id"] for r in rows) == list(range(100))
    assert sorted(r["new_id"] for r in rows) == list(range(100))
    p2 = {r["old_id"]: r["new_id"] for r in random_permutation(spark, 100, seed=3).collect()}
    assert all(p2[r["old_id"]] == r["new_id"] for r in rows)  # seeded-stable


def test_zip_and_project_labels(spark):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    labels = spark.createDataFrame(
        [(s, d, float(s * 10 + d)) for s, d in edges[:5]],
        "src long, dst long, weight double",
    )
    zg = zip_labels(g, labels)
    assert zg.edges.columns == ["src", "dst", "weight"]
    lab = project_labels(zg, ["weight"])
    got = {(r["src"], r["dst"]): r["weight"] for r in lab.collect()}
    assert got[(0, 1)] == 1.0
    assert got[(6, 7)] is None  # arc without a label -> NULL
    plain = project_left(zg)
    assert plain.edges.columns == ["src", "dst"]
    assert graphs_equal(g, plain)
