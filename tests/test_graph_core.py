"""Graph model + transforms, mirroring the reference's transform tests
(``webgraph/tests/test_transpose.rs`` etc.) and invariants (FIXTURES.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracles import canonical8, erdos_renyi
from webgraph_rs_spark.graph import graph_from_pandas, intern_labels
from webgraph_rs_spark import transforms as T
from webgraph_rs_spark.stats import graph_stats, degree_distribution


def test_cardinalities_and_degrees(spark):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    assert g.num_nodes == 8
    assert g.num_arcs == 11
    deg = {r["id"]: (r["out_deg"], r["in_deg"]) for r in g.degrees().collect()}
    # node 0: out 2 in 0 (source); node 7: out 0 in 4 (sink)
    assert deg[0] == (2, 0)
    assert deg[7] == (0, 4)
    assert sum(o for o, _ in deg.values()) == 11
    assert sum(i for _, i in deg.values()) == 11


def test_successors_and_has_arc(spark):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    succ = sorted(r["dst"] for r in g.successors(2).collect())
    assert succ == [4, 7]
    assert g.has_arc(6, 2)
    assert not g.has_arc(7, 0)


def test_transpose_involution(spark):
    n, edges = erdos_renyi(60, 0.1, seed=1)
    g = graph_from_pandas(spark, edges, n)
    tt = T.transpose(T.transpose(g))
    assert T.graphs_equal(g, tt)


def test_symmetrize_is_symmetric_and_loopless(spark):
    n, edges = erdos_renyi(60, 0.1, seed=2)
    g = graph_from_pandas(spark, edges + [(5, 5)], n)
    s = T.symmetrize(g)
    assert T.is_symmetric(s)
    assert s.edges.filter(F.col("src") == F.col("dst")).count() == 0
    # idempotent
    assert T.graphs_equal(s, T.symmetrize(s))


def test_permute_roundtrip(spark):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    perm = spark.createDataFrame(
        [(i, (i * 3 + 1) % 8) for i in range(8)], "old_id long, new_id long"
    )  # bijection since gcd(3,8)=1
    p = T.permute(g, perm)
    assert p.edges.count() == g.num_arcs
    back = T.permute(p, T.invert_permutation(perm))
    assert T.graphs_equal(g, back)


def test_map_nodes_contraction(spark):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    mapping = spark.createDataFrame(
        [(i, i % 2) for i in range(8)], "old_id long, new_id long"
    )
    q = T.map_nodes(g, mapping)
    got = {(r["src"], r["dst"]) for r in q.edges.collect()}
    expected = {(s % 2, d % 2) for s, d in edges}
    assert got == expected


def test_union_and_diff(spark):
    n, e = canonical8()
    g1 = graph_from_pandas(spark, e[:6], n)
    g2 = graph_from_pandas(spark, e[4:], n)
    u = T.union_graphs(g1, g2)
    assert u.edges.count() == len(e)
    d = T.edge_diff(g1, g2)
    assert d.count() == len(e[:4]) + len(e[6:])


def test_intern_labels_dense_bijection(spark):
    arcs = spark.createDataFrame(
        [("b.com", "a.com"), ("a.com", "c.com"), ("c.com", "a.com")],
        "src string, dst string",
    )
    e, d = intern_labels(arcs)
    ids = sorted(r["id"] for r in d.collect())
    assert ids == [0, 1, 2]
    names = {r["name"]: r["id"] for r in d.collect()}
    got = {(r["src"], r["dst"]) for r in e.collect()}
    assert got == {
        (names["b.com"], names["a.com"]),
        (names["a.com"], names["c.com"]),
        (names["c.com"], names["a.com"]),
    }


def test_graph_stats(spark):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    row = graph_stats(g).collect()[0]
    assert row["nodes"] == 8
    assert row["arcs"] == 11
    assert row["dangling"] == 1  # node 7
    assert row["sources"] == 1  # node 0
    assert row["self_loops"] == 0
    dist = {r["deg"]: r["n_nodes"] for r in degree_distribution(g, "out").collect()}
    assert dist[0] == 1  # sink
    assert sum(k * v for k, v in dist.items()) == 11
