from __future__ import annotations

import numpy as np
import pytest

from tests.oracles import (
    brute_triangles,
    canonical8,
    clique_cycle,
    erdos_renyi,
    label_propagation_sync,
    triangles_per_vertex_brute,
)
from webgraph_rs_spark.graph import graph_from_pandas
from webgraph_rs_spark.algorithms import (
    label_propagation,
    triangle_count,
    triangles_per_vertex,
)


def _labels_array(labels_df, n):
    out = np.zeros(n, dtype=np.int64)
    for r in labels_df.collect():
        out[r["id"]] = r["label"]
    return out


@pytest.mark.parametrize("iters", [1, 3, 5])
def test_labelprop_matches_sync_oracle(spark, iters):
    n, edges = erdos_renyi(60, 0.08, seed=4)
    g = graph_from_pandas(spark, edges, n)
    res = label_propagation(g, max_iter=iters)
    expected = label_propagation_sync(n, edges, iters)
    assert (_labels_array(res.labels, n) == expected).all()


def test_labelprop_two_cliques_communities(spark):
    # two 6-cliques joined by one edge -> two communities at convergence
    k = 6
    e1 = [(i, j) for i in range(k) for j in range(k) if i != j]
    e2 = [(i + k, j + k) for i, j in e1]
    edges = e1 + e2 + [(0, k)]
    g = graph_from_pandas(spark, edges, 2 * k)
    res = label_propagation(g, max_iter=20)
    lab = _labels_array(res.labels, 2 * k)
    assert len(set(lab[:k])) == 1
    assert len(set(lab[k:])) == 1


def test_triangles_canonical8_zero(spark):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    # reference fixture graph: FIXTURES.md pins triangles = 0 for the
    # *directed* interpretation; undirected closure has some — use oracle
    assert triangle_count(g) == brute_triangles(n, edges)


def test_triangles_clique_closed_form(spark):
    k = 8
    n, edges = clique_cycle(k, 10, bridge="none")
    g = graph_from_pandas(spark, edges, n)
    # C(k,3) triangles from the clique, none from the cycle
    assert triangle_count(g) == k * (k - 1) * (k - 2) // 6


@pytest.mark.parametrize("n,p,seed", [(30, 0.3, 0), (100, 0.08, 1)])
def test_triangles_er_vs_brute(spark, n, p, seed):
    nn, edges = erdos_renyi(n, p, seed)
    g = graph_from_pandas(spark, edges, nn)
    assert triangle_count(g) == brute_triangles(nn, edges)


def test_triangles_per_vertex(spark):
    nn, edges = erdos_renyi(40, 0.2, seed=5)
    g = graph_from_pandas(spark, edges, nn)
    got = np.zeros(nn, dtype=np.int64)
    for r in triangles_per_vertex(g).collect():
        got[r["id"]] = r["triangles"]
    assert (got == triangles_per_vertex_brute(nn, edges)).all()


def test_triangles_ignore_direction_and_loops(spark):
    # triangle with mixed directions + self loop + reciprocal edge
    edges = [(0, 1), (1, 0), (2, 1), (0, 2), (3, 3)]
    g = graph_from_pandas(spark, edges, 4)
    assert triangle_count(g) == 1
