"""Golden-count regression test on the cnr-2000-*style* synthetic graph
(FIXTURES.md §3): a seeded deterministic web-like graph with golden outputs
pinned after validation against independent python oracles (union-find,
brute-force triangles, NumPy power method) — the same pattern as the
reference's cnr-2000 goldens (``algo/tests/test_sccs.rs:183-210``,
SCC count 100,977 pinned forever).

If these ever change, either the generator or an algorithm regressed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webgraph_rs_spark.generators import pref_attach_like

N = 5000
GOLDEN_ARCS = 38905
GOLDEN_NUM_CC = 1
GOLDEN_TRIANGLES = 764
GOLDEN_TOP10 = [0, 1, 7, 2, 3, 5, 51, 12, 33, 29]
GOLDEN_TOP1_RANK = 0.00562251  # rounded to 8 decimals


@pytest.fixture(scope="module")
def golden_graph(spark):
    g = pref_attach_like(spark, N, out_deg=8, seed=42)
    g.edges.persist()
    yield g
    g.edges.unpersist()


def test_golden_arc_count(golden_graph):
    assert golden_graph.num_arcs == GOLDEN_ARCS


def test_golden_cc_count(golden_graph):
    from webgraph_rs_spark.algorithms import connected_components, component_sizes

    labels = connected_components(golden_graph).labels
    assert component_sizes(labels).count() == GOLDEN_NUM_CC


def test_golden_triangles(golden_graph):
    from webgraph_rs_spark.algorithms import triangle_count

    assert triangle_count(golden_graph) == GOLDEN_TRIANGLES


def test_golden_pagerank_top10(golden_graph):
    from webgraph_rs_spark.algorithms import pagerank

    res = pagerank(golden_graph, alpha=0.85, threshold=1e-7)
    top = (
        res.ranks.orderBy(F.col("rank").desc(), F.col("id").asc())
        .limit(10)
        .collect()
    )
    assert [r["id"] for r in top] == GOLDEN_TOP10
    assert abs(round(top[0]["rank"], 8) - GOLDEN_TOP1_RANK) < 2e-7
