"""Directed SCC (trim + coloring FW-BW) vs a pure-Python Kosaraju oracle.

Mirrors the reference's own SCC test strategy (``algo/tests/test_sccs.rs``:
Tarjan checked against Kosaraju on seeded ER graphs, plus a golden component
count on cnr-2000 at ``:196-198`` — here the pref-attach fixture plays the
cnr role, see FIXTURES.md §3).
"""

from __future__ import annotations

import pytest

from webgraph_rs_spark.graph import graph_from_pandas, from_edges
from webgraph_rs_spark.generators import erdos_renyi, pref_attach_like
from webgraph_rs_spark.algorithms import (
    strongly_connected_components,
    condensation,
    is_acyclic,
    renumber_by_size,
)
from tests.oracles import kosaraju_scc


def _labels_dict(res):
    return {r["id"]: r["label"] for r in res.labels.collect()}


def test_scc_cycle_with_tendrils(spark):
    # 4-cycle {0,1,2,3}; in-tendril 4->5->0; out-tendril 3->6->7
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 0), (3, 6), (6, 7)]
    g = graph_from_pandas(spark, edges, 8)
    got = _labels_dict(strongly_connected_components(g))
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 6, 7: 7}


def test_scc_two_cycles_bridge(spark):
    # two 3-cycles joined by a one-way bridge: distinct SCCs
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    g = graph_from_pandas(spark, edges, 6)
    got = _labels_dict(strongly_connected_components(g))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    # back edge merges them into one SCC
    g2 = graph_from_pandas(spark, edges + [(5, 1)], 6)
    got2 = _labels_dict(strongly_connected_components(g2))
    assert set(got2.values()) == {0}


def test_scc_chain_all_singletons(spark):
    edges = [(i, i + 1) for i in range(11)]
    g = graph_from_pandas(spark, edges, 12)
    got = _labels_dict(strongly_connected_components(g))
    assert got == {i: i for i in range(12)}


@pytest.mark.parametrize(
    "n,p,seed",
    [
        (60, 0.05, 1),  # np=3: giant SCC regime
        (120, 0.02, 2),  # np=2.4
        (200, 0.006, 3),  # np=1.2: fragmented, many small SCCs
    ],
)
def test_scc_er_vs_kosaraju(spark, n, p, seed):
    g = erdos_renyi(spark, n, p, seed=seed)
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    exp = kosaraju_scc(n, edges)
    got = _labels_dict(strongly_connected_components(g))
    assert len(got) == n
    mism = {i: (got[i], int(exp[i])) for i in range(n) if got[i] != exp[i]}
    assert not mism, f"{len(mism)} mismatches, first: {list(mism.items())[:5]}"


def test_scc_condensation_is_acyclic_and_renumber(spark):
    g = erdos_renyi(spark, 80, 0.04, seed=9)
    res = strongly_connected_components(g)
    cond = condensation(g, res.labels)
    comp_ids = res.labels.select(res.labels.label.alias("id")).distinct()
    cg = from_edges(spark, cond, vertices=comp_ids)
    assert is_acyclic(cg)
    # renumber-by-size: labels 0..k-1, label 0 = the largest component
    ren = renumber_by_size(res.labels)
    sizes = {
        r["label"]: r["cnt"]
        for r in ren.groupBy("label").count().withColumnRenamed("count", "cnt").collect()
    }
    assert set(sizes) == set(range(len(sizes)))
    ordered = [sizes[k] for k in sorted(sizes)]
    assert ordered == sorted(ordered, reverse=True)


def test_scc_golden_pref_attach(spark):
    """Golden: component census of the deterministic pref-attach fixture
    (the cnr-2000-style graph of FIXTURES.md §3) matches the Kosaraju
    oracle computed on the collected edge list."""
    g = pref_attach_like(spark, 1500, out_deg=4, seed=7)
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    exp = kosaraju_scc(1500, edges)
    import numpy as np

    exp_n_comp = len(np.unique(exp))
    exp_giant = int(np.bincount(exp).max())
    res = strongly_connected_components(g)
    got_n = res.labels.select("label").distinct().count()
    got_giant = (
        res.labels.groupBy("label").count().agg({"count": "max"}).collect()[0][0]
    )
    assert (got_n, got_giant) == (exp_n_comp, exp_giant)


def test_restrict_broadcast_is_size_gated(spark, monkeypatch):
    """The alive-set semi-joins must NOT broadcast once the alive set
    exceeds BROADCAST_VERTEX_LIMIT (web-scale round 1: O(n) rows), and
    the shuffled fallback must still key its final exchange on the
    layout column so the persisted layout survives the restrict."""
    from webgraph_rs_spark.algorithms import sccs as S

    g = graph_from_pandas(spark, [(i, (i + 1) % 50) for i in range(50)], 50)
    alive = g.vertices.select("id")

    import contextlib
    import io

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="extended")
        return buf.getvalue()

    # small alive -> broadcast on both sides
    plan_small = plan_of(S._restrict(g.edges, alive, "src", n_alive=50))
    assert "broadcast" in plan_small.lower()

    monkeypatch.setattr(S, "BROADCAST_VERTEX_LIMIT", 10)
    plan_big = plan_of(S._restrict(g.edges, alive, "src", n_alive=50))
    assert "BroadcastExchange" not in plan_big
    assert "ShuffledHashJoin" in plan_big
    # end-to-end SCC still correct under the shuffled fallback
    res = S.strongly_connected_components(g)
    assert res.labels.select("label").distinct().count() == 1


def test_scc_kill_and_resume(spark, tmp_path):
    """Outer-round durability: two 2-cycles in one color class (edge from
    the high-id cycle into the low-id one) force two FW-BW rounds; a run
    capped at max_outer=1 with a checkpoint store resumes at round 1 and
    finishes identical to an uninterrupted run."""
    from webgraph_rs_spark.algorithms.sccs import strongly_connected_components

    # cycle {4,5} -> cycle {0,1}: color 5 covers everything, so round 1
    # extracts only SCC {4,5}; {0,1} needs round 2
    edges = [(4, 5), (5, 4), (0, 1), (1, 0), (5, 0)]
    g = graph_from_pandas(spark, edges, 6)

    full = strongly_connected_components(g)
    assert full.rounds >= 2
    want = _labels_dict(full)

    ck = str(tmp_path / "scc")
    part = strongly_connected_components(g, max_outer=1, checkpoint_dir=ck)
    assert part.rounds == 1
    assert len(_labels_dict(part)) < len(want)  # genuinely incomplete

    resumed = strongly_connected_components(g, checkpoint_dir=ck)
    assert resumed.resumed_from == 1
    assert _labels_dict(resumed) == want
    # resuming the now-complete run is a stable no-op
    again = strongly_connected_components(g, checkpoint_dir=ck)
    assert _labels_dict(again) == want
