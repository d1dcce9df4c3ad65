"""PageRank vs the NumPy power-method oracle — the same oracle design the
reference tests itself against (``algo/tests/test_pagerank.rs:283-475``).

Fast cases compare *fixed-iteration* runs (threshold=None) against the
oracle at the same iteration count — this pins the update rule (including
dangling modes and preference vectors) to ~1e-12. A smaller number of true
convergence runs exercise the reference's L1 stopping bound at the 1e-6
acceptance criterion."""

from __future__ import annotations

import numpy as np
import pytest

from tests.oracles import (
    canonical8,
    clique_cycle,
    erdos_renyi,
    pagerank_power,
    star_hub,
)
from webgraph_rs_spark.graph import graph_from_pandas
from webgraph_rs_spark.algorithms import pagerank


def _ranks_array(result, n):
    out = np.zeros(n)
    for r in result.ranks.collect():
        out[r["id"]] = r["rank"]
    return out


def test_canonical8_all_modes_fixed_iters(spark):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    for mode in ("strongly", "weakly", "pseudo"):
        res = pagerank(g, alpha=0.85, mode=mode, threshold=None, max_iter=25)
        assert res.iterations == 25
        expected = pagerank_power(n, edges, 0.85, mode=mode, fixed_iters=25)
        got = _ranks_array(res, n)
        assert np.allclose(got, expected, atol=1e-12), mode


@pytest.mark.parametrize("k,p,alpha", [(10, 10, 0.25), (20, 50, 0.5)])
def test_clique_cycle_converged(spark, k, p, alpha):
    n, edges = clique_cycle(k, p, bridge="bi")
    g = graph_from_pandas(spark, edges, n)
    res = pagerank(g, alpha=alpha, threshold=1e-7)
    expected = pagerank_power(n, edges, alpha, tol=1e-12)
    assert np.allclose(_ranks_array(res, n), expected, atol=1e-6)


def test_er_converged_default_alpha(spark):
    """The north-rule acceptance: allclose 1e-6 at convergence, alpha=0.85."""
    nn, edges = erdos_renyi(100, 0.1, 1)
    g = graph_from_pandas(spark, edges, nn)
    res = pagerank(g, alpha=0.85, threshold=1e-6)
    expected = pagerank_power(nn, edges, 0.85, tol=1e-12)
    assert np.allclose(_ranks_array(res, nn), expected, atol=1e-6)
    # the L1 stopping bound actually fired (not max_iter)
    assert res.err <= 1e-6


@pytest.mark.parametrize("n,p,seed", [(10, 0.5, 0)])
def test_er_fixed_iters(spark, n, p, seed):
    nn, edges = erdos_renyi(n, p, seed)
    g = graph_from_pandas(spark, edges, nn)
    res = pagerank(g, alpha=0.85, threshold=None, max_iter=30)
    expected = pagerank_power(nn, edges, 0.85, fixed_iters=30)
    assert np.allclose(_ranks_array(res, nn), expected, atol=1e-12)


def test_dangling_and_isolated_mass(spark):
    # star_hub has dangling sinks; vertex table carries 2 extra isolated
    # nodes (SURVEY.md §2 dangling note: n != count of ids seen in edges)
    n, edges = star_hub(30, dangling_leaves=3)
    g = graph_from_pandas(spark, edges, n + 2)
    res = pagerank(g, alpha=0.5, threshold=1e-9)
    expected = pagerank_power(n + 2, edges, 0.5, tol=1e-13)
    got = _ranks_array(res, n + 2)
    assert np.allclose(got, expected, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9  # strongly preferential conserves mass


def test_preference_vector(spark):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    pref = np.zeros(n)
    pref[3] = 0.7
    pref[0] = 0.3
    pref_df = spark.createDataFrame(
        [(i, float(pref[i])) for i in range(n)], "id long, pref double"
    )
    res = pagerank(g, alpha=0.5, preference=pref_df, threshold=1e-9)
    expected = pagerank_power(n, edges, 0.5, mode="strongly", preference=pref, tol=1e-13)
    assert np.allclose(_ranks_array(res, n), expected, atol=1e-6)


def test_permutation_invariance(spark):
    """Relabeling nodes permutes but does not change rank values
    (FIXTURES.md §5)."""
    from webgraph_rs_spark.transforms import permute

    n, edges = erdos_renyi(30, 0.15, 3)
    g = graph_from_pandas(spark, edges, n)
    perm_map = {i: (i * 7 + 2) % n for i in range(n)}  # gcd(7,30)=1 -> bijection
    perm = spark.createDataFrame(list(perm_map.items()), "old_id long, new_id long")
    r1 = _ranks_array(pagerank(g, threshold=None, max_iter=20), n)
    r2 = _ranks_array(pagerank(permute(g, perm), threshold=None, max_iter=20), n)
    for old, new in perm_map.items():
        assert abs(r1[old] - r2[new]) < 1e-12


def test_salted_aggregation_matches(spark):
    n, edges = star_hub(50)
    g = graph_from_pandas(spark, edges, n)
    plain = _ranks_array(pagerank(g, threshold=None, max_iter=15), n)
    salted = _ranks_array(
        pagerank(g, threshold=None, max_iter=15, salt_partitions=4), n
    )
    assert np.allclose(plain, salted, atol=1e-12)
