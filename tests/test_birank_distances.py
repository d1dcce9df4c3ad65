"""BiRank vs a NumPy oracle; exact distances/centralities/ecc vs brute
force; HyperBall estimates vs the exact neighborhood function."""

from __future__ import annotations

import numpy as np
import pytest

from tests.oracles import canonical8, erdos_renyi
from webgraph_rs_spark.graph import graph_from_pandas
from webgraph_rs_spark.algorithms.birank import birank
from webgraph_rs_spark.algorithms.distances import (
    all_pairs_distances,
    eccentricities,
    geometric_centralities,
    hyperball,
    neighborhood_function,
    radius_diameter,
)


def birank_numpy(n_u, n_p, edges, alpha, beta, iters):
    W = np.zeros((n_u, n_p))
    for u, p in edges:
        W[u, p] += 1.0
    du = W.sum(axis=1)
    dp = W.sum(axis=0)
    S = W / np.sqrt(np.outer(np.where(du > 0, du, 1), np.where(dp > 0, dp, 1)))
    S[du == 0, :] = 0
    S[:, dp == 0] = 0
    u0 = np.full(n_u, 1.0 / n_u)
    p0 = np.full(n_p, 1.0 / n_p)
    u, p = u0.copy(), p0.copy()
    for _ in range(iters):
        p = beta * (S.T @ u) + (1 - beta) * p0
        u = alpha * (S @ p) + (1 - alpha) * u0
    return u, p


def test_birank_vs_numpy(spark):
    rng = np.random.default_rng(5)
    n_u, n_p = 20, 15
    edges = [(int(u), int(p)) for u, p in
             zip(rng.integers(0, n_u, 120), rng.integers(0, n_p, 120))]
    edges = sorted(set(edges))
    e = spark.createDataFrame(edges, "u long, p long")
    users = spark.range(n_u).select("id")
    items = spark.range(n_p).select("id")
    res = birank(e, users, items, alpha=0.8, beta=0.7, threshold=None, max_iter=12)
    eu, ep = birank_numpy(n_u, n_p, edges, 0.8, 0.7, 12)
    gu = np.zeros(n_u)
    for r in res.user_ranks.collect():
        gu[r["id"]] = r["rank"]
    gp = np.zeros(n_p)
    for r in res.item_ranks.collect():
        gp[r["id"]] = r["rank"]
    assert np.allclose(gu, eu, atol=1e-10)
    assert np.allclose(gp, ep, atol=1e-10)


def test_birank_converges(spark):
    e = spark.createDataFrame([(0, 0), (0, 1), (1, 1), (2, 0)], "u long, p long")
    res = birank(e, spark.range(3), spark.range(2), threshold=1e-8, max_iter=200)
    assert res.iterations < 200
    assert res.metrics_history[-1]["l1_delta"] <= 1e-8


def _brute_apsp(n, edges):
    from collections import deque

    adj = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
    dist = {}
    for r in range(n):
        dd = {r: 0}
        q = deque([r])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dd:
                    dd[w] = dd[u] + 1
                    q.append(w)
        for k, v in dd.items():
            dist[(r, k)] = v
    return dist


def test_all_pairs_distances_and_nf(spark):
    n, edges = canonical8()
    g = graph_from_pandas(spark, edges, n)
    res = all_pairs_distances(g)
    got = {(r["root"], r["id"]): r["distance"] for r in res.distances.collect()}
    exp = _brute_apsp(n, edges)
    assert got == exp
    nf = {r["r"]: r["pairs"] for r in neighborhood_function(res.distances).collect()}
    for r in nf:
        assert nf[r] == sum(1 for d in exp.values() if d <= r)


def test_centralities_and_ecc(spark):
    nn, edges = erdos_renyi(60, 0.06, 9)
    g = graph_from_pandas(spark, edges, nn)
    res = all_pairs_distances(g)
    exp = _brute_apsp(nn, edges)
    cent = {r["id"]: r for r in geometric_centralities(res.distances, g.vertices).collect()}
    ecc = {r["id"]: r["ecc"] for r in eccentricities(res.distances, g.vertices).collect()}
    for v in range(nn):
        ds = {u: d for (r, u), d in exp.items() if r == v}
        sum_d = sum(ds.values())
        assert cent[v]["reachable"] == len(ds)
        assert cent[v]["sum_dist"] == sum_d
        harm = sum(1.0 / d for d in ds.values() if d > 0)
        assert abs(cent[v]["harmonic"] - round(harm, 6)) < 1e-9
        assert ecc[v] == max(ds.values())
    r, d = radius_diameter(res.distances, g.vertices)
    eccs = [max(d2 for (rr, _), d2 in exp.items() if rr == v) if True else 0
            for v in range(nn)]
    eccs = [max((dd for (rr, _u), dd in exp.items() if rr == v), default=0)
            for v in range(nn)]
    assert (r, d) == (min(eccs), max(eccs))


def test_hyperball_tracks_exact_nf(spark):
    nn, edges = erdos_renyi(300, 0.015, 11)
    g = graph_from_pandas(spark, edges, nn)
    exact = all_pairs_distances(g)
    nf_exact = {r["r"]: r["pairs"] for r in neighborhood_function(exact.distances).collect()}
    hb = hyperball(g, max_iter=20, rel_tol=1e-4)
    # estimates within HLL error (256 registers ~ 6.5% std err; allow 15%)
    for t, est in enumerate(hb.neighborhood_function):
        if t in nf_exact:
            assert abs(est - nf_exact[t]) / nf_exact[t] < 0.15, (t, est, nf_exact[t])
    # final reachable estimates track exact reachable counts
    reach_exact = {}
    for r in exact.distances.collect():
        reach_exact[r["root"]] = reach_exact.get(r["root"], 0) + 1
    cent = {r["id"]: r["reachable_est"] for r in hb.centralities.collect()}
    rel = [abs(cent[v] - reach_exact[v]) / reach_exact[v] for v in reach_exact]
    assert np.mean(rel) < 0.12


def test_exact_sum_sweep_vs_all_pairs(spark):
    """SumSweep radius/diameter/eccentricities certified over ALL nodes must
    equal the brute-force all-pairs answer — on a strongly-connected-ish ER
    graph and on a fragmented one (multi-SCC upper-bound guard path)."""
    from webgraph_rs_spark.algorithms.distances import exact_sum_sweep

    for n, p, seed in ((80, 0.06, 5), (60, 0.02, 6)):
        nn, edges = erdos_renyi(n, p, seed)
        g = graph_from_pandas(spark, edges, nn)
        exact = all_pairs_distances(g)
        ecc_exact = {
            r["id"]: r["ecc"]
            for r in eccentricities(exact.distances, g.vertices).collect()
        }
        r_exact, d_exact = radius_diameter(exact.distances, g.vertices)
        res = exact_sum_sweep(g, mode="all")
        assert res.converged
        got = {r["id"]: r["ecc"] for r in res.eccentricities.collect()}
        assert got == ecc_exact
        assert (res.radius, res.diameter) == (r_exact, d_exact)
        rd = exact_sum_sweep(g, mode="radius_diameter")
        assert rd.converged
        assert (rd.radius, rd.diameter) == (r_exact, d_exact)
        # the whole point: certification without n sweeps
        assert rd.pivots_used < n


def test_exact_sum_sweep_backward_eccentricities(spark):
    """mode="all" (the reference's All level, exact_sum_sweep/mod.rs:261-264)
    certifies BACKWARD eccentricities too — checked against forward ecc on
    the transposed graph."""
    from webgraph_rs_spark.algorithms.distances import exact_sum_sweep

    nn, edges = erdos_renyi(70, 0.06, 9)
    g = graph_from_pandas(spark, edges, nn)
    gt = graph_from_pandas(spark, [(d, s) for s, d in edges], nn)
    exact_t = all_pairs_distances(gt)
    becc_exact = {
        r["id"]: r["ecc"]
        for r in eccentricities(exact_t.distances, gt.vertices).collect()
    }
    res = exact_sum_sweep(g, mode="all")
    assert res.converged
    got = {r["id"]: r["ecc"] for r in res.backward_eccentricities.collect()}
    assert got == becc_exact


def test_exact_sum_sweep_regular_graph_stays_exact(spark):
    """Eccentricity-regular graphs are SumSweep's known worst case: all
    ecc equal means no extremal structure for the bounds to exploit, and
    triangle-family bounds cannot certify below d(v, pivot) + ecc(pivot)
    (measured: same-SCC scc_graph.rs-style tightening rules changed the
    pivot count by exactly zero — see the exact_sum_sweep docstring).
    The contract on this family is graceful degradation: batched
    all-sources BFS, still EXACT, still converged=True."""
    from webgraph_rs_spark.algorithms.distances import exact_sum_sweep

    # circulant: i -> i+1, i+2 (mod n); vertex-transitive => regular
    n = 60
    pairs = [(i, (i + d) % n) for i in range(n) for d in (1, 2)]
    g = graph_from_pandas(spark, pairs, n)
    exact = all_pairs_distances(g)
    ecc_exact = {
        r["id"]: r["ecc"]
        for r in eccentricities(exact.distances, g.vertices).collect()
    }
    assert len(set(ecc_exact.values())) == 1  # regular by construction
    res = exact_sum_sweep(g, mode="all")
    assert res.converged
    got = {r["id"]: r["ecc"] for r in res.eccentricities.collect()}
    assert got == ecc_exact
    assert (res.radius, res.diameter) == (n // 2, n // 2)


def test_exact_sum_sweep_nonconverged_reports_none_not_sentinel(spark):
    """With the pivot budget exhausted before certification, uncertified
    radius/diameter must be None with honest [lo, hi] intervals — never
    the 2^62 sentinel (ADVICE r2)."""
    from webgraph_rs_spark.algorithms.distances import exact_sum_sweep

    n = 40
    pairs = [(i, (i + d) % n) for i in range(n) for d in (1, 2)]
    g = graph_from_pandas(spark, pairs, n)
    res = exact_sum_sweep(g, mode="radius_diameter", batch=4, max_pivots=4)
    assert not res.converged
    true_ecc = n // 2
    for val, (lo, hi) in (
        (res.radius, res.radius_interval),
        (res.diameter, res.diameter_interval),
    ):
        if val is None:
            assert lo <= true_ecc and lo < (1 << 62)
            assert hi is None or (lo <= true_ecc <= hi and hi < (1 << 62))
        else:
            assert val == true_ecc  # certified values must be exact


def test_hyperball_node_weights(spark):
    """Weighted HyperBall (hyperball.rs:542-576,866-884): seeding node v
    with weight(v) distinct elements makes reachable_est estimate the
    total WEIGHT of the ball; weight-0 nodes contribute nothing."""
    from webgraph_rs_spark.algorithms.distances import hyperball

    nn, edges = erdos_renyi(150, 0.025, 12)
    g = graph_from_pandas(spark, edges, nn)
    # deterministic weights: node i has weight i % 5 (includes zeros)
    wrows = [(i, i % 5) for i in range(nn)]
    wdf = spark.createDataFrame(wrows, "id long, weight long")
    wmap = dict(wrows)
    exact = all_pairs_distances(g)
    wreach = {i: wmap[i] for i in range(nn)}
    for r in exact.distances.collect():
        if r["id"] != r["root"]:
            wreach[r["root"]] += wmap[r["id"]]
    hb = hyperball(g, max_iter=30, rel_tol=1e-5, weights=wdf)
    est = {r["id"]: r["reachable_est"] for r in hb.centralities.collect()}
    rel = [
        abs(est[v] - wreach[v]) / wreach[v]
        for v in wreach
        if wreach[v] > 0
    ]
    assert np.mean(rel) < 0.12
    # weight-0 node with no outgoing reach ... every node has weight-0
    # peers in its ball; global sanity: totals track
    tot_est = sum(est.values())
    tot_true = sum(wreach.values())
    assert abs(tot_est - tot_true) / tot_true < 0.1


def test_systolic_change_detection_probe(spark):
    """Measured negative result pinned as a regression guard (r4 VERDICT
    item 7): the systolic frontier keys on (full-double estimate,
    serialized length) because Spark's datasketches surface exposes no
    register digest. This probe unions a base sketch with hundreds of
    singleton sketches in both the list/sparse regime (small base) and
    the promoted dense regime (600-element base at lg_k=11) and asserts
    every byte-level sketch change also moved the (estimate, length)
    pair — i.e. the theoretical linear-counting-plateau collision does
    not materialize on this datasketches build. If this ever fails, the
    systolic frontier key has developed a real blind spot: revisit
    hyperball's `moved` predicate."""
    from pyspark.sql import functions as F

    for lg_k, base_lo, base_n, cands in ((11, 10_000, 600, 400), (11, 50_000, 60, 400), (4, 1_000, 200, 200)):
        base = spark.range(base_lo, base_lo + base_n).select(F.col("id").alias("v"))
        S = bytes(base.agg(F.hll_sketch_agg("v", F.lit(lg_k)).alias("s")).collect()[0]["s"])
        row = spark.createDataFrame([(S,)], "s binary").select(
            F.hll_sketch_estimate("s").alias("e"), F.octet_length("s").alias("l")
        ).collect()[0]
        eS, lS = float(row["e"]), int(row["l"])
        cand = spark.range(0, cands).select(F.col("id").alias("b"))
        sk_b = cand.groupBy("b").agg(F.hll_sketch_agg("b", F.lit(lg_k)).alias("sb"))
        stacked = sk_b.select("b", F.explode(F.array("sb", F.lit(S))).alias("sk"))
        u = stacked.groupBy("b").agg(F.hll_union_agg("sk").alias("u"))
        agg = u.select(
            (~(F.col("u") == F.lit(S))
             & (F.hll_sketch_estimate("u") == F.lit(eS))
             & (F.octet_length("u") == F.lit(lS))).alias("missed"),
            (~(F.col("u") == F.lit(S))).alias("changed"),
        ).agg(
            F.sum(F.when(F.col("missed"), 1).otherwise(0)).alias("m"),
            F.sum(F.when(F.col("changed"), 1).otherwise(0)).alias("c"),
        ).collect()[0]
        assert int(agg["c"]) > 0  # the probe actually exercised changes
        assert int(agg["m"]) == 0, (
            f"lg_k={lg_k}: {agg['m']} sketch changes invisible to the "
            "(estimate, length) frontier key"
        )


def test_hyperball_kill_and_resume(spark, tmp_path):
    """North-rule durability for HyperBall: a run truncated at max_iter=3
    with a checkpoint store resumes from its last complete iteration and
    finishes IDENTICAL (per-node centralities) to an uninterrupted run —
    HLL register union is order-independent, so estimates reproduce
    exactly."""
    from webgraph_rs_spark.graph import graph_from_pandas
    from webgraph_rs_spark.algorithms.distances import hyperball

    edges = [(i, (i + 1) % 40) for i in range(40)] + [(i, (i * 7 + 3) % 40) for i in range(40)]
    g = graph_from_pandas(spark, edges, 40)

    full = hyperball(g, max_iter=30, rel_tol=0.0, systolic_threshold=0.25)

    ck = str(tmp_path / "hb")
    part = hyperball(
        g, max_iter=3, rel_tol=0.0, checkpoint_dir=ck, checkpoint_every=2
    )
    assert part.iterations == 3
    resumed = hyperball(
        g, max_iter=30, rel_tol=0.0, checkpoint_dir=ck, checkpoint_every=2
    )
    assert resumed.resumed_from is not None and resumed.resumed_from >= 2
    assert resumed.iterations == full.iterations

    a = {r["id"]: (r["reachable_est"], r["sum_dist_est"], r["harmonic_est"])
         for r in full.centralities.collect()}
    b = {r["id"]: (r["reachable_est"], r["sum_dist_est"], r["harmonic_est"])
         for r in resumed.centralities.collect()}
    assert a == b
    # resuming a finished run is a no-op returning the stored state
    again = hyperball(g, max_iter=30, rel_tol=0.0, checkpoint_dir=ck)
    assert {r["id"]: r["reachable_est"] for r in again.centralities.collect()} == {
        k: v[0] for k, v in a.items()
    }


def test_hyperball_reltol_converged_resume_is_noop(spark, tmp_path):
    """ADVICE r4: a run that converged via rel_grow < rel_tol with
    changed > 0 stores converged=True, so resume returns the stored
    centralities without running an extra iteration (identical values,
    no iteration count growth)."""
    from webgraph_rs_spark.algorithms.distances import hyperball
    from webgraph_rs_spark.graph import graph_from_pandas

    # dense-ish graph where estimates keep jittering (changed > 0) while
    # relative neighborhood growth collapses under a loose rel_tol
    edges = [(i, (i + 1) % 30) for i in range(30)] + [
        (i, (i * 11 + 5) % 30) for i in range(30)
    ]
    g = graph_from_pandas(spark, edges, 30)
    ck = str(tmp_path / "hbrt")
    first = hyperball(
        g, max_iter=50, rel_tol=0.5, checkpoint_dir=ck, checkpoint_every=1
    )
    assert first.metrics_history[-1]["changed"] > 0  # converged via rel_tol
    assert first.metrics_history[-1]["rel_grow"] < 0.5
    again = hyperball(
        g, max_iter=50, rel_tol=0.5, checkpoint_dir=ck, checkpoint_every=1
    )
    assert again.resumed_from == first.iterations
    assert again.iterations == first.iterations  # no extra iteration ran
    a = {r["id"]: (r["reachable_est"], r["sum_dist_est"], r["harmonic_est"])
         for r in first.centralities.collect()}
    b = {r["id"]: (r["reachable_est"], r["sum_dist_est"], r["harmonic_est"])
         for r in again.centralities.collect()}
    assert a == b


def test_exact_sum_sweep_pivotless_scc_chain(spark):
    """The web-graph convergence shape (found on cnr-2000, r5): many small
    pivot-less SCCs. ``fu(v) <= 1 + max succ fu(w)`` alone is a fixed
    point at infinity inside every non-trivial SCC without a pivot, so
    pre-r5 certification needed a pivot PER SCC; the condensation pass
    (_SccDagBounds) must close them all within a couple of batches.

    Shape: K disjoint 2-cycles {2i, 2i+1} chained 2i+1 -> 2i+2, plus a
    tail of singletons — radius/diameter must match brute force with far
    fewer pivots than SCCs."""
    from webgraph_rs_spark.algorithms.distances import exact_sum_sweep

    K = 24
    edges = []
    for i in range(K):
        a, b = 2 * i, 2 * i + 1
        edges += [(a, b), (b, a)]
        if i + 1 < K:
            edges.append((b, a + 2))
    n = 2 * K + 4
    # singleton tail hanging off the last cycle
    edges += [(2 * K - 1, 2 * K), (2 * K, 2 * K + 1), (2 * K + 1, 2 * K + 2),
              (2 * K + 2, 2 * K + 3)]
    g = graph_from_pandas(spark, edges, n)

    exp = _brute_apsp(n, edges)
    ecc = [0] * n
    for (r, _u), d in exp.items():
        ecc[r] = max(ecc[r], d)
    res = exact_sum_sweep(g, mode="radius_diameter", batch=8)
    assert res.converged
    assert res.diameter == max(ecc)
    assert res.radius == min(ecc)
    # the point of the condensation pass: no pivot-per-SCC blowup
    assert res.pivots_used < K
