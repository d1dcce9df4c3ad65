"""Distances: exact all-pairs BFS, neighborhood function, geometric
centralities, eccentricities — and HyperBall (approximate, HLL sketches).

Reference surface (SURVEY.md §2.7):

- HyperBall (``algo/src/distances/hyperball.rs``): per-node HyperLogLog
  counters; iteration t unions each node's counter with its successors'
  counters, so counter(v) estimates |B(v, t)|; neighborhood function,
  sum-of-distances, harmonic/closeness/lin centralities, reachable counts
  fall out of the per-iteration deltas (getters at :1295-1416).
- ExactSumSweep (``algo/src/distances/exact_sum_sweep``): exact radius /
  diameter / eccentricities.

Spark re-design:

- :func:`all_pairs_distances` — the *exact* path: multi-source frontier BFS
  over (root, node) pairs. O(n * reachable) state; right tool up to ~10^4
  sources (tests, oracles, ExactSumSweep replacement on small graphs, or a
  sampled source set at scale).
- :func:`hyperball` — the *scale* path: vertex-state DataFrame with a
  binary HLL register column; the per-iteration union is a grouped
  ``applyInPandas`` elementwise-max over successor sketches (self-loops
  folded in so one grouped pass does counter-union + self-union). Arrow
  batches only — no per-row Python.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_rs_spark.driver import release_state
from webgraph_rs_spark.graph import LinkGraph

# ----------------------------------------------------------- exact distances


@dataclass
class APSPResult:
    distances: DataFrame  # (root long, id long, distance long)
    rounds: int


def all_pairs_distances(
    g: LinkGraph,
    sources: DataFrame | None = None,
    max_depth: int | None = None,
) -> APSPResult:
    """BFS distances from every source (default: all vertices).

    State is the reached (root, id, distance) set; one join + anti-join per
    level, lineage truncated per level.
    """
    roots = (sources if sources is not None else g.vertices).select(
        F.col("id").alias("root")
    )
    edges = g.edges.repartition("src").persist()
    edges.count()
    frontier = roots.select("root", F.col("root").alias("id")).localCheckpoint()
    visited = frontier.withColumn("distance", F.lit(0).cast("long")).localCheckpoint()
    depth = 0
    n_frontier = frontier.count()
    while n_frontier > 0 and (max_depth is None or depth < max_depth):
        nxt = (
            edges.join(
                frontier.withColumnRenamed("id", "src").hint("shuffle_hash"), "src"
            )
            .select("root", F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("root", "id"), ["root", "id"], "left_anti")
        ).localCheckpoint()
        depth += 1
        n_frontier = nxt.count()
        if n_frontier > 0:
            old_visited = visited
            visited = visited.unionByName(
                nxt.withColumn("distance", F.lit(depth).cast("long"))
            ).localCheckpoint()
            release_state(old_visited)
        release_state(frontier)
        frontier = nxt
    edges.unpersist()
    return APSPResult(visited, depth)


def neighborhood_function(dist: DataFrame) -> DataFrame:
    """(r, pairs): number of (root, id) pairs within distance r — the exact
    neighborhood function the reference's HyperBall approximates."""
    by_d = dist.groupBy("distance").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as W

    w = W.orderBy("distance").rowsBetween(W.unboundedPreceding, 0)
    return by_d.select(
        F.col("distance").alias("r"), F.sum("n").over(w).alias("pairs")
    )


def geometric_centralities(dist: DataFrame, vertices: DataFrame) -> DataFrame:
    """Per-root centralities from exact distances (reference getter
    semantics, ``hyperball.rs:1295-1416``):

    - reachable   = |{u : d(v, u) < inf}| (self included)
    - sum_dist    = sum of finite d(v, u)
    - closeness   = 1 / sum_dist (0 when sum_dist = 0)
    - harmonic    = sum over u != v of 1 / d(v, u)
    - lin         = reachable^2 / sum_dist (1 when sum_dist = 0)
    """
    agg = dist.groupBy(F.col("root").alias("id")).agg(
        F.count(F.lit(1)).alias("reachable"),
        F.sum("distance").alias("sum_dist"),
        F.sum(
            F.when(F.col("distance") > 0, 1.0 / F.col("distance")).otherwise(0.0)
        ).alias("harmonic"),
    )
    out = vertices.join(agg, "id", "left").select(
        "id",
        F.coalesce("reachable", F.lit(1)).alias("reachable"),
        F.coalesce("sum_dist", F.lit(0)).alias("sum_dist"),
        F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
    )
    return out.select(
        "id",
        "reachable",
        "sum_dist",
        F.round("harmonic", 6).alias("harmonic"),
        F.round(
            F.when(F.col("sum_dist") > 0, 1.0 / F.col("sum_dist")).otherwise(0.0), 9
        ).alias("closeness"),
        F.round(
            F.when(
                F.col("sum_dist") > 0,
                (F.col("reachable") * F.col("reachable")) / F.col("sum_dist"),
            ).otherwise(1.0),
            6,
        ).alias("lin"),
    )


def eccentricities(dist: DataFrame, vertices: DataFrame) -> DataFrame:
    """(id, ecc) forward eccentricity (max finite distance from the node).

    Exact replacement for ExactSumSweep's All level on small graphs."""
    agg = dist.groupBy(F.col("root").alias("id")).agg(
        F.max("distance").alias("ecc")
    )
    return vertices.join(agg, "id", "left").select(
        "id", F.coalesce("ecc", F.lit(0)).alias("ecc")
    )


def radius_diameter(dist: DataFrame, vertices: DataFrame) -> tuple[int, int]:
    ecc = eccentricities(dist, vertices)
    row = ecc.agg(F.min("ecc").alias("r"), F.max("ecc").alias("d")).collect()[0]
    return int(row["r"]), int(row["d"])


# ----------------------------------------------------------------- HyperBall

HLL_P = 8  # 2^8 = 256 registers/node: ~6.5% rel std err, 256 B/node state
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hll_init(ids: np.ndarray) -> list[bytes]:
    """One-element sketch per node id (the ball at r=0 is {v})."""
    out = []
    for i in ids:
        h = np.uint64(_splitmix64(int(i)))
        idx = int(h >> np.uint64(64 - HLL_P))
        rest = (int(h) << HLL_P) & ((1 << 64) - 1)
        rho = 1 + _clz64(rest)
        regs = bytearray(HLL_M)
        regs[idx] = min(rho, 255)
        out.append(bytes(regs))
    return out


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
    return x ^ (x >> 31)


def _clz64(x: int) -> int:
    if x == 0:
        return 64
    return 64 - x.bit_length()


def _hll_estimate(regs: np.ndarray) -> float:
    two_neg = np.ldexp(1.0, -regs.astype(np.int64))
    e = _ALPHA * HLL_M * HLL_M / two_neg.sum()
    if e <= 2.5 * HLL_M:  # small-range (linear counting) correction
        zeros = int((regs == 0).sum())
        if zeros:
            return HLL_M * math.log(HLL_M / zeros)
    return float(e)


@dataclass
class HyperBallResult:
    neighborhood_function: list[float]  # estimate of sum_v |B(v, t)| per t
    centralities: DataFrame  # (id, reachable_est, sum_dist_est, harmonic_est)
    iterations: int
    metrics_history: list[dict] = field(default_factory=list)


def hyperball(g: LinkGraph, max_iter: int = 64, rel_tol: float = 1e-3) -> HyperBallResult:
    """HyperBall: per-node HLL counters grown along out-edges.

    Per iteration: one grouped ``applyInPandas`` computing, for every node,
    the elementwise max of its own and its successors' registers (self-loops
    appended so a single grouped pass does both), then a vectorized estimate
    pass. Stops when the global neighborhood function grows by less than
    ``rel_tol`` (the reference switches systolic/local modes for the tail —
    here the tail is cheap because the whole sweep is one shuffle).

    Centrality accumulators follow ``hyperball.rs``: with b_t(v) the ball
    estimate at radius t, each increment (b_t - b_{t-1}) contributes t to
    sum-of-distances and 1/t to harmonic centrality.
    """
    spark = g.edges.sparkSession
    # self-loop augmented edges so the group at src includes its own sketch;
    # the gather pulls SUCCESSORS' counters into each node (B(v, t) grows
    # along out-edges, hyperball.rs doc)
    edges = (
        g.edges.select("src", "dst")
        .unionByName(g.vertices.select(F.col("id").alias("src"), F.col("id").alias("dst")))
        .repartition("src")
        .persist()
    )
    edges.count()

    def init_batch(it):
        for pdf in it:
            yield pd.DataFrame(
                {"id": pdf["id"], "sketch": _hll_init(pdf["id"].to_numpy())}
            )

    state = (
        g.vertices.mapInPandas(init_batch, schema="id long, sketch binary")
        .repartition("id")
        .localCheckpoint()
    )

    def estimates(st: DataFrame) -> DataFrame:
        @F.pandas_udf("double")
        def est(s: pd.Series) -> pd.Series:
            return s.map(
                lambda b: _hll_estimate(np.frombuffer(b, dtype=np.uint8))
            )

        return st.select("id", est("sketch").alias("est"))

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        regs = np.frombuffer(b"".join(pdf["sketch"]), dtype=np.uint8).reshape(
            len(pdf), HLL_M
        )
        return pd.DataFrame(
            {"id": [pdf["node"].iloc[0]], "sketch": [regs.max(axis=0).tobytes()]}
        )

    # accumulators
    prev_ball = estimates(state).withColumnRenamed("est", "b").persist()
    nf = [float(prev_ball.agg(F.sum("b")).collect()[0][0])]
    acc = prev_ball.select(
        "id",
        F.col("b").alias("reachable_est"),
        F.lit(0.0).alias("sum_dist_est"),
        F.lit(0.0).alias("harmonic_est"),
    ).localCheckpoint()

    it_n = 0
    for t in range(1, max_iter + 1):
        gathered = edges.join(
            state.withColumnRenamed("id", "dst").hint("shuffle_hash"), "dst"
        ).select(F.col("src").alias("node"), "sketch")
        new_state = (
            gathered.groupBy("node")
            .applyInPandas(merge_group, schema="id long, sketch binary")
            .localCheckpoint()
        )
        new_ball = estimates(new_state).withColumnRenamed("est", "b").persist()
        total = float(new_ball.agg(F.sum("b")).collect()[0][0])
        it_n = t
        # per-node increments -> centrality accumulators
        inc = (
            new_ball.join(prev_ball.withColumnRenamed("b", "pb"), "id")
            .select("id", (F.col("b") - F.col("pb")).alias("inc"), "b")
        )
        old_acc = acc
        acc = (
            acc.join(inc, "id")
            .select(
                "id",
                F.col("b").alias("reachable_est"),
                (F.col("sum_dist_est") + F.greatest(F.col("inc"), F.lit(0.0)) * t).alias(
                    "sum_dist_est"
                ),
                (
                    F.col("harmonic_est")
                    + F.greatest(F.col("inc"), F.lit(0.0)) / t
                ).alias("harmonic_est"),
            )
            .localCheckpoint()
        )
        release_state(old_acc)
        prev_ball.unpersist()
        prev_ball = new_ball
        release_state(state)
        state = new_state
        grew = (total - nf[-1]) / max(nf[-1], 1.0)
        nf.append(total)
        if grew < rel_tol:
            break
    edges.unpersist()
    return HyperBallResult(nf, acc, it_n)
