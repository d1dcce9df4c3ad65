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
  binary datasketches-HLL column; the per-iteration union is a JVM-native
  ``groupBy(src).agg(hll_union_agg)`` over successor sketches (self-loops
  folded in so one grouped pass does counter-union + self-union), with a
  systolic frontier mode for the convergence tail. No Python anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field

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

HLL_LG_K = 11  # 2^11 registers/node (datasketches HLL): ~2.3% rel std err


@dataclass
class HyperBallResult:
    neighborhood_function: list[float]  # estimate of sum_v |B(v, t)| per t
    # (id, reachable_est, sum_dist_est, harmonic_est, closeness_est, lin_est)
    centralities: DataFrame
    iterations: int
    metrics_history: list[dict] = field(default_factory=list)


def hyperball(
    g: LinkGraph,
    max_iter: int = 64,
    rel_tol: float = 1e-3,
    lg_k: int = HLL_LG_K,
    systolic_threshold: float = 0.25,
) -> HyperBallResult:
    """HyperBall: per-node HLL counters grown along out-edges — fully
    JVM-side via Spark's datasketches functions (``hll_sketch_agg`` /
    ``hll_union_agg`` / ``hll_sketch_estimate``); no Python stage anywhere.

    Per iteration (dense mode): gather successors' sketches through the one
    persisted hash(src) edge join, then ``groupBy(src).agg(hll_union_agg)``
    — one edge-sized exchange, whole-stage-codegen aggregation.

    Systolic mode (reference ``algo/src/distances/hyperball.rs:55-71``):
    when fewer than ``systolic_threshold`` of the counters changed last
    round, only the PREDECESSORS of changed nodes are recomputed (semi-join
    frontier, broadcast while small); everyone else keeps their sketch.
    Deviation from the reference, documented: the reference tracks raw
    counter modifications; datasketches serialization is representation-
    dependent (identical register content re-serializes differently), so
    the frontier here is keyed on *estimate* changes. A register bump that
    does not move the estimate (possible inside the linear-counting
    plateau) propagates only when it surfaces in an estimate — an error
    inside HyperBall's own approximation envelope.

    Centrality accumulators follow ``hyperball.rs:1295-1416``: with b_t(v)
    the ball estimate at radius t, each increment (b_t - b_{t-1})
    contributes t to sum-of-distances and 1/t to harmonic centrality;
    closeness = 1/sum_dist and lin = reachable^2/sum_dist (1 when
    sum_dist = 0) are computed from the final accumulators — the reference
    getter set.
    """
    n = g.num_nodes
    # self-loop augmented edges: the group at src always includes its own
    # sketch; B(v, t) grows along out-edges (hyperball.rs doc)
    edges = (
        g.edges.select("src", "dst")
        .unionByName(
            g.vertices.select(F.col("id").alias("src"), F.col("id").alias("dst"))
        )
        .repartition("src")
        .persist()
    )
    edges.count()

    state = (
        g.vertices.groupBy("id")
        .agg(F.hll_sketch_agg(F.col("id"), F.lit(lg_k)).alias("sketch"))
        .localCheckpoint()
    )
    ball = state.select(
        "id", F.hll_sketch_estimate("sketch").cast("double").alias("b")
    ).localCheckpoint()
    nf = [float(ball.agg(F.sum("b")).collect()[0][0])]
    acc = ball.select(
        "id",
        F.col("b").alias("reachable_est"),
        F.lit(0.0).alias("sum_dist_est"),
        F.lit(0.0).alias("harmonic_est"),
    ).localCheckpoint()

    changed: DataFrame | None = None  # ids whose estimate moved last round
    n_changed = n
    metrics: list[dict] = []
    it_n = 0
    for t in range(1, max_iter + 1):
        it_n = t
        systolic = changed is not None and n_changed < systolic_threshold * n
        if systolic:
            fr = changed.withColumnRenamed("id", "dst")
            if n_changed <= 1_000_000:
                fr = F.broadcast(fr)
            # predecessors of changed nodes (self-loops put the changed
            # nodes themselves in this set too)
            aff = (
                edges.join(fr, "dst", "left_semi")
                .select("src")
                .distinct()
            )
            base = edges.join(aff, "src", "left_semi")
        else:
            base = edges
        gathered = base.join(
            state.withColumnRenamed("id", "dst").hint("shuffle_hash"), "dst"
        ).select(F.col("src").alias("id"), "sketch")
        recomputed = (
            gathered.groupBy("id")
            .agg(F.hll_union_agg("sketch").alias("sketch"))
            .localCheckpoint()
        )
        rb = recomputed.select(
            "id", F.hll_sketch_estimate("sketch").cast("double").alias("nb")
        )
        inc = (
            rb.join(ball, "id")
            .select(
                "id",
                "nb",
                F.greatest(F.col("nb") - F.col("b"), F.lit(0.0)).alias("inc"),
            )
            .localCheckpoint()
        )
        row = inc.agg(
            F.sum("inc").alias("g"),
            F.sum(F.when(F.col("inc") > 0, 1).otherwise(0)).alias("c"),
        ).collect()[0]
        grew_abs = float(row["g"] or 0.0)
        new_changed = inc.filter(F.col("inc") > 0).select("id").localCheckpoint()
        release_state(changed)
        changed = new_changed
        n_changed = int(row["c"] or 0)

        old_state = state
        if systolic:
            state = (
                old_state.join(recomputed.select("id"), "id", "left_anti")
                .unionByName(recomputed)
                .localCheckpoint()
            )
            release_state(recomputed)
        else:
            state = recomputed
        release_state(old_state)

        # ball update reads `inc` (already checkpointed), NOT `rb` — rb's
        # parent `recomputed` may have been released above
        old_ball = ball
        ball = (
            old_ball.join(inc.select("id", "nb"), "id", "left")
            .select("id", F.coalesce("nb", F.col("b")).alias("b"))
            .localCheckpoint()
        )
        release_state(old_ball)

        old_acc = acc
        acc = (
            acc.join(inc.select("id", "nb", "inc"), "id", "left")
            .select(
                "id",
                F.coalesce("nb", F.col("reachable_est")).alias("reachable_est"),
                (
                    F.col("sum_dist_est") + F.coalesce("inc", F.lit(0.0)) * t
                ).alias("sum_dist_est"),
                (
                    F.col("harmonic_est") + F.coalesce("inc", F.lit(0.0)) / t
                ).alias("harmonic_est"),
            )
            .localCheckpoint()
        )
        release_state(old_acc)
        release_state(inc)

        total = nf[-1] + grew_abs
        rel_grow = grew_abs / max(nf[-1], 1.0)
        nf.append(total)
        metrics.append(
            {"iteration": t, "changed": n_changed, "systolic": systolic,
             "nf": total, "rel_grow": rel_grow}
        )
        if n_changed == 0 or rel_grow < rel_tol:
            break
    release_state(changed)
    release_state(ball)
    release_state(state)
    edges.unpersist()
    cent = acc.select(
        "id",
        "reachable_est",
        "sum_dist_est",
        "harmonic_est",
        F.when(F.col("sum_dist_est") > 0, 1.0 / F.col("sum_dist_est"))
        .otherwise(0.0)
        .alias("closeness_est"),
        F.when(
            F.col("sum_dist_est") > 0,
            F.col("reachable_est") * F.col("reachable_est")
            / F.col("sum_dist_est"),
        )
        .otherwise(1.0)
        .alias("lin_est"),
    )
    return HyperBallResult(nf, cent, it_n, metrics)
