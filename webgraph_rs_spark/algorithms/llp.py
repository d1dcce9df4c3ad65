"""Layered Label Propagation: multi-gamma labelings combined into a
compression-friendly node permutation.

Reference: ``algo/src/llp/mod.rs`` — per gamma, label propagation with the
objective ``(1+gamma)*count - gamma*volume`` (mod.rs:346-375, our
synchronous variant lives in labelprop.py); per-gamma labelings are scored
by the *log-gap cost* of the permutation they induce (``gap_cost.rs:18-50``)
and combined best-cost-first with repeated recombination (mod.rs:601-671);
``labels_to_ranks`` (mod.rs:686-692) turns the final labeling into the
locality-improving permutation used to relabel the graph before
(re)compression — in this engine, before the parquet rewrite
(``io.recompress``), since sorted (src, dst) after an LLP relabel is what
makes parquet delta encoding approximate BV compression.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from webgraph_rs_spark.graph import LinkGraph
from webgraph_rs_spark.algorithms.labelprop import label_propagation


def labels_to_ranks(labels: DataFrame) -> DataFrame:
    """(id, label) -> permutation (old_id, new_id): nodes sorted by
    (label, id) get consecutive ranks — nodes sharing a label become
    adjacent (reference ``labels_to_ranks``).

    Global window is fine for the test scale; the two-phase distributed
    ranking of ``graph.dense_ids`` is the drop-in at 10^12 nodes (rank over
    a composite range partition of (label, id)).
    """
    w = W.orderBy("label", "id")
    return labels.select(
        F.col("id").alias("old_id"),
        (F.row_number().over(w).cast("long") - 1).alias("new_id"),
    )


def gap_cost(g: LinkGraph, perm: DataFrame) -> float:
    """Log2 gap cost of a permutation (reference ``gap_cost.rs:18-50``):
    sum over arcs of log2(|rank(src) - rank(dst)| + 1) — the proxy for the
    compressed size of the relabeled graph."""
    p = perm.select("old_id", "new_id")
    e = (
        g.edges.join(p.withColumnRenamed("old_id", "src"), "src")
        .select(F.col("new_id").alias("rs"), "dst")
        .join(p.withColumnRenamed("old_id", "dst"), "dst")
        .select("rs", F.col("new_id").alias("rd"))
    )
    row = e.agg(
        F.sum(F.log2(F.abs(F.col("rs") - F.col("rd")) + F.lit(1.0))).alias("c")
    ).collect()[0]
    return float(row["c"] or 0.0)


@dataclass
class LLPResult:
    permutation: DataFrame  # (old_id, new_id)
    labels: DataFrame  # final combined labeling (id, label)
    gamma_costs: dict[float, float] = field(default_factory=dict)
    final_cost: float = 0.0


def llp(
    g: LinkGraph,
    gammas: tuple[float, ...] = (0.0, 0.25, 0.5, 1.0),
    iters_per_gamma: int = 10,
    checkpoint_dir: str | None = None,
) -> LLPResult:
    """Run LP per gamma, score each labeling by gap cost, then combine
    best-cost-first: each next labeling refines the current one via a
    dense-rank over (current_label, next_label) pairs (reference ``combine``,
    mod.rs:643-671) and is kept only if the gap cost improves."""
    per_gamma: list[tuple[float, DataFrame, float]] = []
    for gamma in gammas:
        lab = label_propagation(
            g,
            max_iter=iters_per_gamma,
            gamma=gamma,
            checkpoint_dir=checkpoint_dir,
            job=f"llp_g{gamma}",
        ).labels.persist()
        cost = gap_cost(g, labels_to_ranks(lab))
        per_gamma.append((gamma, lab, cost))
    per_gamma.sort(key=lambda t: t[2])
    gamma_costs = {gamma: c for gamma, _lab, c in per_gamma}

    best_lab = per_gamma[0][1]
    best_cost = per_gamma[0][2]
    for _gamma, lab, _c in per_gamma[1:]:
        pair = best_lab.select("id", F.col("label").alias("l1")).join(
            lab.select("id", F.col("label").alias("l2")), "id"
        )
        w = W.orderBy("l1", "l2")
        combined = pair.select(
            "id", (F.dense_rank().over(w).cast("long") - 1).alias("label")
        ).persist()
        cost = gap_cost(g, labels_to_ranks(combined))
        if cost < best_cost:
            best_lab, best_cost = combined, cost
    perm = labels_to_ranks(best_lab).persist()
    perm.count()
    return LLPResult(perm, best_lab, gamma_costs, best_cost)
