"""Layered Label Propagation: multi-gamma labelings combined into a
compression-friendly node permutation.

Reference: ``algo/src/llp/mod.rs`` — per gamma, label propagation with the
objective ``(1+gamma)*count - gamma*volume`` (mod.rs:346-375, our
synchronous variant lives in labelprop.py); per-gamma labelings are scored
by the *log-gap cost* of the permutation they induce (``gap_cost.rs:18-50``)
and combined best-cost-first with REPEATED recombination (mod.rs:601-671:
the reference keeps re-running the combine pass against the running best
until no labeling improves it); ``labels_to_ranks`` (mod.rs:686-692) turns
the final labeling into the locality-improving permutation used to relabel
the graph before (re)compression — in this engine, before the parquet
rewrite (``io.recompress``), since sorted (src, dst) after an LLP relabel is
what makes parquet delta encoding approximate BV compression.

Scale notes: every ranking step here uses the distributed two-phase ranking
(``graph.ranked``) — no single-partition global windows anywhere on the
permutation path; the combine's dense-rank over (l1, l2) pairs runs over the
*distinct pair* table (bounded by the number of clusters squared, far below
the vertex count).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_rs_spark.driver import release_state
from webgraph_rs_spark.graph import LinkGraph, ranked
from webgraph_rs_spark.algorithms.labelprop import label_propagation


def labels_to_ranks(labels: DataFrame) -> DataFrame:
    """(id, label) -> permutation (old_id, new_id): nodes sorted by
    (label, id) get consecutive ranks — nodes sharing a label become
    adjacent (reference ``labels_to_ranks``).

    Distributed two-phase ranking over the composite (label, id) key — ids
    are unique so the rank is deterministic; no global window.
    """
    return ranked(labels, ["label", "id"], rank_col="new_id").select(
        F.col("id").alias("old_id"), "new_id"
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


def combine_labelings(base: DataFrame, refine: DataFrame) -> DataFrame:
    """Refine ``base`` by ``refine``: nodes get a dense label per distinct
    (base_label, refine_label) pair (reference ``combine``, mod.rs:643-671).

    The dense rank runs over the DISTINCT pair table (cluster-count sized,
    not vertex sized) via the distributed ranking, then joins back.
    """
    pair = base.select("id", F.col("label").alias("l1")).join(
        refine.select("id", F.col("label").alias("l2")), "id"
    )
    dense = ranked(
        pair.select("l1", "l2").distinct(), ["l1", "l2"], rank_col="label"
    )
    return pair.join(dense, ["l1", "l2"]).select("id", "label")


@dataclass
class LLPResult:
    permutation: DataFrame  # (old_id, new_id)
    labels: DataFrame  # final combined labeling (id, label)
    gamma_costs: dict[float, float] = field(default_factory=dict)
    final_cost: float = 0.0
    gamma_iters: dict[float, int] = field(default_factory=dict)


def llp(
    g: LinkGraph,
    gammas: tuple[float, ...] = (0.0, 0.25, 0.5, 1.0),
    iters_per_gamma: int = 10,
    checkpoint_dir: str | None = None,
    max_combine_passes: int = 4,
    min_gain: float | None = 0.001,
) -> LLPResult:
    """Run LP per gamma, score each labeling by gap cost, then combine
    best-cost-first with repeated recombination: passes over the candidate
    labelings keep refining the running best (keep-if-improved) until a full
    pass improves nothing or ``max_combine_passes`` is hit (reference
    ``combine`` loop, mod.rs:601-671).

    Each gamma pass stops EARLY on the reference's MinGain predicate
    (``llp/preds.rs:40-47``, Java default threshold 0.001) — a converged
    gamma no longer burns its full ``iters_per_gamma`` budget; per-gamma
    iteration counts are reported in ``gamma_iters``.

    Cache discipline: per-gamma labelings and losing combinations are
    unpersisted before returning; the returned permutation and winning
    labeling stay materialized (caller owns those handles).
    """
    owned: list[DataFrame] = []
    per_gamma: list[tuple[float, DataFrame, float]] = []
    gamma_iters: dict[float, int] = {}
    for gamma in gammas:
        lp = label_propagation(
            g,
            max_iter=iters_per_gamma,
            gamma=gamma,
            checkpoint_dir=checkpoint_dir,
            job=f"llp_g{gamma}",
            min_gain=min_gain,
        )
        lab = lp.labels.persist()
        gamma_iters[gamma] = lp.iterations
        owned.append(lab)
        cost = gap_cost(g, labels_to_ranks(lab))
        per_gamma.append((gamma, lab, cost))
    per_gamma.sort(key=lambda t: t[2])
    gamma_costs = {gamma: c for gamma, _lab, c in per_gamma}

    best_lab = per_gamma[0][1]
    best_cost = per_gamma[0][2]
    candidates = [lab for _gamma, lab, _c in per_gamma[1:]]
    for _pass in range(max_combine_passes):
        improved = False
        for lab in candidates:
            combined = combine_labelings(best_lab, lab).persist()
            owned.append(combined)
            cost = gap_cost(g, labels_to_ranks(combined))
            if cost < best_cost:
                best_lab, best_cost = combined, cost
                improved = True
        if not improved:
            break
    perm = labels_to_ranks(best_lab).persist()
    perm.count()
    for df in owned:
        if df is not best_lab:
            # release_state, not unpersist: per-gamma labelings are
            # localCheckpoint products — unpersist alone strands their
            # checkpoint RDD blocks
            release_state(df)
    return LLPResult(perm, best_lab, gamma_costs, best_cost, gamma_iters)
