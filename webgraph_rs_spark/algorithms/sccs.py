"""Strongly connected components of a directed graph, Spark-first.

The reference ships SCC as a product binary (``webgraph-sccs``,
``cli/src/sccs.rs:28-134``) with Tarjan (``algo/src/sccs/tarjan.rs:16-164``)
and Kosaraju (``algo/src/sccs/kosaraju.rs:28``) — both DFS-based, inherently
sequential. The distributed re-derivation is trim + coloring FW-BW (Orzan's
coloring; Slota-Rajamanickam-Madduri, "BFS and Coloring-based Parallel
Algorithms for Strongly Connected Components and Related Problems",
IPDPS'14), every step a frontier join or aggregate — no DFS, no driver-side
recursion:

repeat until no vertices remain:

1. TRIM: peel vertices with in- or out-degree 0 inside the remaining
   subgraph to a fixpoint — each is a singleton SCC (absorbs the tendrils
   of web graphs);
2. COLOR: propagate ``color(v) = max(v, colors of in-neighbors)`` to a
   fixpoint — color(v) = the max id that reaches v; every color class has
   exactly one *root* (the node whose id equals its color), and no SCC
   spans two colors;
3. EXTRACT: backward BFS from all roots simultaneously, restricted to each
   root's color class — the reached set is exactly the root's SCC (reached
   => can reach the root; same color => the root reaches it). Label every
   SCC with its minimum member id (the engine's canonical labeling, same
   convention as undirected CC); remove those vertices and loop.

At web scale the giant SCC falls out of round 1 and trim absorbs the
in/out-tendrils (the majority of nodes, per the bow-tie structure), so the
outer loop runs a handful of rounds. Per inner iteration: one edge-scan
join + one aggregate, frontier-sized where possible; lineage truncated per
round (localCheckpoint) exactly like the other iterative jobs.

Renumbering by decreasing size reproduces the reference's
``sort_by_size``/``par_sort_by_size`` (``algo/src/sccs/mod.rs:116-154``)
via :func:`webgraph_rs_spark.algorithms.components.renumber_by_size`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_rs_spark.driver import release_state
from webgraph_rs_spark.graph import LinkGraph


@dataclass
class SCCResult:
    labels: DataFrame  # (id long, label long) — label = min id in the SCC
    rounds: int  # outer trim+color+extract rounds
    metrics_history: list[dict] = field(default_factory=list)


def _restrict(edges: DataFrame, alive: DataFrame) -> DataFrame:
    """Edges with both endpoints alive (two semi-joins)."""
    return edges.join(
        alive.withColumnRenamed("id", "src"), "src", "left_semi"
    ).join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")


def strongly_connected_components(
    g: LinkGraph, max_outer: int = 200
) -> SCCResult:
    """Compute SCC labels (label = min node id in the component).

    Self-loops are irrelevant to SCC membership and dropped up front.
    """
    alive = g.vertices.select("id").localCheckpoint()
    n_alive = alive.count()
    edges = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .localCheckpoint()
    )
    done: DataFrame | None = None
    metrics: list[dict] = []
    rounds = 0

    def _accumulate(labels: DataFrame) -> None:
        nonlocal done
        old = done
        done = (
            labels if done is None else done.unionByName(labels)
        ).localCheckpoint()
        release_state(old)

    while n_alive > 0 and rounds < max_outer:
        rounds += 1
        # ---- 1. TRIM to fixpoint: peel in-degree-0 / out-degree-0 nodes
        trimmed_total = 0
        while True:
            has_out = edges.select(F.col("src").alias("id")).distinct()
            has_in = edges.select(F.col("dst").alias("id")).distinct()
            keep = (
                alive.join(has_out, "id", "left_semi")
                .join(has_in, "id", "left_semi")
                .localCheckpoint()
            )
            n_keep = keep.count()
            if n_keep == n_alive:
                release_state(keep)
                break
            trimmed = alive.join(keep, "id", "left_anti").select(
                "id", F.col("id").alias("label")
            )
            _accumulate(trimmed)
            trimmed_total += n_alive - n_keep
            release_state(alive)
            alive, n_alive = keep, n_keep
            old_edges = edges
            edges = _restrict(edges, alive).localCheckpoint()
            release_state(old_edges)
            if n_alive == 0:
                break
        if n_alive == 0:
            metrics.append({"round": rounds, "trimmed": trimmed_total,
                            "extracted": 0, "alive": 0})
            break

        # ---- 2. COLOR: forward max propagation (color = max id reaching v)
        # colors_ck is the CHECKPOINTED frame (released via release_state);
        # colors may be a projection over it — releasing a projection would
        # leak the parent checkpoint blocks
        colors_ck = alive.select(
            "id", F.col("id").alias("color")
        ).localCheckpoint()
        colors = colors_ck
        frontier = colors  # changed (id, color) rows
        fresh_frontier = False  # whether frontier is a separate checkpoint
        while True:
            nbr_max = (
                edges.join(
                    frontier.withColumnRenamed("id", "src").hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("color").alias("cm"))
            )
            new_colors = (
                colors.join(nbr_max, "id", "left")
                .select(
                    "id",
                    F.greatest(
                        F.col("color"), F.coalesce("cm", F.col("color"))
                    ).alias("color"),
                    (F.coalesce("cm", F.col("color")) > F.col("color")).alias(
                        "_chg"
                    ),
                )
                .localCheckpoint()
            )
            changed = (
                new_colors.filter(F.col("_chg"))
                .select("id", "color")
                .localCheckpoint()
            )
            n_changed = changed.count()
            if fresh_frontier:
                release_state(frontier)
            release_state(colors_ck)
            colors_ck = new_colors
            colors = new_colors.select("id", "color")
            frontier, fresh_frontier = changed, True
            if n_changed == 0:
                release_state(changed)
                break

        # ---- 3. EXTRACT: backward BFS from every color root, within color
        roots = colors.filter(F.col("id") == F.col("color")).select(
            F.col("id").alias("root")
        )
        reached = roots.select(
            "root", F.col("root").alias("id")
        ).localCheckpoint()
        frontier = reached
        while True:
            nxt = (
                edges.join(
                    frontier.withColumnRenamed("id", "dst").hint("shuffle_hash"),
                    "dst",
                )
                .select("root", F.col("src").alias("id"))
                .distinct()
                .join(colors, "id")
                .filter(F.col("color") == F.col("root"))
                .select("root", "id")
                .join(reached, ["root", "id"], "left_anti")
                .localCheckpoint()
            )
            n_next = nxt.count()
            if frontier is not reached:
                release_state(frontier)
            if n_next == 0:
                release_state(nxt)
                break
            old_reached = reached
            reached = reached.unionByName(nxt).localCheckpoint()
            release_state(old_reached)
            frontier = nxt

        scc_min = reached.groupBy("root").agg(F.min("id").alias("label"))
        scc_labels = reached.join(scc_min, "root").select("id", "label")
        _accumulate(scc_labels)
        extracted = reached.count()

        member_ids = reached.select("id").localCheckpoint()
        release_state(reached)
        release_state(colors_ck)
        old_alive, old_edges = alive, edges
        alive = alive.join(member_ids, "id", "left_anti").localCheckpoint()
        n_alive = alive.count()
        edges = _restrict(edges, alive).localCheckpoint()
        release_state(old_alive)
        release_state(old_edges)
        release_state(member_ids)
        metrics.append({"round": rounds, "trimmed": trimmed_total,
                        "extracted": extracted, "alive": n_alive})

    release_state(alive)
    release_state(edges)
    spark = g.edges.sparkSession
    if done is None:
        done = spark.createDataFrame([], "id long, label long")
    # `done` is already (id, label) and IS the checkpointed frame — return
    # it directly so the caller's release_state reaches the checkpoint RDD
    return SCCResult(done, rounds, metrics)


def condensation(g: LinkGraph, labels: DataFrame) -> DataFrame:
    """Arcs of the condensation DAG: (src_label, dst_label) between distinct
    SCCs (deduped). Reference consumers build this to reason about the
    component DAG after ``webgraph-sccs``."""
    e = (
        g.edges.join(
            labels.withColumnRenamed("id", "src").withColumnRenamed(
                "label", "ls"
            ),
            "src",
        )
        .join(
            labels.withColumnRenamed("id", "dst").withColumnRenamed(
                "label", "ld"
            ),
            "dst",
        )
        .filter(F.col("ls") != F.col("ld"))
        .select(F.col("ls").alias("src"), F.col("ld").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return e
