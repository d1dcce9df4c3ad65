"""Graph statistics — Spark rendering of ``webgraph analyze stats``
(``cli/src/analyze/stats.rs:20-110``): degree distributions, dangling
(outdeg 0) / terminal counts, self-loops, arc locality (gap) statistics.
All plain aggregations + lag windows; one pass over the edge table each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from webgraph_rs_spark.graph import LinkGraph


def degree_distribution(g: LinkGraph, direction: str = "out") -> DataFrame:
    """(deg, n_nodes) histogram including the 0-degree bucket."""
    col = "src" if direction == "out" else "dst"
    deg = g.edges.groupBy(F.col(col).alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    full = g.vertices.join(deg, "id", "left").select(
        F.coalesce("deg", F.lit(0)).alias("deg")
    )
    return full.groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes"))


def graph_stats(g: LinkGraph) -> DataFrame:
    """One-row summary mirroring the reference's stats report.

    Single edge scan: each arc explodes into an (id, out, in, loop) pair for
    its endpoints, one groupBy folds out/in degree AND the self-loop count
    together (no separate ``filter(src==dst).count()`` action), then a left
    join against the vertex table restores 0-degree nodes before the final
    one-row aggregate. One edge scan, one 2|E| shuffle, one job.
    """
    n = g.num_nodes
    loop = (F.col("src") == F.col("dst")).cast("long")
    pairs = g.edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("id"),
                    F.lit(1).cast("long").alias("o"),
                    F.lit(0).cast("long").alias("i"),
                    loop.alias("loop"),
                ),
                F.struct(
                    F.col("dst").alias("id"),
                    F.lit(0).cast("long").alias("o"),
                    F.lit(1).cast("long").alias("i"),
                    F.lit(0).cast("long").alias("loop"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    deg = pairs.groupBy("id").agg(
        F.sum("o").alias("out_deg"),
        F.sum("i").alias("in_deg"),
        F.sum("loop").alias("loops"),
    )
    full = g.vertices.join(deg, "id", "left").select(
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        F.coalesce("loops", F.lit(0)).alias("loops"),
    )
    return full.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.sum("out_deg").alias("arcs"),
        F.sum(F.when(F.col("out_deg") == 0, 1).otherwise(0)).alias("dangling"),
        F.sum(F.when(F.col("in_deg") == 0, 1).otherwise(0)).alias("sources"),
        F.sum(
            F.when((F.col("out_deg") == 0) & (F.col("in_deg") == 0), 1).otherwise(0)
        ).alias("isolated"),
        F.max("out_deg").alias("max_out_deg"),
        F.max("in_deg").alias("max_in_deg"),
        F.avg("out_deg").alias("avg_out_deg"),
        F.sum("loops").alias("self_loops"),
    ).withColumn("num_nodes_declared", F.lit(n))


def locality_stats(g: LinkGraph) -> DataFrame:
    """Successor-gap statistics (compression locality diagnostics).

    Reference: avg gap / locality + successor delta histograms in
    ``analyze stats``. Gap = delta between consecutive successors of the
    same node in (src, dst) order — exactly what BVGraph gap-codes and what
    parquet delta encoding exploits after a locality-improving relabel.
    """
    w = W.partitionBy("src").orderBy("dst")
    gaps = g.edges.withColumn("prev", F.lag("dst").over(w)).select(
        "src",
        "dst",
        F.when(F.col("prev").isNull(), F.abs(F.col("dst") - F.col("src")))
        .otherwise(F.col("dst") - F.col("prev"))
        .alias("gap"),
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("arcs"),
        F.avg("gap").alias("avg_gap"),
        F.expr("percentile_approx(gap, 0.5)").alias("median_gap"),
        F.max("gap").alias("max_gap"),
        F.avg(F.log2(F.abs(F.col("gap")) + F.lit(1.0))).alias("avg_log2_gap"),
    )
