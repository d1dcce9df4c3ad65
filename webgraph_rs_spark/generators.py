"""Seeded distributed graph generators.

Reference: ``ErdosRenyi`` (``webgraph/src/graphs/random/er.rs:31``) — a
seeded loopless directed G(n, p). Re-derived for Spark: per-edge Bernoulli
draws must be reproducible *independently of partitioning*, so randomness
comes from a hash of (seed, src, dst) rather than a stateful RNG — the
standard distributed-generator trick (same idea as the reference's
``funcperm`` functional permutation, ``algo/src/llp/mod.rs:150-166``).

Also: a preferential-attachment-ish generator with locality (``cnr2000_style``
of FIXTURES.md §3) and random permutations (``perm rand``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webgraph_rs_spark.graph import LinkGraph, from_edges


def erdos_renyi(
    spark: SparkSession, n: int, p: float, seed: int = 42, layout: bool = True
) -> LinkGraph:
    """Directed loopless G(n, p), deterministic in (n, p, seed).

    Materializes the n x n candidate grid filtered by a hash draw — O(n^2)
    scan but embarrassingly parallel and memoryless; suitable for the test
    scales it exists for (the reference's is equally O(n^2), er.rs uses a
    geometric skip which matters only at p << 1).
    """
    pairs = (
        spark.range(n)
        .select(F.col("id").alias("src"))
        .join(spark.range(n).select(F.col("id").alias("dst")), how="cross")
        .filter(F.col("src") != F.col("dst"))
    )
    # uniform in [0,1): low 32 bits of xxhash64(seed, src, dst)
    draw = (
        F.pmod(F.xxhash64(F.lit(seed), F.col("src"), F.col("dst")), F.lit(1 << 32))
        / F.lit(float(1 << 32))
    )
    edges = pairs.filter(draw < p)
    return from_edges(spark, edges, num_nodes=n, layout=layout)


def pref_attach_like(
    spark: SparkSession,
    n: int,
    out_deg: int = 8,
    seed: int = 42,
    locality: int = 64,
    layout: bool = True,
) -> LinkGraph:
    """cnr-2000-*style* synthetic web graph (FIXTURES.md §3): power-law-ish
    in-degrees plus locality. Each node draws ``out_deg`` successors; with
    probability ~1/2 a *local* target (within ``locality``), else a
    popularity-biased target (square of a uniform hash -> low ids get
    quadratically more mass, a stand-in for preferential attachment that
    stays stateless/deterministic)."""
    base = spark.range(n).select(F.col("id").alias("src"))
    succ = []
    for k in range(out_deg):
        h = F.xxhash64(F.lit(seed), F.lit(k), F.col("src"))
        u = F.pmod(h, F.lit(1 << 30)) / F.lit(float(1 << 30))
        local = F.pmod(
            F.col("src") + 1 + F.pmod(h, F.lit(locality)), F.lit(n)
        )
        popular = (F.pow(u, F.lit(2.0)) * n).cast("long") % n
        pick = F.when(F.pmod(h, F.lit(2)) == 0, local).otherwise(popular)
        succ.append(pick)
    edges = base.select("src", F.explode(F.array(*succ)).alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    return from_edges(spark, edges, num_nodes=n, layout=layout)


def random_permutation(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """``perm rand``: a seeded random bijection (old_id, new_id) — rank of a
    deterministic hash draw (ties broken by id => always a bijection).
    Distributed two-phase ranking (``graph.ranked``) — no global window."""
    from webgraph_rs_spark.graph import ranked

    base = spark.range(n).select(
        "id", F.xxhash64(F.lit(seed), F.col("id")).alias("_h")
    )
    return ranked(base, ["_h", "id"], rank_col="new_id").select(
        F.col("id").alias("old_id"), "new_id"
    )
