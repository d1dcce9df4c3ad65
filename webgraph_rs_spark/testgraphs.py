"""Deterministic edge-table derivations from the driver's TPC-H-ish parquet.

The correctness gate (``__spark_entry__``) runs every operator on a graph
derived *identically* in Spark and in the DuckDB oracle SQL, from the same
parquet inputs — these helpers define the Spark side; the SQL strings in
``__spark_entry__`` mirror them token for token.

Derivation (N = 1024): ``src = l_orderkey % N``, ``dst = l_partkey % N``,
self-loops dropped, deduped; vertex set = the dense range 0..N-1. At sf0.01
this yields ~58k edges over 1024 nodes (a dense web-core-like graph); at
sf0.1 ~10x the edges — the same derivation scales with the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webgraph_rs_spark.graph import LinkGraph, from_edges

N_NODES = 1024
PERM_A, PERM_B = 37, 11  # gcd(37, 1024) = 1 -> bijection
CONTRACT_M = 128


def lineitem_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        li.select(
            (F.col("l_orderkey") % N_NODES).alias("src"),
            (F.col("l_partkey") % N_NODES).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return from_edges(spark, edges, num_nodes=N_NODES)


def orders_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    edges = (
        o.select(
            (F.col("o_orderkey") % N_NODES).alias("src"),
            (F.col("o_custkey") % N_NODES).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return from_edges(spark, edges, num_nodes=N_NODES)


def functional_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """Sparse rho-shaped graph: one out-edge per present node,
    ``dst = (3*src^2 + 5) % N`` (non-invertible squaring map) — a disjoint
    union of cycles with in-trees hanging off them. Exercises directed-SCC
    structure: the cycles are the nontrivial SCCs, everything else trims."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = F.col("l_orderkey") % N_NODES
    d = (s * s * 3 + 5) % N_NODES
    edges = (
        li.select(s.alias("src"), d.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return from_edges(spark, edges, num_nodes=N_NODES)


N_SMALL = 256


def functional_graph_small(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """256-node variant of :func:`functional_graph` (diameter 6, radius 1,
    ecc spread 1..6) — sized so that certified-exact sweeps and their
    all-roots SQL oracles stay cheap at the gate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = F.col("l_orderkey") % N_SMALL
    d = (s * s * 3 + 5) % N_SMALL
    edges = (
        li.select(s.alias("src"), d.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return from_edges(spark, edges, num_nodes=N_SMALL)


def layered_dag(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """A 4-layer DAG over 0..55 derived from orders (for topo-level tests):
    layer0 0..31 -> layer1 32..39 -> layer2 40..43 -> layer3 44..45."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    e01 = o.select(
        (F.col("o_custkey") % 32).alias("src"),
        (32 + F.col("o_custkey") % 8).alias("dst"),
    )
    e12 = o.select(
        (32 + F.col("o_custkey") % 8).alias("src"),
        (40 + F.col("o_orderkey") % 4).alias("dst"),
    )
    e23 = o.select(
        (40 + F.col("o_orderkey") % 4).alias("src"),
        (44 + F.col("o_orderkey") % 2).alias("dst"),
    )
    edges = e01.unionByName(e12).unionByName(e23).dropDuplicates(["src", "dst"])
    return from_edges(spark, edges, num_nodes=56)


SQL_EDGES = (
    "SELECT DISTINCT l_orderkey % 1024 AS src, l_partkey % 1024 AS dst "
    "FROM lineitem WHERE l_orderkey % 1024 != l_partkey % 1024"
)
SQL_EDGES2 = (
    "SELECT DISTINCT o_orderkey % 1024 AS src, o_custkey % 1024 AS dst "
    "FROM orders WHERE o_orderkey % 1024 != o_custkey % 1024"
)
SQL_VERTICES = "SELECT range::BIGINT AS id FROM range(1024)"
SQL_FUNC_EDGES = (
    "SELECT DISTINCT l_orderkey % 1024 AS src, "
    "((l_orderkey % 1024) * (l_orderkey % 1024) * 3 + 5) % 1024 AS dst "
    "FROM lineitem WHERE l_orderkey % 1024 != "
    "((l_orderkey % 1024) * (l_orderkey % 1024) * 3 + 5) % 1024"
)
SQL_DAG = """
SELECT DISTINCT src, dst FROM (
  SELECT o_custkey % 32 AS src, 32 + o_custkey % 8 AS dst FROM orders
  UNION ALL
  SELECT 32 + o_custkey % 8 AS src, 40 + o_orderkey % 4 AS dst FROM orders
  UNION ALL
  SELECT 40 + o_orderkey % 4 AS src, 44 + o_orderkey % 2 AS dst FROM orders
) WHERE src != dst
"""
