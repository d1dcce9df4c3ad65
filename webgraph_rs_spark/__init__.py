"""webgraph_rs_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query/data-processing capabilities of vigna/webgraph-rs
(compressed BVGraph traversals + graph algorithms, see SURVEY.md) as
idiomatic Spark DataFrame programs:

- graph = edge DataFrame ``(src long, dst long)`` hash-partitioned by ``src``
  plus an explicit vertex DataFrame (dangling/isolated nodes are load-bearing,
  cf. reference ``algo/src/rank/pagerank.rs:561-575``),
- algorithms = iterative join/aggregate jobs driven by a checkpointing
  iteration driver with composable stopping predicates
  (cf. reference ``algo/src/rank/mod.rs:56-225``),
- ingestion = Common-Crawl-style pages table -> vectorized Arrow/pandas UDF
  link+text extraction -> dense-id edge table
  (cf. reference ``cli/src/from/arcs.rs:63-239``).

Nothing here is a port: the reference is a single-node Rust engine over
compressed bitstreams; this package is a Spark-first re-design where
Parquet/columnar encodings replace BVGraph compression and Spark's
sort-based shuffle replaces the reference's external-sort machinery
(``webgraph/src/utils/par_sort_pairs.rs``).
"""

from webgraph_rs_spark.session import get_spark  # noqa: F401
from webgraph_rs_spark.graph import LinkGraph  # noqa: F401

__version__ = "0.1.0"
