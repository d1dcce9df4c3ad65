"""Sources/sinks & graph metadata (SURVEY.md §2.1).

Spark renderings of the reference's format surface:

- ``to arcs`` / ``to ascii`` (``cli/src/to/arcs.rs``) -> csv/tsv export;
- ``seq int`` / ``seq float`` vector formats (``cli/src/lib.rs:275-285``)
  -> vertex-state DataFrame parquet/csv/json round-trips;
- ``.properties`` metadata (``webgraph/src/graphs/bvgraph/load.rs:542``)
  -> a JSON manifest carrying (nodes, arcs, partitioning, sortedness,
  checksum) — the explicit, never-inferred schema of a stored graph;
- ``to bvgraph`` (recompress) -> rewrite parquet with the canonical sort
  order (sorting by (src, dst) is what makes parquet delta encoding do the
  BV-compression job).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webgraph_rs_spark.graph import LinkGraph, canonical_edge_layout, from_edges


def write_graph(g: LinkGraph, path: str, num_partitions: int | None = None) -> dict:
    """Store a graph: canonical-layout parquet edges + vertices + manifest.

    Returns the manifest dict. The manifest is the ``.properties`` analogue:
    the reader never infers cardinalities or layout.
    """
    edges = canonical_edge_layout(g.edges, num_partitions)
    edges.write.mode("overwrite").parquet(os.path.join(path, "edges"))
    g.vertices.write.mode("overwrite").parquet(os.path.join(path, "vertices"))
    # checksum: order-insensitive xor-style aggregate over edge hashes,
    # computed from the RE-READ parquet — i.e. from exactly the stored,
    # canonicalized (deduped, long-cast) edge set, so a graph built directly
    # with duplicate or non-long arcs still validates on read_graph.
    stored = edges.sparkSession.read.parquet(os.path.join(path, "edges"))
    chk = (
        stored.select(
            F.expr("bit_xor(xxhash64(src, dst))").alias("s"),
            F.count(F.lit(1)).alias("m"),
        ).collect()[0]
    )
    manifest = {
        "nodes": g.num_nodes,
        "arcs": int(chk["m"]),
        "partitioning": "hash(src)",
        "sorted_within_partitions": ["src", "dst"],
        "edge_checksum": int(chk["s"] or 0),
        "format_version": 1,
    }
    with open(os.path.join(path, "manifest.json"), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def read_graph(spark: SparkSession, path: str, validate: bool = False) -> LinkGraph:
    with open(os.path.join(path, "manifest.json"), encoding="utf-8") as f:
        manifest = json.load(f)
    edges = spark.read.parquet(os.path.join(path, "edges"))
    vertices = spark.read.parquet(os.path.join(path, "vertices"))
    g = LinkGraph(edges, vertices, _num_nodes=manifest["nodes"], _num_arcs=manifest["arcs"])
    if validate:
        chk = edges.select(
            F.expr("bit_xor(xxhash64(src, dst))").alias("s"),
            F.count(F.lit(1)).alias("m"),
        ).collect()[0]
        if int(chk["m"]) != manifest["arcs"] or int(chk["s"] or 0) != manifest["edge_checksum"]:
            raise ValueError(f"graph at {path} fails manifest validation")
    return g


def to_arcs_csv(g: LinkGraph, path: str, sep: str = "\t") -> None:
    """``to arcs``: edge list as (src, dst) text."""
    g.edges.orderBy("src", "dst").write.mode("overwrite").option("sep", sep).csv(path)


def to_ascii_adjacency(g: LinkGraph) -> DataFrame:
    """``to ascii``: one row per node, successors space-joined in order."""
    succ = g.edges.groupBy(F.col("src").alias("id")).agg(
        F.array_join(F.sort_array(F.collect_list("dst")), " ").alias("successors")
    )
    return (
        g.vertices.join(succ, "id", "left")
        .select("id", F.coalesce("successors", F.lit("")).alias("successors"))
    )


def write_vertex_state(state: DataFrame, path: str, fmt: str = "parquet") -> None:
    """``seq int/float`` analogue: persist a node-indexed vector (sorted by
    its key — the first column: ``id`` for states, ``old_id`` for
    permutations)."""
    w = state.orderBy(state.columns[0]).write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "csv":
        w.option("header", True).csv(path)
    elif fmt == "json":
        w.json(path)
    else:
        raise ValueError(fmt)


def read_vertex_state(spark: SparkSession, path: str, fmt: str = "parquet",
                      schema: str | None = None) -> DataFrame:
    r = spark.read
    if fmt == "parquet":
        return r.parquet(path)
    if fmt == "csv":
        return r.option("header", True).schema(schema or "id long, value double").csv(path)
    if fmt == "json":
        return r.schema(schema or "id long, value double").json(path)
    raise ValueError(fmt)


def recompress(spark: SparkSession, in_path: str, out_path: str,
               num_partitions: int | None = None) -> dict:
    """``to bvgraph`` analogue: rewrite with the canonical layout (e.g.
    after a locality-improving relabel), refreshing the manifest."""
    g = read_graph(spark, in_path)
    return write_graph(from_edges(spark, g.edges, vertices=g.vertices, layout=False),
                       out_path, num_partitions)
