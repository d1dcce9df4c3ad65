"""Structured Streaming surface: incremental page ingestion.

The reference has no streaming surface (SURVEY.md §1.5: everything is
batch), so this module is *additive*: the streaming face of the same
ingestion frontend — a pages stream incrementally extracted into edge
micro-batches, plus windowed event aggregation. It exists because a 100 TB
link-graph pipeline in production ingests crawls continuously; algorithms
still run as batch jobs over the accumulated edge table (GraphX-style
"stream in, batch compute").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_rs_spark.extract import extract_links_udf


def streaming_edge_extraction(pages_stream: DataFrame) -> DataFrame:
    """pages readStream -> (src_url, dst_url, warc_ts) link stream.

    The url->dense-id join happens in the batch compactor (ids must be
    assigned against the global dictionary, which is batch state); the
    stream stays in url space — the standard lambda split.
    """
    return pages_stream.select(
        F.col("url").alias("src_url"),
        F.explode(extract_links_udf(F.col("html"))).alias("dst_url"),
        "warc_ts",
    )


def streaming_link_counts(
    pages_stream: DataFrame, window: str = "1 hour", slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed out-link counts per source url with late-data watermarking —
    the canonical streaming aggregation over the crawl stream."""
    links = streaming_edge_extraction(pages_stream)
    win = (
        F.window("warc_ts", window, slide) if slide else F.window("warc_ts", window)
    )
    return (
        links.withWatermark("warc_ts", watermark)
        .groupBy(win.alias("win"), "src_url")
        .agg(F.count(F.lit(1)).alias("n_links"))
        .select("win.start", "win.end", "src_url", "n_links")
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, mode: str = "append"):
    """Drive a streaming query to completion over available input (test
    harness: memory sink + processAllAvailable)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
