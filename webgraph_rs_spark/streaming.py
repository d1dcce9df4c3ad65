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


def streaming_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Cross-micro-batch EXACT dedup of a document stream: emits only the
    first-seen document for each text hash; later duplicates (within a
    batch or in any later batch) are dropped.

    Custom stateful operator via ``applyInPandasWithState``: documents are
    bucketed by a stable hash prefix (``n_buckets`` groups — state
    partitioning key, NOT a semantic key), and each group's state is the
    set of md5 digests seen so far, stored as 16-byte binary (so at 100 TB
    the state store holds ~16 bytes + store overhead per distinct document,
    spread over the bucket groups); the per-batch work is one shuffle on
    the bucket key. Output schema == input schema: the internal ``_h`` /
    ``_bucket`` columns never leak.
    """
    import pandas as pd  # arrow-batched; never per-row

    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = docs_stream.withColumn(
        "_h", F.unhex(F.md5(F.col(text_col)))  # 16-byte binary digest
    ).withColumn("_bucket", F.pmod(F.xxhash64("_h"), F.lit(n_buckets)))
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in hashed.schema.fields
        if f.name not in ("_bucket", "_h")
    )
    state_schema = "seen array<binary>"

    def dedup_group(key, pdf_iter, state):
        seen = set(bytes(b) for b in state.get[0]) if state.exists else set()
        for pdf in pdf_iter:
            fresh_mask = []
            for h in pdf["_h"]:
                h = bytes(h)
                if h in seen:
                    fresh_mask.append(False)
                else:
                    seen.add(h)
                    fresh_mask.append(True)
            out = pdf[pd.Series(fresh_mask, index=pdf.index)]
            if len(out):
                yield out.drop(columns=["_bucket", "_h"])
        state.update((list(seen),))

    return hashed.groupBy("_bucket").applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
