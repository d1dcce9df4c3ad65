"""spark-submit entry point: pages parquet -> extraction -> graph ->
PageRank -> ranks parquet, resumable via --checkpoint-dir.

The north-rule deployment shape:

    zip -r webgraph_rs_spark.zip webgraph_rs_spark
    spark-submit --master local[8] --py-files webgraph_rs_spark.zip \\
        tools/submit_pagerank.py --pages /data/pages --out /data/ranks \\
        --checkpoint-dir /data/ckpt

On a cluster only --master changes; the package rides in --py-files.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet dir")
    ap.add_argument("--out", required=True, help="output ranks parquet dir")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--threshold", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("webgraph_pagerank").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from webgraph_rs_spark.extract import build_graph_from_pages, verify_extraction
    from webgraph_rs_spark.algorithms import pagerank

    pages = spark.read.parquet(args.pages)
    violations = verify_extraction(pages).count()
    g, url_dict = build_graph_from_pages(spark, pages)
    res = pagerank(
        g,
        alpha=args.alpha,
        threshold=args.threshold,
        max_iter=args.max_iter,
        checkpoint_dir=args.checkpoint_dir,
        job="pagerank",
    )
    out = res.ranks.join(url_dict, "id").select("id", "url", "rank")
    out.write.mode("overwrite").parquet(args.out)
    print(
        json.dumps(
            {
                "nodes": g.num_nodes,
                "arcs": g.num_arcs,
                "iterations": res.iterations,
                "err": res.err,
                "resumed_from": res.resumed_from,
                "extraction_violations": int(violations),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
