"""Training-data pipeline operators over document/embedding tables.

Not part of the webgraph-rs surface (the reference has no string data plane,
SURVEY.md §1.3) — these are the operations a 100 TB web-corpus pipeline runs
*around* the link graph: deduplication, similarity search, text analysis,
multimodal column plumbing. All deterministic and cross-engine reproducible
(the only hash primitive is md5, identical in Spark/DuckDB/Python).
"""

from webgraph_rs_spark.textops.textstats import (  # noqa: F401
    tokenize_col,
    token_count,
    quality_score,
    lang_id,
    fingerprint,
    rolling_fingerprints,
    duplicate_spans,
)
from webgraph_rs_spark.textops.dedup import (  # noqa: F401
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_near_dups,
)
from webgraph_rs_spark.textops.similarity import (  # noqa: F401
    cosine_topk,
    embedding_near_dups,
    ivf_ann_topk,
    ivf_assign,
    ivf_centroids,
    ivf_kmeans_centroids,
    lsh_buckets,
    lsh_ann_topk,
)
