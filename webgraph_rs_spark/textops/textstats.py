"""Text analysis: tokenization, counting, quality scoring, language ID,
fingerprinting. Everything is built from pyspark.sql.functions (JVM-side,
codegen) — no UDFs in this module.

Determinism contract (mirrored by the DuckDB oracles in __spark_entry__):

- normalization: lower -> replace non-[a-z0-9] runs with one space -> trim;
- tokens: split on single space, drop empties;
- token hash: first 15 hex chars of md5 parsed as int (fits a long).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword sets for the n-gram/stopword-hit heuristic —
# deliberately small and literal so the SQL oracle can inline them
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "non", "sono", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "pour", "que", "dans", "les"],
    "es": ["el", "la", "de", "que", "y", "un", "es", "por", "con", "para"],
}

# word-ish / number / single-symbol pieces — a BPE-ish pre-tokenizer regex
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def normalize_col(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


def tokenize_col(text: Column) -> Column:
    """array<string> of normalized tokens."""
    norm = normalize_col(text)
    return F.filter(F.split(norm, " "), lambda t: t != "")


def token_hash(tok: Column) -> Column:
    """Deterministic 60-bit token hash identical in Spark/DuckDB/Python:
    int(md5(tok)[:15], 16)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_ws_tokens, n_bpe_pieces): whitespace tokens + BPE-ish regex
    pieces (letters / digit runs / single symbols)."""
    return df.select(
        id_col,
        F.size(tokenize_col(F.col(text_col))).cast("long").alias("n_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
        .cast("long")
        .alias("n_bpe_pieces"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + combined score in [0, 1].

    Features: length, token count, mean token length, punctuation ratio,
    stopword(en) ratio. The combined score rewards mid-length documents with
    a healthy stopword rate and low punctuation density — the standard
    web-corpus quality heuristics (cf. C4/Gopher rules), kept simple and
    exactly reproducible in SQL.
    """
    toks = tokenize_col(F.col(text_col))
    n_chars = F.length(text_col).cast("long")
    n_toks = F.size(toks).cast("long")
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("long")
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")).cast("long")
    tok_ratio = F.when(n_toks > 0, n_sw / n_toks).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_toks > 0, (F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / n_toks)).otherwise(F.lit(0.0))
    length_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = (
        0.4 * length_term
        + 0.4 * F.least(tok_ratio * 5.0, F.lit(1.0))
        + 0.2 * (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0)))
    )
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(tok_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language identification.

    Scores each candidate language by the count of its stopwords among the
    document tokens; argmax with deterministic ties (higher count, then
    lexicographically smaller language code; 'und' when no hits at all).
    """
    toks = tokenize_col(F.col(text_col))
    base = df.select(id_col, toks.alias("_toks"))
    scores = []
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(F.col("_toks"), lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # argmax by (hits, reverse-lex lang): max of struct compares fields in
    # order; to make ties pick the SMALLEST lang code we order by a key that
    # inverts the code deterministically — use greatest over (hits, negated
    # position). Simpler: explode and window-free aggregate via array sort.
    arr = F.array(*scores)
    best = F.array_sort(
        arr,
        lambda a, b: F.when(a["hits"] > b["hits"], -1)
        .when(a["hits"] < b["hits"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    )[0]
    return base.select(
        id_col,
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias("lang_pred"),
        best["hits"].cast("long").alias("lang_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 of the normalized text (whole-document),
    plus a 60-bit integer form for joins (the canonical near-zero-cost
    exact-dup key)."""
    norm = normalize_col(F.col(text_col))
    h = F.md5(norm)
    return df.select(
        id_col,
        h.alias("fp_md5"),
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("fp_int"),
    )


def duplicate_spans(
    df: DataFrame,
    window: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated token spans — the substring-level dedup
    primitive of a training-data pipeline (the shape of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better": find
    repeated spans across the corpus, not just near-identical documents).

    (span, n_docs) for every ``window``-token span occurring in at least
    ``min_docs`` DISTINCT documents. Never all-pairs: candidates come
    from a groupBy over the rolling fingerprints (8 bytes per position),
    only hot hashes join back to the corpus, and the final grouping is
    over the verified span TEXT so hash collisions cannot create false
    positives. At 100 TB the fingerprint table is the only corpus-sized
    intermediate, and it is a map-side projection of the documents."""
    fps = rolling_fingerprints(df, window, text_col, id_col)
    hot = (
        fps.groupBy("fp")
        .agg(F.count_distinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("fp")
    )
    cand = fps.join(hot, "fp", "left_semi")
    toks = tokenize_col(F.col(text_col))
    spans = cand.join(df.select(id_col, toks.alias("_t")), id_col).select(
        id_col,
        F.concat_ws(
            " ", F.slice(F.col("_t"), F.col("pos") + 1, window)
        ).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(F.count_distinct(id_col).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def rolling_fingerprints(
    df: DataFrame, window: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Karp-Rabin-style rolling fingerprints over token windows (one row per
    window position) — the building block for local (passage-level) dedup.
    Hash of a window = md5 of the space-joined token slice (exact, not the
    incremental recurrence — at DataFrame level the slice-hash is one
    expression and stays JVM-side; the classic O(1) rolling update is an
    imperative-loop optimization that buys nothing here)."""
    toks = tokenize_col(F.col(text_col))
    d = df.select(id_col, toks.alias("_t")).filter(F.size("_t") >= window)
    idx = F.sequence(F.lit(0), F.size("_t") - window)
    wins = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", F.slice("_t", i + 1, window))), 1, 15
                ),
                16,
                10,
            )
            .cast("long")
            .alias("fp"),
        ),
    )
    return d.select(id_col, F.explode(wins).alias("w")).select(
        id_col, F.col("w.pos").alias("pos"), F.col("w.fp").alias("fp")
    )
