"""Deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale shapes (the 100 TB rationale, even though tests run on 500-5k docs):

- exact: one groupBy on a 16-byte hash — the cheapest possible shuffle.
- MinHash+LSH: per-doc signature (map-only) -> band buckets (groupBy on
  (band, band-hash)) -> candidate pairs only within buckets -> verify. Never
  computes all-pairs; the only quadratic term is within-bucket, bounded by
  band tuning.
- n-gram Jaccard *verification* is a pair-local computation; candidate
  generation must come from LSH or shared-shingle inverted index (both
  implemented) — the all-pairs join is the thing this module exists to avoid.
- SimHash: 32-bit signature; near-dup candidates via exact-match on rotated
  bands (hamming<=k search by multi-index), verify by hamming distance.

Determinism: token hash = int(md5[:15], 16); MinHash permutations are small
affine maps modulo a prime, all arithmetic inside long range (mirrored
exactly by the DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from webgraph_rs_spark.textops.textstats import tokenize_col, token_hash

# MinHash parameters (small primes keep a*h+b inside long range in every
# engine: a < P2 ~ 1e6, h < P1 ~ 1e6 -> a*h < 1e12 << 2^63;
# 16 hashes = 4 bands x 4 rows).
# The affine coefficients MUST be large pseudo-random values: tiny slopes
# make every (a*h + b) mod p monotone in h over most of the range, so all
# 16 minima collapse to a function of the single min-hash token and LSH
# banding degenerates to near-all-pairs (observed: 6M candidate pairs from
# 5k docs). Derived from md5 so Spark/DuckDB/Python agree on the constants.
import hashlib as _hashlib

MH_P1 = 1_000_003
MH_P2 = 999_983
MH_HASHES = 16
MH_BANDS = 4


def _mh_coef(j: int) -> tuple[int, int]:
    a = int(_hashlib.md5(f"mh_a{j}".encode()).hexdigest()[:12], 16) % (MH_P2 - 1) + 1
    b = int(_hashlib.md5(f"mh_b{j}".encode()).hexdigest()[:12], 16) % MH_P2
    return a, b


MH_COEF = [_mh_coef(j) for j in range(MH_HASHES)]

SIMHASH_BITS = 32


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, keeper): every doc mapped to the min-id doc with identical
    (md5 of) text. Survivors are rows with doc_id == keeper.

    One shuffle (window min over the hash partition) — the old
    groupBy-then-join shape shuffled the doc table twice (guide §2.4: a
    window partitioned like the preceding aggregation shares the exchange;
    here it REPLACES aggregation + join outright). NULL-text rows are
    dropped, exactly like the join-on-hash shape this replaces (a NULL
    hash matches nothing in an equi-join; the window would otherwise
    group all NULL hashes together — observable behavior change)."""
    h = df.select(id_col, F.md5(F.col(text_col)).alias("h")).filter(
        F.col("h").isNotNull()
    )
    return h.select(
        id_col, F.min(id_col).over(W.partitionBy("h")).alias("keeper")
    )


def _shingles(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle string).

    Per-doc distinctness is computed MAP-SIDE (``array_distinct`` on the
    per-row gram array before the explode) — zero shuffle; the old
    explode-then-dropDuplicates shape paid a full (id, shingle) exchange
    for the same result (guide §2.3 "aggregate before you shuffle")."""
    toks = tokenize_col(F.col(text_col))
    d = df.select(id_col, toks.alias("_t")).filter(F.size("_t") >= n)
    idx = F.sequence(F.lit(0), F.size("_t") - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("_t", i + 1, n)))
    return d.select(id_col, F.explode(F.array_distinct(grams)).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard >= threshold.

    Candidates from the shared-shingle inverted index (docs with zero common
    shingles can never pass), intersections counted in one groupBy, unioned
    sizes joined in. Output: (a, b, jaccard) with a < b, jaccard rounded.

    ``max_df``: document-frequency cap for the inverted index — shingles
    shared by more than ``max_df`` documents are excluded from CANDIDATE
    GENERATION (a single stop-shingle shared by 10^8 docs otherwise makes
    the self-join quadratic at web scale). Jaccard is then re-verified on
    the FULL shingle sets of surviving candidates, so reported values stay
    exact; only recall is traded (pairs sharing exclusively hot shingles are
    missed — by design). Default None = exact inverted index (oracle mode).

    The returned pair table is persisted + materialized so the shingle
    intermediates can be released before returning; caller owns the handle.
    """
    sh = _shingles(df, n, text_col, id_col).persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if max_df is None:
        idx = sh
    else:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("dfq"))
            .filter(F.col("dfq") > max_df)
            .select("shingle")
        )
        idx = sh.join(hot, "shingle", "left_anti")
    a = idx.select(F.col(id_col).alias("a"), "shingle")
    b = idx.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if max_df is not None:
        # exact intersection over FULL shingle sets for the candidates only
        cand = inter.select("a", "b")
        inter = (
            cand.join(sh.select(F.col(id_col).alias("a"), "shingle"), "a")
            .join(
                sh.select(F.col(id_col).alias("b"), F.col("shingle").alias("s2")),
                "b",
            )
            .filter(F.col("shingle") == F.col("s2"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sb")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .persist()
    )
    out.count()
    sh.unpersist()
    return out


def minhash_signatures(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<long>[MH_HASHES]) MinHash over word n-gram *shingle*
    sets — the same sets the Jaccard verification uses. (Unigram-token
    minhash degenerates on small vocabularies: token sets become
    near-identical across documents even when shingle sets differ.)

    h_small = md5-int(shingle) % P1; sig_j = min over shingles of
    (a_j * h_small + b_j) % P2 — all inside long range.

    ``shingles``: optional precomputed :func:`_shingles` table (callers that
    also verify candidates pass a persisted one so the shingle explode runs
    once, not twice)."""
    t = shingles if shingles is not None else _shingles(df, n, text_col, id_col)
    h = t.select(id_col, (token_hash(F.col("shingle")) % MH_P1).alias("hs"))
    aggs = [
        F.min((F.col("hs") * a + b) % MH_P2).alias(f"mh{j}")
        for j, (a, b) in enumerate(MH_COEF)
    ]
    sig = h.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[f"mh{j}" for j in range(MH_HASHES)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    verify: bool = True,
) -> DataFrame:
    """LSH banding over MinHash signatures -> candidate pairs -> (optional)
    exact Jaccard verification on word n-grams.

    Bands of MH_HASHES/MH_BANDS rows; docs colliding in any band become
    candidates. Output: (a, b, jaccard) for verified pairs (or candidates
    with jaccard null when verify=False).

    With ``verify=True`` the shingle table is built ONCE, persisted, and
    shared between signature generation and the exact-Jaccard verification
    (it used to be recomputed — the doc tokenize + gram explode is the
    dominant map-side cost); the returned pair table is materialized so the
    shingle cache can be released before returning — caller owns the
    handle."""
    sh = None
    if verify:
        sh = _shingles(df, n, text_col, id_col).persist()
        sig = minhash_signatures(
            df, n=n, text_col=text_col, id_col=id_col, shingles=sh
        )
    else:
        sig = minhash_signatures(df, n=n, text_col=text_col, id_col=id_col)
    rows = MH_HASHES // MH_BANDS
    bands = []
    for bnd in range(MH_BANDS):
        key = F.concat_ws(
            "_", *[F.col("sig")[bnd * rows + r].cast("string") for r in range(rows)]
        )
        bands.append(
            sig.select(
                F.col(id_col), F.lit(bnd).alias("band"), key.alias("bkey")
            )
        )
    allbands = bands[0]
    for bdf in bands[1:]:
        allbands = allbands.unionByName(bdf)
    l = allbands.select(F.col(id_col).alias("a"), "band", "bkey")
    r = allbands.select(F.col(id_col).alias("b"), "band", "bkey")
    cand = (
        l.join(r, ["band", "bkey"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    if not verify:
        return cand
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    pair_sh = (
        cand.join(sh.select(F.col(id_col).alias("a"), "shingle"), "a")
        .join(sh.select(F.col(id_col).alias("b"), F.col("shingle").alias("s2")), "b")
        .filter(F.col("shingle") == F.col("s2"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        cand.join(pair_sh, ["a", "b"], "left")
        .join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sb")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.coalesce("inter", F.lit(0))
                / (F.col("sa") + F.col("sb") - F.coalesce("inter", F.lit(0))),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .persist()
    )
    out.count()
    sh.unpersist()
    return out


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash long): 32-bit SimHash over token md5 hashes.

    bit_i(doc) = 1 iff sum over distinct tokens of (2*bit_i(h(tok)) - 1) > 0.
    Expressed as explode(token x bit) -> groupBy sum -> reassemble; stays
    JVM-side and is exactly mirrored in SQL (integer div/mod bit extraction).
    """
    toks = tokenize_col(F.col(text_col))
    # per-doc distinct tokens map-side (array_distinct before explode) —
    # the old explode + dropDuplicates paid an (id, tok) exchange for it
    t = df.select(
        id_col, F.explode(F.array_distinct(toks)).alias("tok")
    ).select(id_col, token_hash(F.col("tok")).alias("h"))
    bit_cols = [
        F.sum(F.shiftright(F.col("h"), i) % 2 * 2 - 1).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = t.groupBy(id_col).agg(*bit_cols)
    sh = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sh = term if sh is None else sh + term
    return agg.select(id_col, sh.cast("long").alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Multi-index banding: split the 32 bits into max_hamming+1 chunks — any
    pair within the distance budget must match exactly on >= 1 chunk
    (pigeonhole), so candidates come from equality joins on chunks, then the
    hamming distance is verified via bit_count(xor). Output (a, b, hamming).
    """
    s = simhash(df, text_col, id_col)
    chunks = max_hamming + 1
    width = SIMHASH_BITS // chunks
    cands = None
    for c in range(chunks):
        key = (F.shiftright(F.col("simhash"), c * width) % F.lit(1 << width)).cast(
            "long"
        )
        part = s.select(F.col(id_col), F.lit(c).alias("chunk"), key.alias("ck"),
                        "simhash")
        l = part.select(F.col(id_col).alias("a"), "chunk", "ck",
                        F.col("simhash").alias("ha"))
        r = part.select(F.col(id_col).alias("b"), "chunk", "ck",
                        F.col("simhash").alias("hb"))
        pc = l.join(r, ["chunk", "ck"]).filter(F.col("a") < F.col("b"))
        cands = pc if cands is None else cands.unionByName(pc)
    return (
        cands.select("a", "b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
