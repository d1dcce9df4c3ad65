"""Text/dedup/similarity/multimodal operators vs pure-python oracles on the
driver-provided documents/embeddings tables (sf0.001)."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _norm(t: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()


def _toks(t: str) -> list[str]:
    n = _norm(t)
    return [x for x in n.split(" ") if x] if n else []


def _tok_hash(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def docs_pd(docs):
    return {r["doc_id"]: r["text"] for r in docs.collect()}


def test_token_count(spark, docs, docs_pd):
    from webgraph_rs_spark.textops import token_count
    from webgraph_rs_spark.textops.textstats import BPE_ISH_PATTERN

    got = {r["doc_id"]: (r["n_tokens"], r["n_bpe_pieces"])
           for r in token_count(docs).collect()}
    pat = re.compile(BPE_ISH_PATTERN)
    for did, text in docs_pd.items():
        assert got[did] == (len(_toks(text)), len(pat.findall(text))), did


def test_quality_score_ranges_and_formula(spark, docs, docs_pd):
    from webgraph_rs_spark.textops import quality_score

    rows = {r["doc_id"]: r for r in quality_score(docs).collect()}
    sw = {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"}
    for did, text in list(docs_pd.items())[:50]:
        r = rows[did]
        toks = _toks(text)
        assert r["n_tokens"] == len(toks)
        assert 0.0 <= r["quality"] <= 1.0
        exp_sw = sum(1 for t in toks if t in sw) / len(toks) if toks else 0.0
        assert abs(r["stopword_ratio"] - round(exp_sw, 6)) < 1e-9


def test_lang_id_stopword_heuristic(spark):
    from webgraph_rs_spark.textops import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in the house of it"),
            (2, "der hund und die katze ist von den haus mit ein"),
            (3, "il gatto e la casa di che un per non sono con"),
            (4, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "it", 4: "und"}


def test_fingerprint_matches_python(spark, docs, docs_pd):
    from webgraph_rs_spark.textops import fingerprint

    got = {r["doc_id"]: (r["fp_md5"], r["fp_int"]) for r in fingerprint(docs).collect()}
    for did, text in list(docs_pd.items())[:50]:
        h = hashlib.md5(_norm(text).encode()).hexdigest()
        assert got[did] == (h, int(h[:15], 16))


def test_rolling_fingerprints(spark):
    from webgraph_rs_spark.textops.textstats import rolling_fingerprints

    df = spark.createDataFrame([(1, "a b c d e f g h i j")], "doc_id long, text string")
    rows = rolling_fingerprints(df, window=8).collect()
    assert len(rows) == 3  # positions 0, 1, 2
    toks = "a b c d e f g h i j".split()
    for r in rows:
        exp = int(hashlib.md5(" ".join(toks[r["pos"]:r["pos"] + 8]).encode())
                  .hexdigest()[:15], 16)
        assert r["fp"] == exp


def test_exact_dedup(spark):
    from webgraph_rs_spark.textops import exact_dedup

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other"), (4, "same text")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["keeper"] for r in exact_dedup(df).collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 1}


def _jaccard3(a: str, b: str) -> float:
    def sh(t):
        toks = _toks(t)
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B) if A | B else 0.0


def test_ngram_jaccard_pairs(spark, docs, docs_pd):
    from webgraph_rs_spark.textops import ngram_jaccard_pairs

    got = {(r["a"], r["b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    # brute-force oracle over all pairs
    items = sorted(docs_pd.items())
    exp = {}
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            jac = _jaccard3(items[i][1], items[j][1])
            if round(jac, 6) >= 0.2:
                exp[(items[i][0], items[j][0])] = round(jac, 6)
    assert got == exp


def test_minhash_lsh_recall(spark, docs, docs_pd):
    from webgraph_rs_spark.textops import minhash_lsh_pairs

    got = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    items = sorted(docs_pd.items())
    true_pairs = set()
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            if _jaccard3(items[i][1], items[j][1]) >= 0.5:
                true_pairs.add((items[i][0], items[j][0]))
    # verified LSH pairs are a subset of true pairs (verification is exact);
    # recall should be high for >= 0.5 similarity with 4 bands x 4 rows
    assert got <= true_pairs
    if true_pairs:
        assert len(got) / len(true_pairs) >= 0.8


def test_simhash_bits_and_near_dups(spark):
    from webgraph_rs_spark.textops import simhash, simhash_near_dups
    from webgraph_rs_spark.textops.dedup import SIMHASH_BITS

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # identical
            (3, "alpha beta gamma delta epsilon eta"),   # 1 token swap
            (4, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    # python oracle
    for did, text in [(1, "alpha beta gamma delta epsilon zeta")]:
        votes = [0] * SIMHASH_BITS
        for tok in set(_toks(text)):
            h = _tok_hash(tok)
            for i in range(SIMHASH_BITS):
                votes[i] += 1 if (h >> i) & 1 else -1
        exp = sum(1 << i for i in range(SIMHASH_BITS) if votes[i] > 0)
        assert sh[did] == exp
    assert sh[1] == sh[2]
    nd = {(r["a"], r["b"]): r["hamming"]
          for r in simhash_near_dups(df, max_hamming=6).collect()}
    assert nd[(1, 2)] == 0
    assert (1, 3) in nd  # one-token swap stays within small hamming
    assert (1, 4) not in nd


def test_cosine_topk_vs_numpy(spark):
    from webgraph_rs_spark.textops import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    qids = [0, 1, 2]
    got = cosine_topk(emb, qids, k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rnk"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for q in qids:
        sims = []
        for vid, v in vecs.items():
            if vid == q:
                continue
            s = float(vecs[q] @ v / (np.linalg.norm(vecs[q]) * np.linalg.norm(v)))
            sims.append((round(s, 6), vid))
        exp = [vid for s, vid in sorted(sims, key=lambda t: (-t[0], t[1]))[:5]]
        assert by_q[q] == exp, q


def test_lsh_ann_recall(spark):
    from webgraph_rs_spark.textops import cosine_topk, lsh_ann_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = list(range(10))
    exact = cosine_topk(emb, qids, k=5).collect()
    approx = lsh_ann_topk(emb, qids, k=5, n_planes=4).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.3  # 4 planes = 16 buckets over 500 vectors


def test_multimodal_plumbing(spark, docs):
    from webgraph_rs_spark.textops.multimodal import (
        decode_image_features,
        encode_fake_image,
        resize_images,
        synthesize_images,
        FEATURE_BANDS,
    )

    imgs = synthesize_images(docs.limit(50))
    feats = decode_image_features(imgs).collect()
    assert len(feats) == 50
    for r in feats:
        did = r["doc_id"]
        w, h = 16 + did % 48, 16 + (did * 7) % 32
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_bytes"] == 8 + w * h
        px = np.frombuffer(encode_fake_image(did, w, h)[8:], dtype=np.uint8)
        assert abs(r["mean_pixel"] - round(float(px.mean()), 6)) < 1e-9
        assert len(r["features"]) == FEATURE_BANDS
    # corrupt payload -> NULL metadata, no crash
    bad = spark.createDataFrame(
        [(999, bytearray(b"NOPE")), (1000, None)], "doc_id long, image binary"
    )
    out = {r["doc_id"]: r["width"] for r in decode_image_features(bad).collect()}
    assert out == {999: None, 1000: None}
    # resize regenerates at target dims
    rz = decode_image_features(resize_images(imgs, 20, 10)).collect()
    assert all((r["width"], r["height"]) == (20, 10) for r in rz)


def test_frame_sample_stub_raises(spark):
    from webgraph_rs_spark.textops.multimodal import frame_sample

    vid = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, image binary")
    df = frame_sample(vid)
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,frame_idx:int,frame:binary>"
    )
    with pytest.raises(Exception):
        df.collect()


def test_ivf_ann_recall_and_assignment(spark):
    from webgraph_rs_spark.textops import (
        cosine_topk,
        ivf_ann_topk,
        ivf_assign,
        ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    # every vector lands in exactly one of the n_cells cells
    assign = ivf_assign(emb, n_cells=8).collect()
    assert len(assign) == n
    cells = {r["cell"] for r in assign}
    assert cells <= set(range(8))
    # seed vectors are their own nearest centroid (cosine 1 with themselves)
    cts = {r["seed_id"]: r["cell"] for r in ivf_centroids(emb, 8).collect()}
    amap = {r["vec_id"]: r["cell"] for r in assign}
    for seed_id, cell in cts.items():
        assert amap[seed_id] == cell
    # probing more cells monotonically improves recall vs exact
    qids = list(range(20, 30))
    ex = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    r1 = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(emb, qids, k=5, n_cells=8, n_probe=2).collect()
    }
    r2 = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(emb, qids, k=5, n_cells=8, n_probe=8).collect()
    }
    rec1 = len(ex & r1) / len(ex)
    rec2 = len(ex & r2) / len(ex)
    assert rec2 >= rec1
    assert rec2 == 1.0  # probing ALL cells = exact


def test_duplicate_spans_cross_document(spark):
    """Substring-level dedup: a span shared by >= min_docs distinct docs
    is found; within-one-doc repeats and unique spans are not."""
    from webgraph_rs_spark.textops import duplicate_spans

    shared = "the quick brown fox jumps over the lazy"
    rows = [
        (0, f"alpha beta {shared} gamma delta epsilon zeta eta"),
        (1, f"one two three {shared} four five six seven"),
        (2, "entirely unrelated words appear in this document body here"),
        # same span twice WITHIN one doc only: must not count as cross-doc
        (3, f"x1 x2 x3 x4 x5 x6 x7 x8 {'p q r s t u v w ' * 2}tail"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["span"]: r["n_docs"] for r in duplicate_spans(docs, window=8).collect()}
    assert got.get(shared) == 2
    assert all(n >= 2 for n in got.values())
    # the within-doc repeat span is absent (distinct-doc count is 1)
    assert "p q r s t u v w" not in got


def test_ivf_kmeans_refinement_beats_seed_centroids(spark):
    """Lloyd refinement on a planted-cluster fixture: refined centroids
    must reduce quantization error vs the seed (smallest-id) centroids,
    and IVF recall at a small probe budget must not regress."""
    import numpy as np
    from webgraph_rs_spark.textops import (
        cosine_topk,
        ivf_ann_topk,
        ivf_assign,
        ivf_centroids,
        ivf_kmeans_centroids,
    )

    rng = np.random.default_rng(21)
    dim, n_clusters, per = 8, 6, 40
    rows = []
    for c in range(n_clusters):
        center = rng.normal(size=dim) * 3
        for i in range(per):
            v = center + rng.normal(size=dim) * 0.3
            rows.append((c * per + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    vecs = {vid: np.array(v) for vid, v in rows}

    def qerr(cts_df):
        cts = {r["cell"]: np.array(r["centroid"]) for r in cts_df.collect()}
        assign = {
            r["vec_id"]: r["cell"] for r in ivf_assign(emb, cts_df.select(
                "cell", "centroid"), n_clusters).collect()
        }
        tot = 0.0
        for vid, v in vecs.items():
            cvec = cts[assign[vid]]
            tot += 1 - (v @ cvec) / (np.linalg.norm(v) * np.linalg.norm(cvec))
        return tot / len(vecs)

    seed = ivf_centroids(emb, n_cells=n_clusters).select("cell", "centroid")
    refined = ivf_kmeans_centroids(emb, n_cells=n_clusters, iters=4)
    e_seed, e_ref = qerr(seed), qerr(refined)
    assert e_ref < e_seed, f"kmeans must reduce quantization error ({e_ref} vs {e_seed})"

    # recall@5 with 2 probes against exact top-k
    qids = [0, per, 2 * per]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(
            emb, qids, k=5, n_cells=n_clusters, n_probe=2, centroids=refined
        ).collect()
    }
    assert len(exact & got) / len(exact) >= 0.9


def test_embedding_near_dups_exact_within_buckets(spark):
    """Every reported pair must be a true >= threshold pair (precision 1.0);
    recall is bounded by bucket collisions — planted duplicate vectors
    always collide (identical sign pattern) and must be found."""
    import numpy as np
    from webgraph_rs_spark.textops import embedding_near_dups

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    got = embedding_near_dups(emb, threshold=0.4).collect()
    for r in got:
        a, b = vecs[r["a"]], vecs[r["b"]]
        true = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert round(true, 6) >= 0.4
        assert abs(round(true, 6) - r["cos_sim"]) < 1e-9
    # planted exact duplicates: append copies of vec 0 and 1
    dup = emb.limit(2).selectExpr(
        "vec_id + 100000 AS vec_id", "embedding", "label"
    )
    with_dups = emb.unionByName(dup)
    pairs = {
        (r["a"], r["b"])
        for r in embedding_near_dups(with_dups, threshold=0.999).collect()
    }
    base_ids = sorted(vecs)[:2]
    for i, bid in enumerate(base_ids):
        assert (bid, bid + 100000) in pairs


def test_embedding_near_dups_recall_at_threshold(spark):
    """Banded LSH recall at the threshold boundary: plant pairs at
    cos ~ 0.95 (NOT exact duplicates — the old all-8-plane bucket found
    only ~0.43 of these) and require recall >= 0.9 with the 16-plane /
    4-band OR-construction. Theory: per-plane agreement p = 1 - theta/pi
    ~ 0.90 at 18 deg; band recall 1 - (1 - p^4)^4 ~ 0.985."""
    import numpy as np
    from webgraph_rs_spark.textops import embedding_near_dups

    rng = np.random.default_rng(7)
    dim, n_pairs = 16, 60
    rows = []
    planted = []
    target = 0.95
    for p in range(n_pairs):
        a = rng.normal(size=dim)
        a /= np.linalg.norm(a)
        # perturb orthogonally so that cos(a, b) == target exactly
        r = rng.normal(size=dim)
        r -= (r @ a) * a
        r /= np.linalg.norm(r)
        b = target * a + math.sqrt(1 - target * target) * r
        ia, ib = 2 * p, 2 * p + 1
        rows.append((ia, [float(x) for x in a]))
        rows.append((ib, [float(x) for x in b]))
        planted.append((ia, ib))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["a"], r["b"])
        for r in embedding_near_dups(emb, threshold=0.9).collect()
    }
    hit = sum(1 for pr in planted if pr in got)
    recall = hit / n_pairs
    assert recall >= 0.9, f"banded LSH recall {recall} < 0.9"
    # precision stays exact: every reported pair verified >= threshold
    vecs = {vid: np.array(v) for vid, v in rows}
    for a, b in got:
        va, vb = vecs[a], vecs[b]
        assert va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)) >= 0.9 - 1e-9


def test_video_frames_compose_with_image_ops(spark, docs):
    """video -> frame_sample -> decode_image_features composes, and the
    decoded pixel sums match the closed-form frame formula."""
    from webgraph_rs_spark.textops.multimodal import (
        decode_image_features,
        frame_sample,
        synthesize_videos,
    )

    vids = synthesize_videos(docs.limit(20))
    frames = frame_sample(vids, every_n=4)
    rows = frames.collect()
    for r in rows:
        assert bytes(r["frame"][:4]) == b"FIMG"
    # closed-form: per doc, frames 0,4,8 while < nf
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for doc_id, idxs in by_doc.items():
        nf = 8 + doc_id % 9
        assert sorted(idxs) == list(range(0, nf, 4))
    # frames decode through the IMAGE operator; pixel sums are closed-form
    feats = decode_image_features(
        frames.selectExpr("doc_id", "frame AS image")
    ).collect()
    # frame f of doc d has pixels (d + 7f + 31x + 17y) % 251 — check one doc
    did = rows[0]["doc_id"]
    w, h = 16 + did % 16, 16 + (did * 3) % 16
    exp0 = sum(
        (did + 31 * x + 17 * y) % 251 for x in range(w) for y in range(h)
    )
    got0 = [f for f in feats if f["doc_id"] == did]
    assert any(f["pixel_sum"] == exp0 for f in got0)
    # corrupt payloads vanish silently
    import pyspark.sql.functions as SF

    bad = vids.limit(3).select("doc_id", SF.lit(b"JUNK").alias("video"))
    assert frame_sample(bad).count() == 0


def test_audio_features_closed_form(spark, docs):
    import numpy as np
    from webgraph_rs_spark.textops.multimodal import (
        decode_audio_features,
        synthesize_audio,
    )

    feats = decode_audio_features(synthesize_audio(docs.limit(25))).collect()
    assert len(feats) == 25
    for r in feats:
        n = 800 + (r["doc_id"] % 5) * 400
        assert r["n_samples"] == n
        assert r["sample_rate"] == 8000
        t = np.arange(n, dtype=np.int64)
        s = (((r["doc_id"] * 13 + t * t) % 4001) - 2000).astype(np.float64)
        assert abs(r["rms"] - round(float(np.sqrt((s * s).mean())), 6)) < 1e-9
        sign = np.signbit(s)
        assert r["zero_crossings"] == int((sign[1:] != sign[:-1]).sum())
        assert len(r["band_energy"]) == 4
