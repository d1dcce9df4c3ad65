"""LLP combine/permutation properties + streaming ingestion smoke."""

from __future__ import annotations

from pyspark.sql import functions as F

from webgraph_rs_spark.generators import pref_attach_like, random_permutation
from webgraph_rs_spark.graph import graph_from_pandas
from webgraph_rs_spark.algorithms.llp import gap_cost, labels_to_ranks, llp
from webgraph_rs_spark.transforms import permute, graphs_equal


def test_labels_to_ranks_groups_labels(spark):
    labels = spark.createDataFrame(
        [(0, 5), (1, 2), (2, 5), (3, 2), (4, 9)], "id long, label long"
    )
    perm = {r["old_id"]: r["new_id"] for r in labels_to_ranks(labels).collect()}
    assert sorted(perm.values()) == list(range(5))
    # label 2 nodes (1,3) first, then label 5 (0,2), then 9 (4)
    assert perm[1] == 0 and perm[3] == 1 and perm[0] == 2 and perm[2] == 3 and perm[4] == 4


def test_llp_improves_gap_cost(spark):
    # ring of cliques: clear community structure for LP to recover
    k, nc = 10, 40  # 40 cliques of 10 -> 400 nodes
    edges = []
    for c in range(nc):
        base = c * k
        edges += [(base + i, base + j) for i in range(k) for j in range(k) if i != j]
        edges.append((base, ((c + 1) % nc) * k))  # ring bridges
    n = nc * k
    g = graph_from_pandas(spark, edges, n)
    # scramble node ids first so there is locality to recover
    scram = random_permutation(spark, n, seed=9)
    gs = permute(g, scram)
    identity = spark.range(n).select(
        F.col("id").alias("old_id"), F.col("id").alias("new_id")
    )
    base_cost = gap_cost(gs, identity)
    res = llp(gs, gammas=(0.0, 0.5), iters_per_gamma=5)
    assert res.final_cost < 0.7 * base_cost  # the whole point of LLP
    rows = res.permutation.collect()
    assert sorted(r["old_id"] for r in rows) == list(range(n))
    assert sorted(r["new_id"] for r in rows) == list(range(n))
    # relabeled graph keeps its arc count (isomorphic relabel)
    rg = permute(gs, res.permutation)
    assert rg.edges.count() == gs.num_arcs


def test_llp_min_gain_early_stop(spark):
    """MinGain predicate (llp/preds.rs:40-47): a converged gamma pass must
    stop before exhausting its iteration budget; the permutation stays a
    bijection and costs are still recorded."""
    from webgraph_rs_spark.algorithms.labelprop import label_propagation

    k, nc = 8, 10  # 10 cliques of 8 — LP converges in 2-3 rounds
    edges = []
    for c in range(nc):
        base = c * k
        edges += [(base + i, base + j) for i in range(k) for j in range(k) if i != j]
        edges.append((base, ((c + 1) % nc) * k))
    n = nc * k
    g = graph_from_pandas(spark, edges, n)
    budget = 25
    res = llp(g, gammas=(0.0, 0.5), iters_per_gamma=budget, min_gain=0.001)
    assert res.gamma_iters, "per-gamma iteration counts must be reported"
    assert all(0 < it <= budget for it in res.gamma_iters.values())
    assert any(it < budget for it in res.gamma_iters.values()), (
        f"expected early stop on a converged gamma, got {res.gamma_iters}"
    )
    rows = res.permutation.collect()
    assert sorted(r["new_id"] for r in rows) == list(range(n))
    # gain metric is visible in the LP metrics history too
    lp = label_propagation(g, max_iter=budget, gamma=0.0, min_gain=0.001)
    assert lp.iterations < budget
    assert all("gain" in m for m in lp.metrics_history)


def test_streaming_ingestion(spark, tmp_path):
    from webgraph_rs_spark.pages import synthesize_pages_from_pairs
    from webgraph_rs_spark.streaming import (
        run_stream_to_memory,
        streaming_edge_extraction,
        streaming_link_counts,
    )
    from tests.oracles import canonical8

    n, edges = canonical8()
    pages = synthesize_pages_from_pairs(spark, edges, n)
    src_dir = str(tmp_path / "pages_stream")
    pages.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)

    links = streaming_edge_extraction(stream)
    run_stream_to_memory(links, "links_out")
    got = spark.sql("SELECT count(*) AS n FROM links_out").collect()[0]["n"]
    assert got == len(edges)

    counts = streaming_link_counts(stream, window="1 hour")
    run_stream_to_memory(counts, "counts_out", mode="append")
    # append mode + watermark: finalized windows only may be empty for the
    # tiny fixed timestamps; complete-mode check instead
    counts2 = streaming_link_counts(stream, window="1 hour")
    q = (
        counts2.writeStream.outputMode("complete")
        .format("memory")
        .queryName("counts_complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT src_url, n_links FROM counts_complete"
    ).collect()
    out_deg = {}
    for s, d in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    from webgraph_rs_spark.pages import url_for

    got_deg = {r["src_url"]: r["n_links"] for r in rows}
    assert got_deg == {url_for(s): c for s, c in out_deg.items()}


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """First-seen wins across micro-batches: batch 2 re-sends batch 1 texts
    plus new ones; only the new ones surface."""
    import json
    import os

    from webgraph_rs_spark.streaming import (
        run_stream_to_memory,
        streaming_exact_dedup,
    )

    src = tmp_path / "docs_stream"
    os.makedirs(src)
    b1 = [{"doc_id": i, "text": f"text number {i % 3}"} for i in range(6)]
    with open(src / "b1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in b1))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    dedup = streaming_exact_dedup(stream)
    name = "dedup_smoke"
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    got1 = {
        r["text"] for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # 6 docs, 3 distinct texts -> 3 survivors
    assert got1 == {f"text number {k}" for k in range(3)}

    b2 = [{"doc_id": 100 + i, "text": f"text number {i}"} for i in range(5)]
    with open(src / "b2.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in b2))
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    texts = sorted(r["text"] for r in rows)
    # batch 2 adds only texts 3 and 4; 0-2 are cross-batch duplicates
    assert texts == sorted(f"text number {k}" for k in range(5))
    assert len(rows) == 5
