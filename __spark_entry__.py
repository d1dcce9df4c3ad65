"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2) over edge
tables derived deterministically from the driver's parquet testdata; each
entry has a DuckDB ``oracle_sql()`` mirror. Iterative algorithms (PageRank,
CC, label propagation, BFS, topo levels) are oracled by *programmatically
generated fixed-iteration SQL* — the same update rule unrolled K times — so
Spark and DuckDB compute the identical deterministic result (floats rounded
to kill summation-order noise).
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))

# ---------------------------------------------------------------- packaging


def _ship_package(spark: SparkSession) -> None:
    """Make webgraph_rs_spark importable on executors (pandas UDFs unpickle
    it there). Local stand-in for ``spark-submit --py-files``."""
    sc = spark.sparkContext
    marker = "_webgraph_rs_spark_shipped"
    if getattr(sc, marker, False):
        return
    pkg_dir = os.path.join(_REPO, "webgraph_rs_spark")
    zpath = os.path.join(tempfile.gettempdir(), "webgraph_rs_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, _REPO))
    sc.addPyFile(zpath)
    setattr(sc, marker, True)


def _import_engine():
    import sys

    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    import webgraph_rs_spark  # noqa: F401

    return webgraph_rs_spark


# ---------------------------------------------------------------- constants

N = 1024
PR_ITERS = 20
PR_ALPHA = 0.85
CC_ITERS = 8
LP_ITERS = 3
BFS_ITERS = 6
DAG_ITERS = 6

SQL_EDGES = (
    "SELECT DISTINCT l_orderkey % 1024 AS src, l_partkey % 1024 AS dst "
    "FROM lineitem WHERE l_orderkey % 1024 != l_partkey % 1024"
)
SQL_EDGES2 = (
    "SELECT DISTINCT o_orderkey % 1024 AS src, o_custkey % 1024 AS dst "
    "FROM orders WHERE o_orderkey % 1024 != o_custkey % 1024"
)
SQL_V = "SELECT range::BIGINT AS id FROM range(1024)"
SQL_SYM = (
    "SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e"
)

# ---------------------------------------------------------------- SQL builders


def _pagerank_sql(iters: int = PR_ITERS, alpha: float = PR_ALPHA, n: int = N) -> str:
    a = repr(alpha)
    one_minus = repr(1.0 - alpha)
    parts = [
        f"WITH e AS MATERIALIZED ({SQL_EDGES}),",
        f"v AS MATERIALIZED ({SQL_V}),",
        "deg AS MATERIALIZED (SELECT src, count(*) AS c FROM e GROUP BY src),",
        "ew AS MATERIALIZED (SELECT e.src, e.dst, 1.0/deg.c AS w FROM e JOIN deg ON e.src = deg.src),",
        f"r0 AS MATERIALIZED (SELECT id, 1.0/{n} AS pr FROM v),",
    ]
    for k in range(iters):
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT coalesce(sum(pr), 0.0) AS m FROM r{k} "
            f"WHERE id NOT IN (SELECT src FROM e)),"
        )
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT ew.dst AS id, sum(r{k}.pr * ew.w) AS s "
            f"FROM ew JOIN r{k} ON ew.src = r{k}.id GROUP BY ew.dst),"
        )
        parts.append(
            f"r{k + 1} AS MATERIALIZED (SELECT v.id, {one_minus}/{n} + {a}*(coalesce(c{k}.s, 0.0) "
            f"+ (SELECT m FROM d{k})/{n}) AS pr "
            f"FROM v LEFT JOIN c{k} ON v.id = c{k}.id),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT id, round(pr, 7) AS pr FROM r{iters}")
    return "\n".join(parts)


def _cc_sql(iters: int = CC_ITERS) -> str:
    parts = [
        f"WITH e AS MATERIALIZED ({SQL_EDGES}),",
        f"v AS MATERIALIZED ({SQL_V}),",
        f"u AS MATERIALIZED ({SQL_SYM}),",
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM v),",
    ]
    for k in range(iters):
        parts.append(
            f"nm{k} AS MATERIALIZED (SELECT u.dst AS id, min(l{k}.label) AS m "
            f"FROM u JOIN l{k} ON u.src = l{k}.id GROUP BY u.dst),"
        )
        parts.append(
            f"l{k + 1} AS MATERIALIZED (SELECT l{k}.id, "
            f"least(l{k}.label, coalesce(nm{k}.m, l{k}.label)) AS label "
            f"FROM l{k} LEFT JOIN nm{k} ON l{k}.id = nm{k}.id),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT id, label FROM l{iters}")
    return "\n".join(parts)


def _lp_sql(iters: int = LP_ITERS) -> str:
    parts = [
        f"WITH e AS MATERIALIZED ({SQL_EDGES}),",
        f"v AS MATERIALIZED ({SQL_V}),",
        f"u AS MATERIALIZED ({SQL_SYM}),",
        "p0 AS MATERIALIZED (SELECT id, id AS label FROM v),",
    ]
    for k in range(iters):
        parts.append(
            f"g{k} AS MATERIALIZED (SELECT u.dst AS id, p{k}.label AS label, count(*) AS cnt "
            f"FROM u JOIN p{k} ON u.src = p{k}.id GROUP BY u.dst, p{k}.label),"
        )
        parts.append(
            f"b{k} AS MATERIALIZED (SELECT id, label FROM (SELECT id, label, "
            f"row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn "
            f"FROM g{k}) WHERE rn = 1),"
        )
        parts.append(
            f"p{k + 1} AS MATERIALIZED (SELECT p{k}.id, coalesce(b{k}.label, p{k}.label) AS label "
            f"FROM p{k} LEFT JOIN b{k} ON p{k}.id = b{k}.id),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT id, label FROM p{iters}")
    return "\n".join(parts)


def _bfs_sql(iters: int = BFS_ITERS) -> str:
    parts = [
        f"WITH e AS MATERIALIZED ({SQL_EDGES}),",
        "d0 AS MATERIALIZED (SELECT 0::BIGINT AS id, 0::BIGINT AS distance),",
    ]
    for k in range(iters):
        parts.append(
            f"n{k} AS MATERIALIZED (SELECT e.dst AS id, min(d{k}.distance) + 1 AS nd "
            f"FROM e JOIN d{k} ON e.src = d{k}.id GROUP BY e.dst),"
        )
        parts.append(
            f"d{k + 1} AS MATERIALIZED (SELECT coalesce(a.id, b.id) AS id, "
            f"least(coalesce(a.distance, b.nd), coalesce(b.nd, a.distance)) AS distance "
            f"FROM d{k} a FULL OUTER JOIN n{k} b ON a.id = b.id),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT id, distance FROM d{iters}")
    return "\n".join(parts)


SQL_DAG = (
    "SELECT DISTINCT src, dst FROM ("
    "SELECT o_custkey % 32 AS src, 32 + o_custkey % 8 AS dst FROM orders "
    "UNION ALL "
    "SELECT 32 + o_custkey % 8 AS src, 40 + o_orderkey % 4 AS dst FROM orders "
    "UNION ALL "
    "SELECT 40 + o_orderkey % 4 AS src, 44 + o_orderkey % 2 AS dst FROM orders"
    ") WHERE src != dst"
)


def _topo_sql(iters: int = DAG_ITERS) -> str:
    """Kahn level = longest path from the sources = iterated max-plus."""
    parts = [
        f"WITH e AS MATERIALIZED ({SQL_DAG}),",
        "v AS (SELECT range::BIGINT AS id FROM range(56)),",
        "m0 AS MATERIALIZED (SELECT id, 0::BIGINT AS level FROM v),",
    ]
    for k in range(iters):
        parts.append(
            f"x{k} AS MATERIALIZED (SELECT e.dst AS id, max(m{k}.level) + 1 AS lv "
            f"FROM e JOIN m{k} ON e.src = m{k}.id GROUP BY e.dst),"
        )
        parts.append(
            f"m{k + 1} AS MATERIALIZED (SELECT m{k}.id, "
            f"greatest(m{k}.level, coalesce(x{k}.lv, 0)) AS level "
            f"FROM m{k} LEFT JOIN x{k} ON m{k}.id = x{k}.id),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT id, level FROM m{iters}")
    return "\n".join(parts)


_TRI_ORIENT_SQL = f"""
WITH e AS ({SQL_EDGES}),
s AS (SELECT least(src, dst) AS src, greatest(src, dst) AS dst FROM e
      GROUP BY 1, 2),
bi AS (SELECT src, dst FROM s UNION ALL SELECT dst AS src, src AS dst FROM s),
deg AS (SELECT src AS id, count(*) AS d FROM bi GROUP BY src),
o AS (SELECT bi.src AS a, bi.dst AS b FROM bi
      JOIN deg da ON bi.src = da.id JOIN deg db ON bi.dst = db.id
      WHERE da.d < db.d OR (da.d = db.d AND bi.src < bi.dst)),
t AS (SELECT x.a AS a, x.b AS b, y.b AS c FROM o x
      JOIN o y ON x.a = y.a AND x.b < y.b
      JOIN s ON s.src = x.b AND s.dst = y.b)
"""


# ---------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive the link graph at sf0.001, run PageRank (fixed 15
    iterations), return ranks joined with degrees, top 50."""
    _import_engine()
    _ship_package(spark)
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.algorithms import pagerank

    g = lineitem_graph(spark, "/root/testdata/sf0.001")
    pr = pagerank(g, alpha=0.85, threshold=None, max_iter=15)
    deg = g.degrees()
    return (
        pr.ranks.join(deg, "id")
        .select("id", F.round("rank", 7).alias("pr"), "out_deg", "in_deg")
        .orderBy(F.col("pr").desc(), F.col("id").asc())
        .limit(50)
    )


# ---------------------------------------------------------------- queries


def _q_edges(spark: SparkSession, sf: str) -> DataFrame:
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph

    return lineitem_graph(spark, sf).edges


def _q_degrees(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph

    return lineitem_graph(spark, sf).degrees()


def _q_stats(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.stats import graph_stats

    s = graph_stats(lineitem_graph(spark, sf))
    return s.select(
        "nodes",
        "arcs",
        "dangling",
        "sources",
        "isolated",
        "max_out_deg",
        "max_in_deg",
        F.round("avg_out_deg", 6).alias("avg_out_deg"),
        "self_loops",
    )


def _q_degree_dist(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.stats import degree_distribution

    return degree_distribution(lineitem_graph(spark, sf), "out")


def _q_transpose(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.transforms import transpose

    return transpose(lineitem_graph(spark, sf)).edges


def _q_symmetrize(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.transforms import symmetrize

    return symmetrize(lineitem_graph(spark, sf)).edges


def _q_union(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph, orders_graph
    from webgraph_rs_spark.transforms import union_graphs

    return union_graphs(lineitem_graph(spark, sf), orders_graph(spark, sf)).edges


def _q_permute(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph, N_NODES, PERM_A, PERM_B
    from webgraph_rs_spark.transforms import permute

    g = lineitem_graph(spark, sf)
    perm = spark.range(N_NODES).select(
        F.col("id").alias("old_id"),
        ((F.col("id") * PERM_A + PERM_B) % N_NODES).alias("new_id"),
    )
    return permute(g, perm).edges


def _q_contract(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph, N_NODES, CONTRACT_M
    from webgraph_rs_spark.transforms import map_nodes

    g = lineitem_graph(spark, sf)
    mapping = spark.range(N_NODES).select(
        F.col("id").alias("old_id"), (F.col("id") % CONTRACT_M).alias("new_id")
    )
    return map_nodes(g, mapping).edges


def _q_check_symm(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.transforms import asymmetric_arcs, symmetrize

    g = lineitem_graph(spark, sf)
    raw = asymmetric_arcs(g).count()
    sym = asymmetric_arcs(symmetrize(g)).count()
    return spark.createDataFrame(
        [(int(raw), int(sym))], "asym_raw long, asym_sym long"
    )


def _q_successors0(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph

    return lineitem_graph(spark, sf).successors(0)


def _q_pagerank(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.algorithms import pagerank

    g = lineitem_graph(spark, sf)
    pr = pagerank(g, alpha=PR_ALPHA, threshold=None, max_iter=PR_ITERS)
    return pr.ranks.select("id", F.round("rank", 7).alias("pr"))


def _q_pagerank_topk(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.algorithms import pagerank

    g = lineitem_graph(spark, sf)
    pr = pagerank(g, alpha=PR_ALPHA, threshold=None, max_iter=PR_ITERS)
    return (
        pr.ranks.select("id", F.round("rank", 7).alias("pr"))
        .orderBy(F.col("pr").desc(), F.col("id").asc())
        .limit(20)
    )


def _q_cc(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.algorithms import connected_components

    return connected_components(lineitem_graph(spark, sf)).labels


def _q_cc_star(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.algorithms import cc_star

    return cc_star(lineitem_graph(spark, sf)).labels


def _q_cc_sizes(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.algorithms import connected_components, renumber_by_size

    labels = connected_components(lineitem_graph(spark, sf)).labels
    return renumber_by_size(labels)


def _q_labelprop(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.algorithms import label_propagation

    return label_propagation(lineitem_graph(spark, sf), max_iter=LP_ITERS).labels


def _q_triangles(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.algorithms import triangle_count

    t = triangle_count(lineitem_graph(spark, sf))
    return spark.createDataFrame([(int(t),)], "triangles long")


def _q_triangles_per_vertex(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.algorithms import triangles_per_vertex

    return triangles_per_vertex(lineitem_graph(spark, sf))


def _q_bfs(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import lineitem_graph
    from webgraph_rs_spark.algorithms import bfs_distances

    return bfs_distances(lineitem_graph(spark, sf), [0]).distances


def _q_topo(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import layered_dag
    from webgraph_rs_spark.algorithms import topological_levels

    return topological_levels(layered_dag(spark, sf)).levels


def _q_intern(spark, sf):
    _import_engine()
    from webgraph_rs_spark.graph import intern_labels

    nation = spark.read.parquet(f"{sf}/nation.parquet")
    region = spark.read.parquet(f"{sf}/region.parquet")
    arcs = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_name").alias("src"), F.col("r_name").alias("dst"))
    edges, _d = intern_labels(arcs)
    return edges.dropDuplicates(["src", "dst"])


def _q_perm_compose(spark, sf):
    _import_engine()
    from webgraph_rs_spark.testgraphs import N_NODES
    from webgraph_rs_spark.transforms import invert_permutation

    p1 = spark.range(N_NODES).select(
        F.col("id").alias("old_id"), ((F.col("id") * 37 + 11) % N_NODES).alias("new_id")
    )
    p2 = spark.range(N_NODES).select(
        F.col("id").alias("old_id"), ((F.col("id") * 5 + 3) % N_NODES).alias("new_id")
    )
    # compose p2 after p1, then sanity: composing with inverse of itself
    comp = (
        p1.select(F.col("old_id"), F.col("new_id").alias("mid"))
        .join(p2.withColumnRenamed("old_id", "mid"), "mid")
        .select("old_id", "new_id")
    )
    inv = invert_permutation(comp).select(
        F.col("old_id").alias("new_id"), F.col("new_id").alias("back")
    )
    return comp.join(inv, "new_id").select("old_id", "new_id", "back")


def _q_events_window(spark, sf):
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def _q_page_text(spark, sf):
    """Byte-identical extraction through the pandas UDF: build html from the
    documents table in pure SQL expressions, extract text back, compare to
    the normalized source text (oracle recomputes the normalization)."""
    _import_engine()
    _ship_package(spark)
    from webgraph_rs_spark.extract import extract_text_udf

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    esc = F.replace(
        F.replace(
            F.replace(norm, F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    html = F.concat(
        F.lit("<html><head></head><body><p>"),
        esc,
        F.lit("</p></body></html>"),
    )
    return docs.select(
        "doc_id",
        extract_text_udf(F.encode(html, "utf-8")).alias("text"),
    )


def _q_page_links(spark, sf):
    """Link extraction through the pandas UDF: html links follow the
    deterministic rule dst = (doc_id * 31 + k) % n_docs for k in 1..3."""
    _import_engine()
    _ship_package(spark)
    from webgraph_rs_spark.extract import extract_links_udf

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_docs = docs.count()
    links = [
        F.concat(
            F.lit('<a href="https://docs.example.org/'),
            ((F.col("doc_id") * 31 + k) % n_docs).cast("string"),
            F.lit('">x</a>'),
        )
        for k in (1, 2, 3)
    ]
    html = F.concat(F.lit("<html><body>"), *links, F.lit("</body></html>"))
    out = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(extract_links_udf(F.encode(html, "utf-8"))).alias("u"),
    )
    return out.select(
        "src",
        F.regexp_extract("u", r"/(\d+)$", 1).cast("long").alias("dst"),
    ).dropDuplicates(["src", "dst"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "graph_edges": _q_edges,
        "graph_degrees": _q_degrees,
        "graph_stats": _q_stats,
        "degree_distribution": _q_degree_dist,
        "transpose": _q_transpose,
        "symmetrize": _q_symmetrize,
        "union_graphs": _q_union,
        "permute": _q_permute,
        "contract": _q_contract,
        "check_symm": _q_check_symm,
        "successors_0": _q_successors0,
        "pagerank": _q_pagerank,
        "pagerank_topk": _q_pagerank_topk,
        "cc_labels": _q_cc,
        "cc_star_labels": _q_cc_star,
        "cc_renumbered": _q_cc_sizes,
        "labelprop": _q_labelprop,
        "triangles": _q_triangles,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "bfs_from_0": _q_bfs,
        "topo_levels": _q_topo,
        "intern_string_graph": _q_intern,
        "perm_compose": _q_perm_compose,
        "events_window": _q_events_window,
        "page_text_extraction": _q_page_text,
        "page_link_extraction": _q_page_links,
    }


def oracle_sql() -> dict[str, str]:
    sym_deg = f"""
WITH e AS ({SQL_EDGES}), v AS ({SQL_V}),
od AS (SELECT src AS id, count(*) AS c FROM e GROUP BY src),
idg AS (SELECT dst AS id, count(*) AS c FROM e GROUP BY dst)
"""
    return {
        "graph_edges": f"{SQL_EDGES}",
        "graph_degrees": sym_deg
        + """
SELECT v.id, coalesce(od.c, 0) AS out_deg, coalesce(idg.c, 0) AS in_deg
FROM v LEFT JOIN od ON v.id = od.id LEFT JOIN idg ON v.id = idg.id
""",
        "graph_stats": sym_deg
        + """
, d AS (SELECT v.id, coalesce(od.c,0) AS o, coalesce(idg.c,0) AS i
        FROM v LEFT JOIN od ON v.id = od.id LEFT JOIN idg ON v.id = idg.id)
SELECT count(*) AS nodes, sum(o) AS arcs,
       sum(CASE WHEN o = 0 THEN 1 ELSE 0 END) AS dangling,
       sum(CASE WHEN i = 0 THEN 1 ELSE 0 END) AS sources,
       sum(CASE WHEN o = 0 AND i = 0 THEN 1 ELSE 0 END) AS isolated,
       max(o) AS max_out_deg, max(i) AS max_in_deg,
       round(avg(o), 6) AS avg_out_deg, 0::BIGINT AS self_loops
FROM d
""",
        "degree_distribution": sym_deg
        + """
, d AS (SELECT v.id, coalesce(od.c, 0) AS deg FROM v LEFT JOIN od ON v.id = od.id)
SELECT deg, count(*) AS n_nodes FROM d GROUP BY deg
""",
        "transpose": f"WITH e AS ({SQL_EDGES}) SELECT dst AS src, src AS dst FROM e",
        "symmetrize": f"WITH e AS ({SQL_EDGES}) "
        "SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e",
        "union_graphs": f"WITH e AS ({SQL_EDGES}), e2 AS ({SQL_EDGES2}) "
        "SELECT src, dst FROM e UNION SELECT src, dst FROM e2",
        "permute": f"WITH e AS ({SQL_EDGES}) "
        "SELECT DISTINCT (src*37+11) % 1024 AS src, (dst*37+11) % 1024 AS dst FROM e",
        "contract": f"WITH e AS ({SQL_EDGES}) "
        "SELECT DISTINCT src % 128 AS src, dst % 128 AS dst FROM e",
        "check_symm": f"""
WITH e AS ({SQL_EDGES}),
s AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e)
SELECT
 (SELECT count(*) FROM e a WHERE NOT EXISTS
   (SELECT 1 FROM e b WHERE b.src = a.dst AND b.dst = a.src)) AS asym_raw,
 (SELECT count(*) FROM s a WHERE NOT EXISTS
   (SELECT 1 FROM s b WHERE b.src = a.dst AND b.dst = a.src)) AS asym_sym
""",
        "successors_0": f"WITH e AS ({SQL_EDGES}) SELECT dst FROM e WHERE src = 0",
        "pagerank": _pagerank_sql(),
        "pagerank_topk": _pagerank_sql()
        + "\nORDER BY pr DESC, id ASC LIMIT 20",
        "cc_labels": _cc_sql(),
        "cc_star_labels": _cc_sql(),
        "cc_renumbered": _cc_sql().replace(
            f"SELECT id, label FROM l{CC_ITERS}",
            f""", fin AS (SELECT id, label FROM l{CC_ITERS}),
sz AS (SELECT label, count(*) AS size FROM fin GROUP BY label),
rn AS (SELECT label, row_number() OVER (ORDER BY size DESC, label ASC) - 1 AS new_label FROM sz)
SELECT fin.id, rn.new_label AS label FROM fin JOIN rn ON fin.label = rn.label""",
        ),
        "labelprop": _lp_sql(),
        "triangles": _TRI_ORIENT_SQL + "SELECT count(*) AS triangles FROM t",
        "triangles_per_vertex": _TRI_ORIENT_SQL
        + f""", per AS (SELECT id, count(*) AS cnt FROM (
  SELECT a AS id FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t
) GROUP BY id), v AS ({SQL_V})
SELECT v.id, coalesce(per.cnt, 0) AS triangles FROM v LEFT JOIN per ON v.id = per.id""",
        "bfs_from_0": _bfs_sql(),
        "topo_levels": _topo_sql(),
        "intern_string_graph": """
WITH arcs AS (SELECT DISTINCT n_name AS s, r_name AS d
              FROM nation JOIN region ON n_regionkey = r_regionkey),
names AS (SELECT s AS name FROM arcs UNION SELECT d FROM arcs),
dict AS (SELECT name, row_number() OVER (ORDER BY name) - 1 AS id FROM names)
SELECT DISTINCT ds.id AS src, dd.id AS dst
FROM arcs JOIN dict ds ON arcs.s = ds.name JOIN dict dd ON arcs.d = dd.name
""",
        "perm_compose": """
SELECT id AS old_id, (5 * ((id * 37 + 11) % 1024) + 3) % 1024 AS new_id,
       id AS back
FROM (SELECT range::BIGINT AS id FROM range(1024))
""",
        "events_window": """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
""",
        "page_text_extraction": r"""
SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS text
FROM documents
""",
        "page_link_extraction": """
WITH n AS (SELECT count(*) AS c FROM documents)
SELECT DISTINCT doc_id AS src, (doc_id * 31 + k) % (SELECT c FROM n) AS dst
FROM documents, (SELECT unnest([1, 2, 3]) AS k)
""",
    }
