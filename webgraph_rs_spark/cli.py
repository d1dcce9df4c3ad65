"""Command-line face of the engine — the analogue of the reference's
``webgraph`` / ``webgraph-sccs`` binaries (``cli/src/main.rs``,
``cli/src/sccs.rs``): every subcommand maps onto the library surface and
reads/writes stored graphs (`io.read_graph`/`io.write_graph`) and vertex
states (`io.write_vertex_state`).

    python -m webgraph_rs_spark from-arcs  --input arcs.tsv --output g/
    python -m webgraph_rs_spark stats      --graph g/
    python -m webgraph_rs_spark pagerank   --graph g/ --out ranks/
    python -m webgraph_rs_spark sccs       --graph g/ --out labels/
    python -m webgraph_rs_spark bfs        --graph g/ --root 0 --out dist/
    python -m webgraph_rs_spark hyperball  --graph g/ --out cent/
    python -m webgraph_rs_spark sumsweep   --graph g/
    python -m webgraph_rs_spark llp        --graph g/ --out perm/
    python -m webgraph_rs_spark transpose  --graph g/ --output gt/
    python -m webgraph_rs_spark er         --n 1000 --p 0.01 --output g/

Reference parity notes per subcommand live on the handlers.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from webgraph_rs_spark.session import get_spark

    return get_spark(
        app_name=f"webgraph_{args.cmd}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )


def _load(spark, args):
    from webgraph_rs_spark.io import read_graph

    return read_graph(spark, args.graph, validate=args.validate)


def _emit(df, out: str | None, fmt: str = "parquet"):
    from webgraph_rs_spark.io import write_vertex_state

    if out:
        write_vertex_state(df, out, fmt=fmt)
    else:
        for row in df.limit(20).collect():
            print(json.dumps(row.asDict(), default=str))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="webgraph_rs_spark")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=32)
    sub = p.add_subparsers(dest="cmd", required=True)

    def g_arg(sp, out=True):
        sp.add_argument("--graph", required=True)
        sp.add_argument("--validate", action="store_true")
        if out:
            sp.add_argument("--out", default=None)

    sp = sub.add_parser("from-arcs", help="ingest a TSV/CSV arc list (cli/src/from/arcs.rs)")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--sep", default="\t")
    sp.add_argument("--num-nodes", type=int, default=None)

    sp = sub.add_parser("to-arcs", help="export the arc list (cli/src/to/arcs.rs)")
    g_arg(sp, out=False)
    sp.add_argument("--output", required=True)

    sp = sub.add_parser("recompress", help="canonical-sort rewrite (to bvgraph analogue)")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)

    sp = sub.add_parser(
        "from-bv",
        help="ingest a REAL BVGraph bitstream basename (bvgraph/mod.rs format)",
    )
    sp.add_argument("--input", required=True, help="BVGraph basename (no extension)")
    sp.add_argument("--output", required=True, help="stored-graph output dir")

    sp = sub.add_parser(
        "to-bv",
        help="export as a real BVGraph bitstream (windowed Boldi-Vigna "
        "compressor; defaults 7/3/4 per comp/flags.rs)",
    )
    g_arg(sp, out=False)
    sp.add_argument("--output", required=True, help="BVGraph basename to write")
    sp.add_argument("--window-size", type=int, default=7)
    sp.add_argument("--max-ref-count", type=int, default=3)
    sp.add_argument("--min-interval-length", type=int, default=4)
    sp.add_argument("--zeta-k", type=int, default=3)
    sp.add_argument("--selection", choices=["greedy", "zuckerli"],
                    default="greedy",
                    help="reference selection: BvComp greedy or BvCompZ "
                    "Zuckerli DP (use --window-size 16 for the latter's "
                    "reference defaults)")
    sp.add_argument("--chunk-size", type=int, default=10_000)

    sp = sub.add_parser(
        "analyze-bv",
        help="bit-level code accounting of a BVGraph file "
        "(cli/src/analyze/codes.rs)",
    )
    sp.add_argument("--input", required=True, help="BVGraph basename")

    sp = sub.add_parser(
        "to-endianness",
        help="convert a BVGraph basename between big- and little-endian "
        "bitstreams (cli/src/to/endianness.rs)",
    )
    sp.add_argument("--input", required=True, help="source BVGraph basename")
    sp.add_argument("--output", required=True, help="target BVGraph basename")
    sp.add_argument("--endianness", choices=["big", "little"], required=True)
    sp.add_argument("--window-size", type=int, default=7)
    sp.add_argument("--max-ref-count", type=int, default=3)
    sp.add_argument("--min-interval-length", type=int, default=4)
    sp.add_argument("--zeta-k", type=int, default=3)

    for name in ("stats", "triangles", "acyclic", "sumsweep"):
        sp = sub.add_parser(name)
        g_arg(sp, out=False)
        if name == "sumsweep":
            sp.add_argument("--mode", default="radius_diameter",
                            choices=["radius_diameter", "all"])
            sp.add_argument("--out", default=None)

    sp = sub.add_parser("pagerank", help="algo/src/rank/pagerank.rs semantics")
    g_arg(sp)
    sp.add_argument("--alpha", type=float, default=0.85)
    sp.add_argument("--mode", default="strongly",
                    choices=["strongly", "weakly", "pseudo"])
    sp.add_argument("--max-iter", type=int, default=100)
    sp.add_argument("--threshold", type=float, default=1e-6)

    for name, help_ in (
        ("cc", "connected components (min-label)"),
        ("cc-star", "small-star/large-star components"),
        ("sccs", "directed SCC, trim + coloring (webgraph-sccs analogue)"),
        ("topo", "topological levels (Kahn peel)"),
    ):
        sp = sub.add_parser(name, help=help_)
        g_arg(sp)
        sp.add_argument("--renumber", action="store_true",
                        help="renumber labels by decreasing size (sort_by_size)")

    sp = sub.add_parser("bfs")
    g_arg(sp)
    sp.add_argument("--root", type=int, nargs="+", default=[0])
    sp.add_argument("--tree", action="store_true", help="emit predecessors")

    sp = sub.add_parser("perm-bfs", help="BFS layout permutation (cli/src/perm/bfs.rs)")
    g_arg(sp)
    sp.add_argument("--root", type=int, nargs="+", default=[0])

    sp = sub.add_parser("llp", help="layered label propagation permutation")
    g_arg(sp)
    sp.add_argument("--gammas", type=float, nargs="+", default=[0.0, 0.25, 0.5, 1.0])
    sp.add_argument("--iters-per-gamma", type=int, default=10)

    sp = sub.add_parser("hyperball")
    g_arg(sp)
    sp.add_argument("--max-iter", type=int, default=64)
    sp.add_argument("--lg-k", type=int, default=11)

    sp = sub.add_parser("er", help="seeded Erdos-Renyi generator")
    sp.add_argument("--n", type=int, required=True)
    sp.add_argument("--p", type=float, required=True)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--output", required=True)

    sp = sub.add_parser("transpose")
    g_arg(sp, out=False)
    sp.add_argument("--output", required=True)

    sp = sub.add_parser("symmetrize")
    g_arg(sp, out=False)
    sp.add_argument("--output", required=True)

    sp = sub.add_parser("to-ascii", help="adjacency text (cli/src/to/ascii.rs)")
    g_arg(sp)

    sp = sub.add_parser("check-symm", help="count asymmetric arcs (check/symm.rs)")
    g_arg(sp, out=False)

    sp = sub.add_parser("check-eq", help="graph equality (check/eq.rs)")
    g_arg(sp, out=False)
    sp.add_argument("--other", required=True)

    sp = sub.add_parser("locality", help="successor-gap stats (analyze codes analogue)")
    g_arg(sp, out=False)

    sp = sub.add_parser("perm-rand", help="seeded random permutation (perm/rand.rs)")
    sp.add_argument("--n", type=int, required=True)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--out", default=None)

    sp = sub.add_parser("perm-comp", help="compose permutations (perm/comp.rs)")
    sp.add_argument("--first", required=True, help="parquet (old_id, new_id)")
    sp.add_argument("--second", required=True)
    sp.add_argument("--out", default=None)

    sp = sub.add_parser("permute", help="relabel by permutation (transform/perm.rs)")
    g_arg(sp, out=False)
    sp.add_argument("--perm", required=True, help="parquet (old_id, new_id)")
    sp.add_argument("--output", required=True)

    sp = sub.add_parser("map", help="contract by mapping (transform/map.rs)")
    g_arg(sp, out=False)
    sp.add_argument("--mapping", required=True, help="parquet (old_id, new_id)")
    sp.add_argument("--output", required=True)

    sp = sub.add_parser("birank", help="bipartite BiRank (rank/birank.rs)")
    sp.add_argument("--edges", required=True, help="parquet (u, p)")
    sp.add_argument("--alpha", type=float, default=0.85)
    sp.add_argument("--beta", type=float, default=0.85)
    sp.add_argument("--max-iter", type=int, default=100)
    sp.add_argument("--threshold", type=float, default=1e-6)
    sp.add_argument("--out-users", default=None)
    sp.add_argument("--out-items", default=None)

    args = p.parse_args(argv)
    spark = _spark(args)

    if args.cmd == "from-arcs":
        from webgraph_rs_spark.graph import from_arc_list, from_edges
        from webgraph_rs_spark.io import write_graph

        g = from_arc_list(spark, args.input, sep=args.sep)
        if args.num_nodes:
            g = from_edges(spark, g.edges, num_nodes=args.num_nodes, layout=False)
        print(json.dumps(write_graph(g, args.output)))
    elif args.cmd == "to-arcs":
        from webgraph_rs_spark.io import to_arcs_csv

        to_arcs_csv(_load(spark, args), args.output)
    elif args.cmd == "recompress":
        from webgraph_rs_spark.io import recompress

        print(json.dumps(recompress(spark, args.input, args.output)))
    elif args.cmd == "from-bv":
        from webgraph_rs_spark.bvgraph import read_bvgraph
        from webgraph_rs_spark.io import write_graph

        g = read_bvgraph(spark, args.input)
        print(json.dumps(write_graph(g, args.output), default=str))
    elif args.cmd == "to-bv":
        from webgraph_rs_spark.bvgraph import write_bvgraph

        print(
            json.dumps(
                write_bvgraph(
                    spark,
                    _load(spark, args),
                    args.output,
                    zeta_k=args.zeta_k,
                    window_size=args.window_size,
                    max_ref_count=args.max_ref_count,
                    min_interval_length=args.min_interval_length,
                    selection=args.selection,
                    chunk_size=args.chunk_size,
                )
            )
        )
    elif args.cmd == "to-endianness":
        from webgraph_rs_spark.bvgraph import read_bvgraph, write_bvgraph

        src = read_bvgraph(spark, args.input, canonical=False)
        print(
            json.dumps(
                write_bvgraph(
                    spark,
                    src,
                    args.output,
                    zeta_k=args.zeta_k,
                    window_size=args.window_size,
                    max_ref_count=args.max_ref_count,
                    min_interval_length=args.min_interval_length,
                    endianness=args.endianness,
                )
            )
        )
    elif args.cmd == "analyze-bv":
        from webgraph_rs_spark.bvgraph import analyze_codes

        print(json.dumps(analyze_codes(args.input)))
    elif args.cmd == "stats":
        from webgraph_rs_spark.stats import graph_stats

        row = graph_stats(_load(spark, args)).collect()[0]
        print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "triangles":
        from webgraph_rs_spark.algorithms import triangle_count

        print(json.dumps({"triangles": int(triangle_count(_load(spark, args)))}))
    elif args.cmd == "acyclic":
        from webgraph_rs_spark.algorithms import is_acyclic

        print(json.dumps({"acyclic": bool(is_acyclic(_load(spark, args)))}))
    elif args.cmd == "sumsweep":
        from webgraph_rs_spark.algorithms import exact_sum_sweep

        res = exact_sum_sweep(_load(spark, args), mode=args.mode)
        # uncertified values are null; the certified [lo, hi] intervals are
        # always reported (never a 2^62 sentinel)
        print(json.dumps({
            "radius": res.radius, "diameter": res.diameter,
            "radius_interval": list(res.radius_interval or ()),
            "diameter_interval": list(res.diameter_interval or ()),
            "radial_node": res.radial_node, "diametral_node": res.diametral_node,
            "pivots": res.pivots_used, "converged": res.converged,
        }))
        if args.mode in ("all", "all_forward") and args.out:
            _emit(res.eccentricities, args.out)
    elif args.cmd == "pagerank":
        from webgraph_rs_spark.algorithms import pagerank

        res = pagerank(
            _load(spark, args), alpha=args.alpha, mode=args.mode,
            threshold=args.threshold, max_iter=args.max_iter,
        )
        print(json.dumps({"iterations": res.iterations, "err": res.err}))
        _emit(res.ranks.orderBy("rank", ascending=False), args.out)
    elif args.cmd in ("cc", "cc-star", "sccs"):
        from webgraph_rs_spark.algorithms import (
            cc_star,
            connected_components,
            renumber_by_size,
            strongly_connected_components,
        )

        fn = {"cc": connected_components, "cc-star": cc_star,
              "sccs": strongly_connected_components}[args.cmd]
        res = fn(_load(spark, args))
        labels = res.labels
        if args.renumber:
            labels = renumber_by_size(labels)
        n_comp = labels.select("label").distinct().count()
        print(json.dumps({"components": int(n_comp)}))
        _emit(labels, args.out)
    elif args.cmd == "topo":
        from webgraph_rs_spark.algorithms import topological_levels

        res = topological_levels(_load(spark, args))
        _emit(res.levels, args.out)
    elif args.cmd == "bfs":
        from webgraph_rs_spark.algorithms import bfs_distances, bfs_tree

        g = _load(spark, args)
        if args.tree:
            _emit(bfs_tree(g, args.root), args.out)
        else:
            _emit(bfs_distances(g, args.root).distances, args.out)
    elif args.cmd == "perm-bfs":
        from webgraph_rs_spark.algorithms import bfs_order

        _emit(bfs_order(_load(spark, args), args.root), args.out)
    elif args.cmd == "llp":
        from webgraph_rs_spark.algorithms import llp

        res = llp(_load(spark, args), gammas=tuple(args.gammas),
                  iters_per_gamma=args.iters_per_gamma)
        print(json.dumps({"gamma_costs": {str(k): v for k, v in
                                          res.gamma_costs.items()},
                          "final_cost": res.final_cost}))
        _emit(res.permutation, args.out)
    elif args.cmd == "hyperball":
        from webgraph_rs_spark.algorithms import hyperball

        res = hyperball(_load(spark, args), max_iter=args.max_iter,
                        lg_k=args.lg_k)
        print(json.dumps({"iterations": res.iterations,
                          "neighborhood_function": res.neighborhood_function}))
        _emit(res.centralities, args.out)
    elif args.cmd == "er":
        from webgraph_rs_spark.generators import erdos_renyi
        from webgraph_rs_spark.io import write_graph

        g = erdos_renyi(spark, args.n, args.p, seed=args.seed)
        print(json.dumps(write_graph(g, args.output)))
    elif args.cmd in ("transpose", "symmetrize"):
        from webgraph_rs_spark.io import write_graph
        from webgraph_rs_spark.transforms import symmetrize, transpose

        fn = transpose if args.cmd == "transpose" else symmetrize
        print(json.dumps(write_graph(fn(_load(spark, args)), args.output)))
    elif args.cmd == "to-ascii":
        from webgraph_rs_spark.io import to_ascii_adjacency

        _emit(to_ascii_adjacency(_load(spark, args)), args.out, fmt="csv")
    elif args.cmd == "check-symm":
        from webgraph_rs_spark.transforms import asymmetric_arcs

        n = asymmetric_arcs(_load(spark, args)).count()
        print(json.dumps({"asymmetric_arcs": int(n), "symmetric": n == 0}))
    elif args.cmd == "check-eq":
        from webgraph_rs_spark.io import read_graph
        from webgraph_rs_spark.transforms import graphs_equal

        eq = graphs_equal(_load(spark, args), read_graph(spark, args.other))
        print(json.dumps({"equal": bool(eq)}))
    elif args.cmd == "locality":
        from webgraph_rs_spark.stats import locality_stats

        row = locality_stats(_load(spark, args)).collect()[0]
        print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "perm-rand":
        from webgraph_rs_spark.generators import random_permutation

        _emit(random_permutation(spark, args.n, seed=args.seed), args.out)
    elif args.cmd == "perm-comp":
        from pyspark.sql import functions as F

        p1 = spark.read.parquet(args.first)
        p2 = spark.read.parquet(args.second)
        comp = (
            p1.select("old_id", F.col("new_id").alias("mid"))
            .join(p2.withColumnRenamed("old_id", "mid"), "mid")
            .select("old_id", "new_id")
        )
        _emit(comp, args.out)
    elif args.cmd in ("permute", "map"):
        from webgraph_rs_spark.io import write_graph
        from webgraph_rs_spark.transforms import map_nodes, permute

        table = spark.read.parquet(
            args.perm if args.cmd == "permute" else args.mapping
        )
        fn = permute if args.cmd == "permute" else map_nodes
        print(json.dumps(write_graph(fn(_load(spark, args), table), args.output)))
    elif args.cmd == "birank":
        from pyspark.sql import functions as F
        from webgraph_rs_spark.algorithms import birank

        e = spark.read.parquet(args.edges)
        users = e.select(F.col("u").alias("id")).distinct()
        items = e.select(F.col("p").alias("id")).distinct()
        res = birank(e, users, items, alpha=args.alpha, beta=args.beta,
                     threshold=args.threshold, max_iter=args.max_iter)
        print(json.dumps({"iterations": res.iterations}))
        if args.out_users:
            _emit(res.user_ranks, args.out_users)
        if args.out_items:
            _emit(res.item_ranks, args.out_items)
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
