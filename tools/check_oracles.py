"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` mirror on
DuckDB over the same parquet tables, then compares row count, column names,
and order-insensitive values. Usage:

    PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(norm_value(vals[i]) for i in order))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from webgraph_rs_spark.session import get_spark

    spark = get_spark(app_name="check_oracles")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = df.collect()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"WEAK  {name}: no oracle, rows={len(spark_rows)} "
                  f"({time.monotonic()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            continue
        ok = True
        msgs = []
        if sorted(spark_cols) != sorted(duck_cols):
            ok = False
            msgs.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        if len(spark_rows) != len(duck_rows):
            ok = False
            msgs.append(f"rows spark={len(spark_rows)} duck={len(duck_rows)}")
        if ok:
            a = norm_rows(spark_cols, [tuple(r) for r in spark_rows])
            b = norm_rows(duck_cols, duck_rows)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                na = len([1 for x, y in zip(a, b) if x != y])
                msgs.append(f"{na} differing rows, first: {diff}")
        status = "PASS " if ok else "FAIL "
        if not ok:
            failures.append(name)
        print(f"{status} {name}: rows={len(spark_rows)} "
              f"({time.monotonic()-t0:.1f}s) {'; '.join(msgs)}")

    print("\n==", "ALL PASS" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
