"""Local stand-in for the driver's CORRECTNESS gate.

Runs every ``queries()`` entry at sf0.01 next to its ``oracle_sql()``
DuckDB equivalent and compares row count, schema (column names) and
values after sorting columns by name and rows by value — the same
comparison shape the driver uses.  Usage:

    python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return "%.10g" % v
    return v


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("check_correctness").getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, t + ".parquet")
        if os.path.exists(path):
            con.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s')"
                        % (t, path))

    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    unknown = only - set(queries)
    if unknown:
        # a typo'd name silently matching nothing would print ALL OK
        print("unknown query name(s):", sorted(unknown))
        sys.exit(2)
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            print("%-28s SPARK ERROR: %s" % (name, exc))
            failures.append(name)
            continue
        if name not in oracles:
            print("%-28s rows=%d (no oracle)" % (name, len(sdf)))
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print("%-28s ORACLE ERROR: %s" % (name, exc))
            failures.append(name)
            continue
        cols_s, cols_o = sorted(sdf.columns), sorted(odf.columns)
        if cols_s != cols_o:
            print("%-28s SCHEMA MISMATCH %s vs %s"
                  % (name, cols_s, cols_o))
            failures.append(name)
            continue
        a = sorted((tuple(norm(v) for v in row)
                    for row in sdf[cols_s].itertuples(index=False)),
                   key=repr)
        b = sorted((tuple(norm(v) for v in row)
                    for row in odf[cols_o].itertuples(index=False)),
                   key=repr)
        ok = a == b
        print("%-28s rows=%d/%d %s"
              % (name, len(a), len(b), "OK" if ok else "VALUE MISMATCH"))
        if not ok:
            sa, sb = set(a), set(b)
            for r in list(sa - sb)[:3]:
                print("    spark-only:", r)
            for r in list(sb - sa)[:3]:
                print("    oracle-only:", r)
            failures.append(name)
    spark.stop()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
