"""Local stand-in for the driver's CORRECTNESS gate.

Runs every ``queries()`` entry next to its ``oracle_sql()`` DuckDB
equivalent and compares row count, schema (column names) and values
after sorting columns by name and rows by value — the same comparison
shape the driver uses.  Usage:

    python tools/check_correctness.py [query ...]
    python tools/check_correctness.py --sf-dir /root/testdata/sf0.1 \\
        --json CORRECTNESS_sf0.1.json

At a scale factor other than sf0.01, the xxhash64-dependent queries
whose oracles are VALUES literals *dumped at sf0.01* (the SPECS set in
tools/gen_oracle_values.py) cannot be value-compared — they are run and
recorded rows-only (non-empty, schema-stable), the same weaker check
the driver applies to genuinely non-SQL queries.  Every SQL-oracled
query re-verifies fully at the new scale, which is the point of the
second-SF sweep: prove the green rows are not fixture-tuned.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VALUES_SF_DIR = "/root/testdata/sf0.01"  # where VALUES oracles are dumped
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

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="restrict to these queries")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SF_DIR", VALUES_SF_DIR))
    ap.add_argument("--json", dest="json_out", default=None,
                    help="write a CORRECTNESS-style JSON artifact")
    args = ap.parse_args()
    sf_dir = args.sf_dir

    # VALUES oracles are literal dumps at sf0.01: at any other SF those
    # queries use a second-scale pinned module when one was generated
    # (SF_VALUES_MODULES), else run rows-only (see module docstring)
    rows_only = set()
    sf_overrides: dict[str, str] = {}
    if os.path.normpath(sf_dir) != os.path.normpath(VALUES_SF_DIR):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from gen_oracle_values import SF_VALUES_MODULES, SPECS
        module = SF_VALUES_MODULES.get(os.path.normpath(sf_dir))
        if module:
            try:
                import importlib
                sf_overrides = importlib.import_module(
                    "mc2skos_spark.plans." + module).VALUES_SQL
            except ImportError:
                pass
        rows_only = set(SPECS) - set(sf_overrides)

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("check_correctness").getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(path):
            con.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s')"
                        % (t, path))

    queries = entry.queries()
    oracles = dict(entry.oracle_sql(), **sf_overrides)
    only = set(args.names)
    unknown = only - set(queries)
    if unknown:
        # a typo'd name silently matching nothing would print ALL OK
        print("unknown query name(s):", sorted(unknown))
        sys.exit(2)
    failures = []
    report: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None,
               "hash_match": None, "spark_rows": None,
               "oracle_rows": None, "err": None}
        report[name] = rec
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print("%-28s SPARK ERROR: %s" % (name, exc))
            rec["err"] = "spark: %s" % exc
            failures.append(name)
            continue
        rec["spark_rows"] = len(sdf)
        if name not in oracles or name in rows_only:
            why = ("VALUES oracle is sf0.01-bound"
                   if name in rows_only else "no oracle")
            ok = len(sdf) > 0
            rec["rows_match"] = ok  # rows-only: non-empty + ran clean
            print("%-28s rows=%d (rows-only: %s)%s"
                  % (name, len(sdf), why, "" if ok else " EMPTY"))
            if not ok:
                failures.append(name)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print("%-28s ORACLE ERROR: %s" % (name, exc))
            rec["err"] = "oracle: %s" % exc
            failures.append(name)
            continue
        rec["oracle_rows"] = len(odf)
        rec["rows_match"] = len(sdf) == len(odf)
        cols_s, cols_o = sorted(sdf.columns), sorted(odf.columns)
        rec["schema_match"] = cols_s == cols_o
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
        rec["hash_match"] = ok
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
    if args.json_out:
        with open(args.json_out, "w") as fp:
            json.dump({"sf_dir": sf_dir, "results": report}, fp, indent=1)
        print("wrote", args.json_out)
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
