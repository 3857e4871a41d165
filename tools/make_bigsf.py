"""Stage a scaled-up copy of an sf directory for perf measurement.

The driver's round-end MEASUREMENT may run at a larger, driver-generated
scale factor (BENCH_r06.json: sf=1.0) that we cannot regenerate locally
(its generator is driver-side).  This tool approximates that scale by
unioning K key-shifted copies of /root/testdata/sf0.1 so optimizations
can be validated at ~10x row counts, not just at the 600k-row default.

It is measurement STAGING only: bench.py itself is untouched and is
simply pointed at the output via $SPARK_GRAFT_SF_DIR.  Nothing here is
cached into any query path.

Per-copy transforms (copy k of K, offset O = 100_000_000):

- every surrogate/foreign key column += k*O (referential integrity of
  customer←orders←lineitem, part/supplier←lineitem, user/event ids is
  preserved copy-locally, like a disjoint shard of a bigger corpus);
- nation/region stay single-copy (fixed-size dimensions, as in TPC-H);
- events.ts is NOT shifted: the driver's generator keeps the event
  window fixed as sf grows (BENCH_r06's rj_event_overlap grew 23x for
  10x rows — the ~100x pair-count signature of 10x density in a fixed
  window, not the ~10x of a stretched one), so copies stack into the
  same 30-day range and per-bucket densities scale like the driver's;
  user-keyed temporal queries are unaffected (user ids are per-copy);
- documents.text gets a 1-token copy tag prefix: within-copy duplicate
  structure is preserved exactly, cross-copy 10x exact-duplicate
  explosion (which the driver's true generator does not have) is
  avoided;
- embeddings are circularly rotated by k positions: all WITHIN-copy
  pairwise dot products are bit-preserved (rotation invariance), while
  cross-copy vectors decorrelate — semantic-dedup cluster structure
  scales instead of collapsing into 10x-duplicate clusters.

Usage::

    python tools/make_bigsf.py [--src /root/testdata/sf0.1] \
        [--out /tmp/bigsf/sf1.0] [--copies 10]

then  SPARK_GRAFT_SF_DIR=/tmp/bigsf/sf1.0 python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F

OFFSET = 100_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["nation", "region"]


def scale_table(spark, src: str, out: str, name: str, copies: int) -> int:
    df = spark.read.parquet(os.path.join(src, name + ".parquet"))
    if name in SINGLE_COPY:
        df.write.mode("overwrite").parquet(
            os.path.join(out, name + ".parquet"))
        return df.count()

    parts = []
    for k in range(copies):
        c = df
        for col in KEY_COLS.get(name, []):
            typ = dict(df.dtypes)[col]
            c = c.withColumn(col, (F.col(col) + F.lit(k * OFFSET))
                             .cast(typ))
        if name == "documents" and k:
            c = c.withColumn("text", F.concat(F.lit("cpy%d " % k),
                                              F.col("text")))
        if name == "embeddings" and k:
            # circular rotation by k: within-copy dot products are
            # preserved bit-for-bit, cross-copy vectors decorrelate
            e = F.col("embedding")
            c = c.withColumn(
                "embedding",
                F.when(F.size(e) > k,
                       F.concat(F.slice(e, k + 1, 1 << 30),
                                F.slice(e, 1, k))).otherwise(e))
        parts.append(c)
    big = parts[0]
    for c in parts[1:]:
        big = big.unionByName(c)
    big.write.mode("overwrite").parquet(os.path.join(out, name + ".parquet"))
    return big.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/bigsf/sf1.0")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mc2skos_spark.plans.session import build_session

    spark = build_session(app_name="make-bigsf")
    os.makedirs(args.out, exist_ok=True)
    tables = list(KEY_COLS) + SINGLE_COPY
    only = os.environ.get("BIGSF_TABLES")
    if only:
        tables = [t for t in tables if t in only.split(",")]
    for name in tables:
        n = scale_table(spark, args.src, args.out, name, args.copies)
        print("%-12s %10d rows" % (name, n), flush=True)
    open(os.path.join(args.out, "_DONE"), "w").close()
    spark.stop()


if __name__ == "__main__":
    main()
