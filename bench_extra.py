"""Per-query isolation bench (guide §1.4): times registered queries
with the SAME methodology as bench.py (noop sink, min-of-N, warm
session) without touching the frozen bench.py.

Usage::

    python bench_extra.py [--sf-dir DIR] [--repeats 3] [q1 q2 ...]

Prints one JSON line {"queries": {name: min_sec}, "samples": {...}}.
Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mc2skos_spark.plans.session import build_session
    import __spark_entry__ as entry_mod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()
    spark = build_session(app_name="mc2skos-bench-extra",
                          master="local[%d]" % cpus,
                          shuffle_partitions=max(cpus, 16))
    queries = entry_mod.queries()
    names = args.queries or sorted(queries)
    # same warm-up discipline as bench.py
    queries["g1_dedup_set"](spark, args.sf_dir).write.format("noop") \
        .mode("overwrite").save()

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription("bench_extra: " + name)
            t0 = time.monotonic()
            df = queries[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        timings[name] = min(runs)
        samples[name] = runs
        print("## %-28s min %7.3f  %s" % (name, min(runs), runs),
              file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": cpus,
                      "queries": timings, "samples": samples}))


if __name__ == "__main__":
    main()
