"""Dump `.explain("formatted")` for registered queries to text files.

Used to produce the per-round plan evidence (plans/rNN/<query>_{before,
after}.txt): run once from a worktree at the round-start commit with
``--suffix before`` and once from HEAD with ``--suffix after``.

Usage::

    python tools/dump_plans.py --out plans/r07 --suffix after q1 q2 ...

Iterative queries (fixpoint loops) run jobs while building their final
DataFrame; the dumped plan is the final result's lineage, which is what
explain can show — loop-shape claims are cross-checked by job-count
evidence in bench_extra / pytest instead.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from mc2skos_spark.plans.session import build_session
    import __spark_entry__ as entry_mod

    spark = build_session(app_name="dump-plans", master="local[4]",
                          shuffle_partitions=8)
    queries = entry_mod.queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries:
        if name not in queries:
            print("SKIP (unknown):", name, flush=True)
            continue
        df = queries[name](spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(args.out, "%s_%s.txt" % (name, args.suffix))
        with open(path, "w") as fp:
            fp.write(txt)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
