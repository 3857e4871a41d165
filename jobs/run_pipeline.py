#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline.

Cluster deployment (north_rule):

    zip -r mc2skos_spark.zip mc2skos_spark
    spark-submit --master <cluster> --py-files mc2skos_spark.zip \\
        jobs/run_pipeline.py --input <transcripts parquet/table> \\
        --warehouse <catalog root> [--expand] [--no-canonicalize] \\
        [--scheme gnd] [--webdewey] [--altlabels] [--components] \\
        [--block-size 4096]

Local smoke:

    spark-submit --master local[4] --py-files mc2skos_spark.zip \\
        jobs/run_pipeline.py --synth 200 --warehouse /tmp/kgwh

Flags mirror the reference CLI (/root/reference/mc2skos/mc2skos.py:
206-250) where they are meaningful at scale.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser(
        description="MARC21→SKOS KG construction over transcript tables")
    parser.add_argument("--input", help="transcripts parquet path/table")
    parser.add_argument("--synth", type=int, default=0,
                        help="generate N synthetic records instead of "
                             "--input (smoke/bench)")
    parser.add_argument("--warehouse", required=True,
                        help="Icebergish catalog root")
    parser.add_argument("--scheme", dest="scheme", default=None,
                        help="force default vocabulary scheme (e.g. gnd)")
    parser.add_argument("--webdewey", action="store_true")
    parser.add_argument("--altlabels", action="store_true")
    parser.add_argument("--components", action="store_true")
    parser.add_argument("--exclude-notes", action="store_true")
    parser.add_argument("--skip-classification", action="store_true")
    parser.add_argument("--skip-authority", action="store_true")
    parser.add_argument("--expand", action="store_true",
                        help="SKOS inference post-pass")
    parser.add_argument("--transitive", action="store_true",
                        help="materialize skos:broaderTransitive "
                             "(skosify transitive=True analog)")
    parser.add_argument("--validate", action="store_true",
                        help="commit a validation_warnings stage "
                             "(skosify check pass: cycles, label "
                             "conflicts)")
    parser.add_argument("--no-canonicalize", action="store_true")
    parser.add_argument("--force", action="store_true",
                        help="rerun every stage even if the warehouse "
                             "holds committed snapshots")
    parser.add_argument("--block-size", type=int, default=None,
                        help="two-phase reassembly block size for "
                             "pathologically long conversations")
    parser.add_argument("--max-ident-freq", type=int, default=None,
                        help="degenerate-identifier stop-key cap for "
                             "the canonicalization self-join (an "
                             "(identifier, authority) group above the "
                             "cap carries no identity signal and is "
                             "dropped from candidate generation — see "
                             "BENCH/_skewjoin.md)")
    parser.add_argument("--turtle-out", default=None,
                        help="also write an ordered Turtle rendering")
    args = parser.parse_args()
    if not args.synth and not args.input:
        parser.error("one of --input or --synth is required")

    # allow `python jobs/run_pipeline.py` from a checkout, not only
    # spark-submit --py-files
    import os
    import sys
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)

    from pyspark.sql import SparkSession

    from mc2skos_spark.plans.pipeline import KgPipeline
    from mc2skos_spark.sinks.serializers import write_turtle

    spark = SparkSession.builder.appName("mc2skos-kg-pipeline").getOrCreate()
    # executors must import the package even without --py-files (e.g.
    # `python jobs/run_pipeline.py` from a checkout: the driver sees it
    # via sys.path, local-mode Python WORKERS do not)
    from mc2skos_spark.plans.shiplib import ensure_shipped
    ensure_shipped(spark)

    if args.synth:
        from mc2skos_spark.sources.synth import transcripts_dataframe
        transcripts = transcripts_dataframe(spark, args.synth)
    else:
        transcripts = spark.read.parquet(args.input)

    options = {
        "include_webdewey": args.webdewey,
        "include_altlabels": args.altlabels,
        "include_components": args.components,
        "exclude_notes": args.exclude_notes,
        "skip_classification": args.skip_classification,
        "skip_authority": args.skip_authority,
    }
    pipeline = KgPipeline(spark, args.warehouse, options=options,
                          default_scheme=args.scheme, expand=args.expand,
                          transitive=args.transitive,
                          canonicalize=not args.no_canonicalize,
                          block_size=args.block_size,
                          validate=args.validate,
                          max_ident_freq=args.max_ident_freq,
                          force=args.force)
    triples = pipeline.run(transcripts)
    if args.turtle_out:
        write_turtle(triples, args.turtle_out)

    print(json.dumps({
        "triples": triples.count(),
        "stages": ["%s:%s" % (stage, how)
                   for stage, how in pipeline.stage_log],
        "warehouse": args.warehouse,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
