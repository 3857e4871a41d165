#!/usr/bin/env python
"""spark-submit entry point for the persisted MinHash dedup index.

The production dedup loop at 100 TB: build the index once over the
corpus, then feed each arriving batch (or a document stream) against it
— only the batch is ever signed, the corpus side is a parquet scan of
the committed banded buckets, and commits append only the batch's
files (functions/incremental.py, streaming/dedup_stream.py).

    # one-time: sign the corpus and commit the index tables
    spark-submit --py-files mc2skos_spark.zip jobs/dedup_index.py \\
        create --input corpus.parquet --warehouse /wh --name docs_minhash

    # per batch: near-dup pairs vs everything ingested so far,
    # then the batch joins the index
    spark-submit ... jobs/dedup_index.py ingest --input batch.parquet \\
        --warehouse /wh --name docs_minhash --pairs-out /out/pairs

    # continuous: Structured Streaming over a landing directory
    spark-submit ... jobs/dedup_index.py stream --input /landing \\
        --warehouse /wh --checkpoint /ckpt --name docs_minhash

    # periodic maintenance: compact append-per-batch small files and
    # expire unreferenced snapshots across the index's tables
    spark-submit ... jobs/dedup_index.py maintain \\
        --warehouse /wh --name docs_minhash [--rows-per-file N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Persisted MinHash dedup index: create / ingest / "
                    "stream")
    parser.add_argument("mode",
                        choices=["create", "ingest", "stream", "maintain"])
    parser.add_argument("--input", default=None,
                        help="documents parquet path (stream: directory; "
                             "unused by maintain)")
    parser.add_argument("--warehouse", required=True,
                        help="Icebergish catalog root")
    parser.add_argument("--name", default="docs_minhash")
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--n", type=int, default=3,
                        help="shingle width (create only; ingest reads "
                             "the committed params)")
    parser.add_argument("--num-hashes", type=int, default=32)
    parser.add_argument("--bands", type=int, default=8)
    parser.add_argument("--threshold", type=float, default=0.9)
    parser.add_argument("--pairs-out", default=None,
                        help="ingest: also write the pair result as "
                             "parquet here")
    parser.add_argument("--no-commit", action="store_true",
                        help="ingest: report pairs without appending "
                             "the batch to the index (dry run)")
    parser.add_argument("--batch-id", type=int, default=None,
                        help="ingest: monotonically increasing batch "
                             "number; makes the commit replay-safe — "
                             "a retried ingest of an already-committed "
                             "batch id skips the append instead of "
                             "double-ingesting the signatures")
    parser.add_argument("--checkpoint", default=None,
                        help="stream: checkpoint directory (required)")
    parser.add_argument("--assign-keepers", action="store_true",
                        help="ingest/stream: also maintain the "
                             "append-only keeper/remap cluster state "
                             "(the dedup DECISION, not just pair "
                             "detection)")
    parser.add_argument("--rows-per-file", type=int, default=4_000_000,
                        help="maintain: compaction file budget — "
                             "ceil(rows / rows-per-file) files per table")
    parser.add_argument("--keep-snapshots", type=int, default=1,
                        help="maintain: manifests to retain per table "
                             "after compaction")
    parser.add_argument("--max-files", type=int, default=None,
                        help="maintain: compact a table only when its "
                             "current snapshot holds MORE than this "
                             "many data files (manifest-stat policy; "
                             "omit both policy flags for an "
                             "unconditional sweep)")
    parser.add_argument("--min-rows-per-file", type=int, default=None,
                        help="maintain: compact a table only when its "
                             "MEDIAN data file holds fewer rows than "
                             "this (manifest-stat policy)")
    parser.add_argument("--expire-older-than", type=float, default=None,
                        help="maintain: additionally retain any "
                             "manifest committed at or after this "
                             "epoch-seconds timestamp (age-based "
                             "expiry, Iceberg older_than semantics)")
    args = parser.parse_args()
    if args.mode != "maintain" and not args.input:
        parser.error("--input is required for create/ingest/stream")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        "mc2skos-dedup-%s" % args.mode).getOrCreate()
    from mc2skos_spark.plans.shiplib import ensure_shipped
    ensure_shipped(spark)
    from mc2skos_spark.functions.incremental import (
        BUCKET_SUFFIX, SIG_SUFFIX, create_minhash_index,
        incremental_minhash_pairs)
    from mc2skos_spark.sinks.icebergish import IcebergishCatalog

    catalog = IcebergishCatalog(args.warehouse, spark)
    stats: dict = {"mode": args.mode, "name": args.name,
                   "warehouse": args.warehouse}

    if args.mode == "create":
        manifest = create_minhash_index(
            catalog, args.name, spark.read.parquet(args.input),
            args.id_col, args.text_col, n=args.n,
            num_hashes=args.num_hashes, bands=args.bands)
        stats["indexed_docs"] = catalog.current_manifest(
            args.name + SIG_SUFFIX)["row_count"]
        stats["bucket_rows"] = manifest["row_count"]
        stats["params"] = {k: v for k, v in manifest["properties"].items()
                           if k.startswith("minhash_")}
    elif args.mode == "ingest":
        if args.assign_keepers:
            from mc2skos_spark.functions.incremental import (
                incremental_keeper_assign)
            assign = incremental_keeper_assign(
                catalog, args.name, spark.read.parquet(args.input),
                args.id_col, args.text_col, threshold=args.threshold,
                commit=not args.no_commit, batch_id=args.batch_id)
            stats["batch_docs"] = assign.count()
            stats["batch_dups"] = assign.filter(
                "id != keeper_id").count()
        else:
            pairs = incremental_minhash_pairs(
                catalog, args.name, spark.read.parquet(args.input),
                args.id_col, args.text_col, threshold=args.threshold,
                commit=not args.no_commit, batch_id=args.batch_id)
            if args.pairs_out:
                pairs.write.mode("overwrite").parquet(args.pairs_out)
                pairs = spark.read.parquet(args.pairs_out)
                stats["pairs_out"] = args.pairs_out
            stats["pairs"] = pairs.count()
        stats["committed"] = not args.no_commit
        stats["index_rows"] = catalog.current_manifest(
            args.name + BUCKET_SUFFIX)["row_count"]
    elif args.mode == "maintain":
        # compaction + snapshot expiry over every table of this index
        # (signatures, buckets, keeper/remap state, streamed pair
        # snapshots): the cure for append-per-batch small-file buildup.
        # catalog.maintain checks row counts unchanged BEFORE expiry
        # drops the old manifests (an explicit raise, not `assert`),
        # and with --max-files / --min-rows-per-file it compacts only
        # the tables whose manifest stats trip the policy.
        stats["tables"] = {}
        for table in catalog.tables(prefix=args.name):
            stats["tables"][table] = catalog.maintain(
                table, max_files=args.max_files,
                min_rows_per_file=args.min_rows_per_file,
                keep_last=args.keep_snapshots,
                older_than=args.expire_older_than,
                rows_per_file=args.rows_per_file)
    else:  # stream
        if not args.checkpoint:
            parser.error("stream mode requires --checkpoint")
        from mc2skos_spark.streaming.dedup_stream import (stream_documents,
                                                          streamed_pairs)
        stream_documents(
            spark, args.input, args.warehouse, args.checkpoint,
            schema="%s long, %s string" % (args.id_col, args.text_col),
            name=args.name, id_col=args.id_col, text_col=args.text_col,
            threshold=args.threshold, n=args.n,
            num_hashes=args.num_hashes, bands=args.bands,
            assign_keepers=args.assign_keepers)
        try:
            stats["pairs"] = streamed_pairs(spark, args.warehouse).count()
        except FileNotFoundError:
            stats["pairs"] = 0  # legitimate empty run: zero batches
        buckets = catalog.current_manifest(args.name + BUCKET_SUFFIX)
        stats["index_rows"] = buckets["row_count"] if buckets else 0

    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
