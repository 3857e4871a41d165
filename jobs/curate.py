#!/usr/bin/env python
"""spark-submit entry point for end-to-end training-corpus curation.

Ties the training-data operator family into one deployable pipeline
over a documents table ``(doc_id, text, ...)``:

    profile (tokens / quality / language / repetition)
      → quality + repetition filter
      → Gopher rule bundle                      (--gopher)
      → unigram-LM perplexity filter            (--max-avg-nll [--lm])
      → DSIR importance-weight filter           (--dsir-target)
      → fastText-style classifier gate          (--classifier-gate)
      → benchmark-contamination filter          (--benchmark)
      → PII redaction                           (--scrub-pii)
      → repeated-substring excision             (--scrub-spans W,D)
      → repeated-passage removal                (--paragraph-dedup N)
      → exact dedup (deterministic min-id keeper)
      → MinHash-LSH near-dup dedup (union-find keepers)
      → deterministic stratified sampling       (--sample-rates)
      → sequence packing (distributed prefix sum)
      → curated parquet + one JSON stats line

Cluster deployment:

    zip -r mc2skos_spark.zip mc2skos_spark
    spark-submit --master <cluster> --py-files mc2skos_spark.zip \\
        jobs/curate.py --input docs.parquet --output <dir> \\
        [--benchmark bench.parquet] [--min-quality 0.2]
        [--max-top-bigram 0.5] [--scrub-pii] [--scrub-spans 8,2]
        [--paragraph-dedup 16]
        [--max-avg-nll 9.0 [--lm unigram.parquet]]
        [--dsir-target en [--dsir-min-logw 0]]
        [--classifier-gate weights.json] [--gopher]
        [--sample-rates en=1.0,es=0.5] [--default-rate 1.0]
        [--capacity 2048] [--jaccard 0.8]

Every decision is deterministic (hash-of-id sampling, min-id keepers),
so reruns produce byte-identical corpora.
"""

from __future__ import annotations

import argparse
import json


def parse_rates(spec: str) -> dict[str, float]:
    """``en=1.0,es=0.5`` → dict; fails fast (before the JVM does any
    work) on malformed parts or rates outside [0, 1]."""
    out: dict[str, float] = {}
    if not spec:
        return out
    for part in spec.split(","):
        key, eq, val = part.partition("=")
        try:
            rate = float(val)
        except ValueError:
            rate = -1.0
        if not key.strip() or not eq or not 0.0 <= rate <= 1.0:
            raise argparse.ArgumentTypeError(
                "--sample-rates part %r: expected <stratum>=<rate in "
                "[0,1]>" % part)
        out[key.strip()] = rate
    return out


def main() -> None:
    parser = argparse.ArgumentParser(
        description="training-corpus curation over a documents table")
    parser.add_argument("--input", required=True,
                        help="documents table (doc_id, text, ...)")
    parser.add_argument("--format", default="parquet",
                        choices=["parquet", "jsonl", "csv"],
                        help="input format (training corpora commonly "
                             "ship as JSONL; schema is enforced, not "
                             "inferred, so malformed rows fail loudly)")
    parser.add_argument("--output", required=True,
                        help="output dir (corpus parquet inside)")
    parser.add_argument("--benchmark", default=None,
                        help="benchmark parquet; overlapping docs are "
                             "dropped (n-gram contamination check)")
    parser.add_argument("--min-quality", type=float, default=0.0)
    parser.add_argument("--max-top-bigram", type=float, default=1.0,
                        help="drop docs whose most frequent bigram "
                             "exceeds this fraction (Gopher filter)")
    parser.add_argument("--scrub-pii", action="store_true")
    parser.add_argument("--scrub-spans", default=None,
                        metavar="WINDOW,MIN_DOCS",
                        help="excise exact repeated substrings (Lee et "
                             "al.): every WINDOW-token sliding window "
                             "appearing in >= MIN_DOCS distinct docs is "
                             "removed from the text (maximal merged "
                             "spans) before dedup/packing")
    parser.add_argument("--paragraph-dedup", type=int, default=None,
                        metavar="TOKENS",
                        help="MassiveText repeated-passage removal: "
                             "chunk docs into TOKENS-token paragraphs, "
                             "keep each distinct paragraph's first "
                             "(doc_id, position) occurrence corpus-"
                             "wide, rebuild docs from survivors; docs "
                             "losing every paragraph are dropped")
    parser.add_argument("--max-avg-nll", type=float, default=None,
                        help="drop docs whose per-token unigram-LM NLL "
                             "exceeds this (nats; CCNet-style filter). "
                             "Docs with no tokens are dropped too.")
    parser.add_argument("--lm", default=None,
                        help="precomputed (token, cnt) parquet for "
                             "--max-avg-nll; default: self-trained on "
                             "the gated corpus")
    parser.add_argument("--dsir-target", default=None, metavar="LANG",
                        help="DSIR-weight docs toward the slice whose "
                             "lang_guess equals LANG and keep those "
                             "with logw_q >= --dsir-min-logw")
    parser.add_argument("--dsir-min-logw", type=int, default=0,
                        help="DSIR keep threshold on the exact integer "
                             "log-weight (default 0 = more target-like "
                             "than the pool)")
    parser.add_argument("--classifier-gate", default=None,
                        metavar="WEIGHTS_JSON",
                        help="fastText-style quality gate: JSON weight "
                             "table written by functions/classifier.py "
                             "save_classifier (train_quality_classifier "
                             "output); keeps docs whose integer logit "
                             ">= 0.  Scoring is a broadcast weight-dim "
                             "join — no model server.  Docs with no "
                             "tokens are dropped (no features, no "
                             "evidence).")
    parser.add_argument("--gopher", action="store_true",
                        help="apply the full Gopher rule bundle (Rae "
                             "et al. 2021 A1.1: word count, mean word "
                             "length, symbol/bullet/ellipsis ratios, "
                             "alpha-word fraction, stopword presence) "
                             "as a gate stage — one codegen filter, "
                             "no shuffle")
    parser.add_argument("--jaccard", type=float, default=0.8,
                        help="near-dup threshold (estimated Jaccard)")
    parser.add_argument("--num-hashes", type=int, default=32)
    parser.add_argument("--bands", type=int, default=8)
    parser.add_argument("--sample-rates", type=parse_rates, default={},
                        help="per-language keep rates, e.g. en=1.0,es=0.5")
    parser.add_argument("--default-rate", type=float, default=1.0)
    parser.add_argument("--capacity", type=int, default=2048,
                        help="tokens per packed training sequence")
    args = parser.parse_args()

    import os
    import sys
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)

    from pyspark.sql import SparkSession, functions as F

    from mc2skos_spark.functions.contamination import \
        benchmark_contamination
    from mc2skos_spark.functions.dedup import (minhash_lsh_candidates,
                                               minhash_signatures,
                                               minhash_similarity,
                                               near_dup_keepers,
                                               validate_lsh_params)
    from mc2skos_spark.functions.packing import pack_sequences
    from mc2skos_spark.functions.pii import scrub_pii
    from mc2skos_spark.functions.sampling import stratified_sample
    from mc2skos_spark.functions.textstats import profile_and_gate

    try:
        validate_lsh_params(args.num_hashes, args.bands)
    except ValueError as exc:
        parser.error(str(exc))

    spark = SparkSession.builder.appName("mc2skos-curate").getOrCreate()
    from mc2skos_spark.plans.shiplib import ensure_shipped
    ensure_shipped(spark)

    stats: dict[str, int] = {}
    schema = "doc_id long, text string"
    if args.format == "jsonl":
        docs = spark.read.schema(schema).json(args.input)
    elif args.format == "csv":
        docs = spark.read.schema(schema).option("header", "true") \
            .csv(args.input)
    else:
        docs = spark.read.parquet(args.input)
    docs = docs.select("doc_id", "text")
    stats["input"] = docs.count()

    # Lineage discipline: every counted stage is also consumed by the
    # next stage (and several stages read `kept` 2-3 times internally:
    # contamination explodes it AND joins back, exact dedup aggregates
    # it AND joins back).  Without a cut, each count() + each extra
    # consumer re-executes the whole pipeline prefix from the parquet
    # scan — so cut lineage after every stage (lazy localCheckpoint:
    # materialized by the following count, then every consumer reads
    # the materialized blocks).
    def cut(df):
        return df.localCheckpoint(eager=False)

    # profile ONCE (the SAME gate the streaming curator applies —
    # functions/textstats.py); downstream stages filter on the
    # profiled columns
    kept = cut(profile_and_gate(docs, args.min_quality,
                                args.max_top_bigram))
    stats["after_quality_filter"] = kept.count()

    if args.gopher:
        from mc2skos_spark.functions.textstats import gopher_gate
        kept = cut(gopher_gate(kept))
        stats["after_gopher_gate"] = kept.count()

    if args.max_avg_nll is not None:
        from mc2skos_spark.functions.lm import lm_nll_scores
        lm = spark.read.parquet(args.lm) if args.lm else None
        ok = (lm_nll_scores(kept, lm=lm)
              .filter(F.col("avg_nll") <= args.max_avg_nll)
              .select("doc_id"))
        kept = cut(kept.join(ok, "doc_id"))
        stats["after_lm_filter"] = kept.count()

    if args.dsir_target:
        from mc2skos_spark.functions.dsir import dsir_logweights
        ok = (dsir_logweights(kept,
                              F.col("lang_guess") == args.dsir_target)
              .filter(F.col("logw_q") >= args.dsir_min_logw)
              .select("doc_id"))
        kept = cut(kept.join(ok, "doc_id"))
        stats["after_dsir_filter"] = kept.count()

    if args.classifier_gate:
        from mc2skos_spark.functions.classifier import (linear_text_scores,
                                                        load_classifier)
        model = load_classifier(args.classifier_gate)
        ok = (linear_text_scores(kept, **model)
              .filter(F.col("keep")).select("doc_id"))
        kept = cut(kept.join(ok, "doc_id"))
        stats["after_classifier_gate"] = kept.count()

    if args.benchmark:
        bench = spark.read.parquet(args.benchmark).select("doc_id", "text")
        flags = benchmark_contamination(kept, bench)
        kept = cut(kept.join(flags.filter(~F.col("contaminated"))
                             .select("doc_id"), "doc_id"))
        stats["after_contamination_filter"] = kept.count()

    if args.scrub_pii:
        # cut: the next stage consumes kept twice (aggregate + join
        # back) and the minhash signing a third time — without the cut
        # the 3-pattern regexp scrub would re-run per consumer
        kept = cut(kept.withColumn("text", scrub_pii(F.col("text"))))

    if args.scrub_spans:
        from mc2skos_spark.functions.dedup import scrub_substring_spans
        try:
            window, min_docs = (int(x) for x in
                                args.scrub_spans.split(","))
        except ValueError:
            parser.error("--scrub-spans expects WINDOW,MIN_DOCS ints")
        from mc2skos_spark.functions.textstats import token_count
        before_tokens = kept.agg(F.sum("n_tokens")).collect()[0][0]
        # the profiled n_tokens column is REFRESHED after surgery —
        # packing reads it, and a stale count would mis-place every
        # sequence boundary downstream of a scrubbed doc
        kept = cut(scrub_substring_spans(kept, window=window,
                                         min_docs=min_docs)
                   .withColumn("n_tokens", token_count(F.col("text"))))
        after_tokens = kept.agg(F.sum("n_tokens")).collect()[0][0]
        stats["span_tokens_removed"] = int((before_tokens or 0)
                                           - (after_tokens or 0))

    if args.paragraph_dedup:
        from mc2skos_spark.functions.dedup import paragraph_dedup
        from mc2skos_spark.functions.textstats import token_count
        survivors = (paragraph_dedup(kept, args.paragraph_dedup)
                     .filter(F.col("n_kept") > 0)
                     .select("doc_id",
                             F.col("kept_text").alias("text")))
        # n_tokens refreshed for the same reason as --scrub-spans:
        # packing reads it
        kept = cut(kept.drop("text").join(survivors, "doc_id")
                   .withColumn("n_tokens", token_count(F.col("text"))))
        stats["after_paragraph_dedup"] = kept.count()

    # exact dedup: deterministic min-id keeper per identical text —
    # grouped by sha2-256 digest so the shuffle moves 32 bytes/doc,
    # not the document (same keepers; see functions/dedup.py)
    exact_keepers = (kept.groupBy(F.sha2(F.col("text"), 256))
                     .agg(F.min("doc_id").alias("doc_id"))
                     .select("doc_id"))
    kept = cut(kept.join(exact_keepers, "doc_id"))
    stats["after_exact_dedup"] = kept.count()

    # near-dup dedup: MinHash-LSH candidates → estimated-Jaccard filter
    # → union-find keepers; only id == keeper_id rows survive
    sigs = minhash_signatures(kept, "doc_id", "text",
                              num_hashes=args.num_hashes)
    sigs = sigs.localCheckpoint(eager=False)   # feeds candidates + sim
    pairs = (minhash_similarity(sigs, minhash_lsh_candidates(
                 sigs, bands=args.bands))
             .filter(F.col("est_jaccard") >= args.jaccard)
             .select("id_a", "id_b"))
    keepers = near_dup_keepers(kept, pairs, id_col="doc_id")
    kept = cut(kept.join(keepers.filter(F.col("id") == F.col("keeper_id"))
                         .select(F.col("id").alias("doc_id")), "doc_id"))
    stats["after_near_dedup"] = kept.count()

    if args.sample_rates or args.default_rate < 1.0:
        kept = cut(stratified_sample(kept, "lang_guess", args.sample_rates,
                                     default_rate=args.default_rate))
        stats["after_sampling"] = kept.count()

    packed = pack_sequences(kept, capacity=args.capacity)
    out_path = os.path.join(args.output, "corpus")
    packed.write.mode("overwrite").parquet(out_path)

    final = spark.read.parquet(out_path)
    agg = final.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("n_tokens").alias("tok")).collect()[0]
    stats["output"] = agg["n"]
    # the trainer cuts ceil(total_tokens / capacity) sequences from the
    # concatenated stream (max(seq_id)+1 would undercount whenever the
    # tail documents span capacity boundaries)
    total_tokens = int(agg["tok"] or 0)
    print(json.dumps({
        "stats": stats,
        "total_tokens": total_tokens,
        "n_sequences": -(-total_tokens // args.capacity),
        "capacity": args.capacity,
        "output": out_path,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
