"""Scale-path operators: two-phase (salted) reassembly, bucketed
co-located joins, lineage introspection."""

import pytest
from pyspark.sql import functions as F

from mc2skos_spark.plans import schemas
from mc2skos_spark.plans.pipeline import KgPipeline
from mc2skos_spark.sinks.bucketed import subject_join, write_bucketed_triples
from mc2skos_spark.sources.synth import make_transcript_rows, synth_marc_records
from mc2skos_spark.sources.transcripts import reassemble_records

pytestmark = pytest.mark.spark


def test_two_phase_reassembly_equals_single_phase(spark):
    records = synth_marc_records(80, seed=51)
    rows = make_transcript_rows(records, seed=52, skew_factor=30,
                                max_chunks=8)
    df = spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)
    single = {(r["record_id"], r["record_xml"])
              for r in reassemble_records(df).collect()}
    for block in (1, 2, 7, 1024):
        two = {(r["record_id"], r["record_xml"])
               for r in reassemble_records(df, block_size=block).collect()}
        assert two == single, "block_size=%d diverged" % block


def test_bucketed_subject_join_has_no_exchange(spark, tmp_path):
    rows = make_transcript_rows(synth_marc_records(40, seed=61), seed=62)
    df = spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)
    pipe = KgPipeline(spark, str(tmp_path / "wh"), canonicalize=False)
    triples = pipe.run(df)

    spark.sql("DROP TABLE IF EXISTS triples_bucketed")
    write_bucketed_triples(triples, "triples_bucketed", num_buckets=4,
                           path=str(tmp_path / "tables" / "tb"))
    # disable auto-broadcast: at test scale the planner would broadcast
    # (fine too) — the point here is proving the bucketed SMJ path needs
    # NO shuffle at 100 TB where neither side broadcasts
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = subject_join(
            spark, "triples_bucketed",
            ["http://www.w3.org/2004/02/skos/core#prefLabel"],
            ["http://www.w3.org/2004/02/skos/core#notation"])
        assert joined.count() > 0  # execute so AQE finalizes the plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_published_triples_partition_pruning(spark, tmp_path):
    rows = make_transcript_rows(synth_marc_records(40, seed=81), seed=82)
    df = spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)
    pipe = KgPipeline(spark, str(tmp_path / "wh"), canonicalize=False)
    pipe.run(df)
    published = pipe.catalog.read("triples")
    broader = published.filter(
        F.col("pred_key") == "skos_broader").select("subj", "obj")
    assert broader.count() > 0  # finalize AQE
    plan = broader._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(pred_key" in plan, plan


def test_lineage_dataframe(spark, tmp_path):
    rows = make_transcript_rows(synth_marc_records(30, seed=71), seed=72)
    df = spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)
    pipe = KgPipeline(spark, str(tmp_path / "wh"))
    pipe.run(df)
    lineage = pipe.catalog.lineage()
    stages = {r["stage"] for r in lineage.collect()}
    # quarantine is empty for all-valid input → it has a manifest but no
    # lineage partitions
    assert {"records", "extracted", "triples_raw"} <= stages
    totals = {r["stage"]: r["total"] for r in
              lineage.groupBy("stage")
              .agg(F.sum("row_count").alias("total")).collect()}
    assert totals["records"] > 0
    assert totals["triples_raw"] > totals["records"]
