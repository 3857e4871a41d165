"""Pipeline orchestration: checkpointing, lineage rows, and
kill/rerun idempotence (BASELINE.md resume row)."""

import pytest

from mc2skos_spark.plans import schemas
from mc2skos_spark.plans.pipeline import KgPipeline
from mc2skos_spark.sources.synth import make_transcript_rows, synth_marc_records

pytestmark = pytest.mark.spark


def triple_set(df):
    return {(r["subj"], r["pred"], r["obj"], r["obj_lang"],
             r["obj_datatype"], r["component_pos"]) for r in df.collect()}


@pytest.fixture()
def transcripts(spark):
    rows = make_transcript_rows(synth_marc_records(60, seed=21), seed=22)
    return spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)


def test_pipeline_end_to_end_with_lineage(spark, transcripts, tmp_path):
    pipe = KgPipeline(spark, str(tmp_path / "wh"), expand=True)
    triples = pipe.run(transcripts)
    assert triples.count() > 200
    assert [s for s, how in pipe.stage_log if how == "ran"] == [
        "records", "extracted", "triples_raw", "quarantine", "warnings",
        "triples_canonical", "triples_expanded", "triples"]
    manifest = pipe.catalog.current_manifest("triples_raw")
    assert manifest["row_count"] > 0
    assert manifest["skew"]["max_rows"] >= manifest["skew"]["min_rows"]
    for part in manifest["lineage"]:
        assert part["row_count"] > 0 and part["input_min"] <= part["input_max"]


def test_resume_skips_committed_stages(spark, transcripts, tmp_path):
    wh = str(tmp_path / "wh")
    first = KgPipeline(spark, wh)
    baseline = triple_set(first.run(transcripts))

    second = KgPipeline(spark, wh)
    result = triple_set(second.run(transcripts))
    assert all(how == "resumed" for _, how in second.stage_log)
    assert result == baseline


def test_resume_reruns_on_config_change(spark, transcripts, tmp_path):
    """A warehouse produced under different flags must NOT be served as
    a resume: the snapshots reflect the OLD configuration (a rerun with
    --expand would otherwise print 'resumed' and return unexpanded
    triples)."""
    wh = str(tmp_path / "wh")
    plain = KgPipeline(spark, wh)
    base = triple_set(plain.run(transcripts))

    expanded = KgPipeline(spark, wh, expand=True)
    result = triple_set(expanded.run(transcripts))
    ran = {stage for stage, how in expanded.stage_log if how == "ran"}
    assert "triples_expanded" in ran and "triples" in ran
    assert result > base  # inverse edges actually present

    forced = KgPipeline(spark, wh, expand=True, force=True)
    forced.run(transcripts)
    assert all(how == "ran" for _, how in forced.stage_log)


def test_kill_between_write_and_commit_is_idempotent(spark, transcripts,
                                                     tmp_path):
    wh = str(tmp_path / "wh")
    first = KgPipeline(spark, wh)
    baseline = triple_set(first.run(transcripts))

    # Simulate dying after stage-2 data write but before manifest commit:
    # downstream stages also lose their commits (they were never reached
    # in the simulated run).
    for stage in ("triples_raw", "quarantine", "warnings",
                  "triples_canonical", "triples"):
        first.catalog.invalidate(stage)

    second = KgPipeline(spark, wh)
    result = triple_set(second.run(transcripts))
    log = dict(second.stage_log)
    assert log["records"] == "resumed"
    assert log["extracted"] == "resumed"
    assert log["triples_raw"] == "ran"
    assert result == baseline
