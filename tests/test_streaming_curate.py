"""Streaming curation (streaming/curate_stream.py): per-micro-batch
quality gate + PII scrub + persisted-index keeper dedup; the curated
corpus reflects cross-batch dedup decisions and replays are no-ops."""

import pytest
from pyspark.sql import functions as F

from mc2skos_spark.functions.incremental import SIG_SUFFIX
from mc2skos_spark.sinks.icebergish import IcebergishCatalog
from mc2skos_spark.streaming.curate_stream import (StreamingCurator,
                                                   curated_corpus,
                                                   stream_curate)

pytestmark = pytest.mark.spark

PARAMS = dict(n=2, num_hashes=16, bands=4)

B1 = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (4, "spam spam spam spam spam spam"),                 # repetition junk
    (6, "contact alice@example.org about the quarterly report"),  # PII
]
B2 = [
    (11, "alpha beta gamma delta epsilon zeta"),          # dup of 1
    (12, "entirely new subject matter discussed here"),
]


def test_stream_curate_end_to_end(spark, tmp_path):
    src = tmp_path / "docs_in"
    spark.createDataFrame(B1, "doc_id long, text string") \
        .coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(B2, "doc_id long, text string") \
        .coalesce(1).write.parquet(str(src / "f2"))
    wh = str(tmp_path / "wh")
    stream_curate(spark, str(src) + "/*", wh, str(tmp_path / "ckpt"),
                  max_top_bigram=0.5, threshold=0.9, **PARAMS)

    rows = curated_corpus(spark, wh).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # junk dropped by the gate; the cross-batch dup evicted by keeper
    assert set(by_id) == {1, 6, 12}
    assert "[EMAIL]" in by_id[6]["text"]
    assert "alice@example.org" not in by_id[6]["text"]
    # profile columns travel with the curated rows
    assert by_id[1]["n_tokens"] == 6
    assert 0.0 <= by_id[12]["quality"] <= 1.0
    # the junk doc never reached the dedup index
    cat = IcebergishCatalog(wh, spark)
    indexed = {r["id"] for r in
               cat.read("docs_minhash" + SIG_SUFFIX).collect()}
    assert indexed == {1, 6, 11, 12}


def test_stream_curate_checkpoint_reset_preserves_snapshots(spark,
                                                            tmp_path):
    """Regression: the replay/mismatch guard must run BEFORE the
    curated snapshot commit — a checkpoint reset (fresh batch ids
    against an old warehouse) must raise WITHOUT clobbering the
    original batch's committed curated rows."""
    wh = str(tmp_path / "wh")
    curator = StreamingCurator(wh, max_top_bigram=0.5, threshold=0.9,
                               **PARAMS)
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    b2 = spark.createDataFrame(B2, "doc_id long, text string")
    curator.process_batch(b1, 0)
    curator.process_batch(b2, 1)
    before = {tuple(r) for r in curated_corpus(spark, wh).collect()}
    fresh = spark.createDataFrame(
        [(99, "never seen fresh document text here")],
        "doc_id long, text string")
    with pytest.raises(RuntimeError, match="checkpoint/warehouse"):
        curator.process_batch(fresh, 0)
    assert {tuple(r) for r in curated_corpus(spark, wh).collect()} \
        == before


def test_stream_curate_replay_is_noop(spark, tmp_path):
    wh = str(tmp_path / "wh")
    curator = StreamingCurator(wh, max_top_bigram=0.5, threshold=0.9,
                               **PARAMS)
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    b2 = spark.createDataFrame(B2, "doc_id long, text string")
    curator.process_batch(b1, 0)
    curator.process_batch(b2, 1)
    cat = IcebergishCatalog(wh, spark)
    sig_snap = cat.current_manifest("docs_minhash" + SIG_SUFFIX)
    before = {tuple(r) for r in curated_corpus(spark, wh).collect()}

    curator.process_batch(b2, 1)   # replay: identical snapshot bytes,
    assert cat.current_manifest(   # guarded state untouched
        "docs_minhash" + SIG_SUFFIX)["snapshot_id"] == \
        sig_snap["snapshot_id"]
    assert {tuple(r) for r in curated_corpus(spark, wh).collect()} \
        == before


def test_stream_curate_lm_gate_fixed_reference(spark, tmp_path):
    """The streaming LM gate scores against a FIXED reference LM (so
    replays gate identically): an in-distribution doc passes, a
    gibberish doc is dropped before it ever reaches the dedup index."""
    from mc2skos_spark.functions.lm import unigram_lm

    ref = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"),
         (1, "alpha beta gamma new subject matter"),
         (2, "entirely new subject matter discussed here")],
        "doc_id long, text string")
    lm_path = str(tmp_path / "lm")
    unigram_lm(ref).write.parquet(lm_path)

    src = tmp_path / "docs_in"
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "qqq www eee rrr ttt yyy uuu")],        # all-OOV gibberish
        "doc_id long, text string") \
        .coalesce(1).write.parquet(str(src / "f1"))

    wh = str(tmp_path / "wh")
    # threshold: total=18, V=12 → OOV tokens score -ln(1/30) ≈ 3.40;
    # in-vocab tokens (cnt >= 1) score at most -ln(2/30) ≈ 2.71
    stream_curate(spark, str(src) + "/*", wh, str(tmp_path / "ckpt"),
                  lm_path=lm_path, max_avg_nll=3.0,
                  threshold=0.9, **PARAMS)
    assert {r["doc_id"] for r in curated_corpus(spark, wh).collect()} \
        == {1}
    cat = IcebergishCatalog(wh, spark)
    assert {r["id"] for r in
            cat.read("docs_minhash" + SIG_SUFFIX).collect()} == {1}


def test_streaming_curator_lm_knobs_must_pair(tmp_path):
    with pytest.raises(ValueError):
        StreamingCurator(str(tmp_path / "wh"), lm_path="x")
    with pytest.raises(ValueError):
        StreamingCurator(str(tmp_path / "wh"), max_avg_nll=5.0)
