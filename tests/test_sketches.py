"""Approximate (sketch-backed) aggregates, verified within their error
bounds against the exact aggregates on the same data.

These are the 100 TB workhorses — `approx_count_distinct` (HyperLogLog++,
fixed-size sketch, map-side mergeable: no shuffle of distinct values at
all) and `percentile_approx` (KLL-style quantile sketch) — where the
exact forms (`count_distinct`, `percentile`) shuffle every distinct
value / sort every group.  They cannot be DuckDB-hash-verified (engine-
specific sketches), so the driver gate carries the EXACT forms
(`pt_lang_token_stats`, `t2`-family distincts) and this test pins the
approximate forms to their documented error envelopes on the same
driver testdata — relative error ≤ rsd for HLL++, rank error ≤ 1/acc
for the quantile sketch.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_approx_count_distinct_within_rsd(spark, events):
    # HLL++ with rsd=0.02: |approx - exact| / exact well inside a few
    # standard deviations (use 5x slack — the bound is probabilistic,
    # the data is fixed, so this is deterministic for a given build)
    row = events.agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    rel = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel <= 0.10, (row["exact"], row["approx"], rel)


def test_approx_count_distinct_grouped_merges(spark, events):
    # per-group sketches must merge consistently: the union sketch over
    # all groups can't report fewer than the largest group
    per = {r["event_type"]: r["a"] for r in events.groupBy("event_type")
           .agg(F.approx_count_distinct("user_id", 0.02).alias("a"))
           .collect()}
    total = events.agg(
        F.approx_count_distinct("user_id", 0.02).alias("a")).first()["a"]
    assert total >= max(per.values()) * 0.9
    exact = {r["event_type"]: r["e"] for r in events.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("e")).collect()}
    for k, e in exact.items():
        assert abs(per[k] - e) / e <= 0.10, (k, e, per[k])


def test_percentile_approx_rank_error(spark, docs):
    # percentile_approx(accuracy=acc) guarantees rank error <= 1/acc;
    # verify the approximate median/p90 of n_chars lands within the
    # exact value band implied by that rank window
    acc = 1000
    n = docs.count()
    row = docs.agg(
        F.percentile_approx("n_chars", F.lit([0.5, 0.9]), F.lit(acc))
        .alias("ap")).first()
    vals = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    for q, got in zip([0.5, 0.9], row["ap"]):
        lo = vals[max(0, int((q - 1.0 / acc) * n) - 1)]
        hi = vals[min(n - 1, int((q + 1.0 / acc) * n) + 1)]
        assert lo <= got <= hi, (q, got, lo, hi)
