"""As-of and interval joins: hand vectors (mirroring a DuckDB ASOF
probe), tie/tolerance/direction semantics, pair uniqueness across
buckets, and plan shape (no nested-loop / cartesian anywhere)."""

import pytest
from pyspark.sql import functions as F

from mc2skos_spark.operators.temporal import asof_join, interval_join

pytestmark = pytest.mark.spark


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 7)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (1, 2, "c"), (3, 1, "z")],
        "k long, ts long, v string")
    return left, right


def test_asof_backward_matches_duckdb_probe(spark):
    # same vectors as the DuckDB `ASOF LEFT JOIN ... l.ts >= r.ts`
    # probe: inclusive boundary, greatest match, unmatched kept
    left, right = _asof_fixture(spark)
    got = {(r["k"], r["ts"]): (r["v"], r["matched_ts"])
           for r in asof_join(left, right, ["k"], "ts", "ts",
                              ["v"]).collect()}
    assert got == {(1, 5): ("c", 2), (1, 10): ("a", 10),
                   (1, 20): ("b", 15), (2, 7): (None, None)}


def test_asof_forward(spark):
    left, right = _asof_fixture(spark)
    got = {(r["k"], r["ts"]): (r["v"], r["matched_ts"])
           for r in asof_join(left, right, ["k"], "ts", "ts", ["v"],
                              direction="forward").collect()}
    assert got == {(1, 5): ("a", 10), (1, 10): ("a", 10),
                   (1, 20): (None, None), (2, 7): (None, None)}


def test_asof_tolerance(spark):
    left, right = _asof_fixture(spark)
    got = {(r["k"], r["ts"]): r["v"]
           for r in asof_join(left, right, ["k"], "ts", "ts", ["v"],
                              tolerance_us=3).collect()}
    # (1,5)->c is 3 away (kept, inclusive); (1,20)->b is 5 away (cut)
    assert got == {(1, 5): "c", (1, 10): "a", (1, 20): None,
                   (2, 7): None}


def test_asof_right_ties_break_deterministically(spark):
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 7, "lo"), (1, 10, 9, "hi"), (1, 10, 8, "mid")],
        "k long, ts long, seq long, v string")
    got = asof_join(left, right, ["k"], "ts", "ts", ["v"],
                    right_tiebreak="seq").collect()
    assert [(r["v"]) for r in got] == ["hi"]
    fwd = asof_join(left, right, ["k"], "ts", "ts", ["v"],
                    direction="forward", right_tiebreak="seq").collect()
    assert [(r["v"]) for r in fwd] == ["hi"]


def test_asof_null_right_keys_never_match(spark):
    left = spark.createDataFrame([(None, 10), (1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(None, 5, "n"), (1, None, "t"), (1, 4, "ok")],
        "k long, ts long, v string")
    got = {r["k"]: r["v"]
           for r in asof_join(left, right, ["k"], "ts", "ts",
                              ["v"]).collect()}
    assert got == {None: None, 1: "ok"}


def test_asof_output_name_clash_rejected(spark):
    left, right = _asof_fixture(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("v", F.lit(1)), right,
                  ["k"], "ts", "ts", ["v"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("matched_ts", F.lit(1)),
                  right, ["k"], "ts", "ts", ["v"])


def _ivl(spark, rows, side):
    return spark.createDataFrame(
        rows, "%sid long, k long, %ss long, %se long" % (side, side, side))


def test_interval_join_hand_vectors(spark):
    # [0,10] overlaps [10,20] (inclusive touch); [0,10] vs [11,30] no
    left = _ivl(spark, [(1, 1, 0, 10), (2, 1, 40, 45), (3, 2, 0, 100)],
                "l")
    right = _ivl(spark, [(10, 1, 10, 20), (11, 1, 11, 30),
                         (12, 1, 44, 44), (13, 9, 0, 100)], "r")
    got = {(r["lid"], r["rid"])
           for r in interval_join(left, right, ["k"], "ls", "le",
                                  "rs", "re", bucket_width=7).collect()}
    assert got == {(1, 10), (2, 12)}


def test_interval_join_exactly_once_across_buckets(spark):
    # long intervals span many buckets; the greatest-start anchor must
    # emit each overlapping pair exactly once
    left = _ivl(spark, [(1, 1, 0, 1000)], "l")
    right = _ivl(spark, [(10, 1, 500, 2000), (11, 1, -50, 3)], "r")
    rows = interval_join(left, right, ["k"], "ls", "le", "rs", "re",
                         bucket_width=7).collect()
    assert sorted((r["lid"], r["rid"]) for r in rows) == [(1, 10), (1, 11)]


def test_interval_join_no_keys_pure_range(spark):
    left = _ivl(spark, [(1, 1, 0, 5), (2, 2, 100, 105)], "l")
    right = _ivl(spark, [(10, 9, 4, 6), (11, 9, 50, 60)], "r").drop("k")
    got = {(r["lid"], r["rid"])
           for r in interval_join(left, right, [], "ls", "le",
                                  "rs", "re", bucket_width=10).collect()}
    assert got == {(1, 10)}


def test_interval_join_negative_coordinates(spark):
    # floor-division bucketing must stay consistent below zero
    left = _ivl(spark, [(1, 1, -25, -10)], "l")
    right = _ivl(spark, [(10, 1, -12, -11), (11, 1, -9, 0)], "r")
    got = {(r["lid"], r["rid"])
           for r in interval_join(left, right, ["k"], "ls", "le",
                                  "rs", "re", bucket_width=7).collect()}
    assert got == {(1, 10)}


def test_plans_never_nested_loop(spark):
    left, right = _asof_fixture(spark)
    aj = asof_join(left, right, ["k"], "ts", "ts", ["v"])
    l2 = _ivl(spark, [(1, 1, 0, 10)], "l")
    r2 = _ivl(spark, [(10, 1, 5, 6)], "r")
    ij = interval_join(l2, r2, ["k"], "ls", "le", "rs", "re", 7)
    for df in (aj, ij):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
