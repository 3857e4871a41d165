"""CDC apply: latest-snapshot (max_by aggregate) and SCD2 history
(lead window), plus the point-in-time composition with asof_join."""

import pytest
from pyspark.sql import functions as F

from mc2skos_spark.operators.cdc import latest_snapshot, scd2_history

pytestmark = pytest.mark.spark

CH = "k long, seq long, op string, v string"


def test_latest_snapshot_upserts_and_deletes(spark):
    changes = spark.createDataFrame(
        [(1, 1, "I", "a"), (1, 3, "U", "c"), (1, 2, "U", "b"),
         (2, 1, "I", "x"), (2, 2, "D", None),
         (3, 5, "D", None), (3, 9, "U", "back")], CH)
    got = {r["k"]: r["v"]
           for r in latest_snapshot(changes, ["k"], ["seq"],
                                    delete_when=F.col("op") == "D")
           .collect()}
    # k=1: seq 3 wins; k=2: latest is a delete -> gone; k=3: an
    # update AFTER the delete resurrects the key
    assert got == {1: "c", 3: "back"}


def test_latest_snapshot_composite_seq_and_no_delete(spark):
    changes = spark.createDataFrame(
        [(1, 5, "U", "late-tie"), (1, 5, "I", "zz")],
        CH)
    # composite (seq, v) order: 'zz' > 'late-tie'
    got = latest_snapshot(changes, ["k"], ["seq", "v"]).collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "zz")]


def test_scd2_history_intervals(spark):
    changes = spark.createDataFrame(
        [(1, 10, "I", "a"), (1, 30, "U", "b"), (2, 5, "I", "x")], CH)
    rows = {(r["k"], r["v"]): (r["valid_from"], r["valid_to"],
                               r["is_current"])
            for r in scd2_history(changes, ["k"], "seq").collect()}
    assert rows == {(1, "a"): (10, 30, False),
                    (1, "b"): (30, None, True),
                    (2, "x"): (5, None, True)}


def test_scd2_point_in_time_equals_asof(spark):
    # as-of lookup against the SCD2 table == asof_join on valid_from
    from mc2skos_spark.operators.temporal import asof_join
    changes = spark.createDataFrame(
        [(1, 10, "I", "a"), (1, 30, "U", "b"), (1, 50, "U", "c")], CH)
    hist = scd2_history(changes, ["k"], "seq").select(
        "k", "valid_from", F.col("v").alias("state"))
    probes = spark.createDataFrame([(1, 9), (1, 10), (1, 49), (1, 99)],
                                   "k long, at long")
    got = {r["at"]: r["state"]
           for r in asof_join(probes, hist, ["k"], "at", "valid_from",
                              ["state"]).collect()}
    assert got == {9: None, 10: "a", 49: "b", 99: "c"}


def test_latest_snapshot_plan_is_one_aggregate_no_window(spark):
    changes = spark.createDataFrame([(1, 1, "I", "a")], CH)
    snap = latest_snapshot(changes, ["k"], ["seq"])
    plan = snap._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in plan or "HashAggregate" in plan
    assert "Window" not in plan


def _read_state(spark, wh, table):
    from mc2skos_spark.sinks.icebergish import IcebergishCatalog
    cat = IcebergishCatalog(wh, spark)
    return {r["k"]: (r["seq"], r["v"]) for r in cat.read(table).collect()}


def test_merge_changes_sequential_equals_combined(spark, tmp_path):
    """Applying two batches in sequence must equal applying their
    union once (the MERGE associativity that makes resume safe)."""
    from mc2skos_spark.operators.cdc import merge_changes
    from mc2skos_spark.sinks.icebergish import IcebergishCatalog
    b1 = spark.createDataFrame(
        [(1, 1, "I", "a"), (2, 1, "I", "x"), (3, 1, "I", "m")], CH)
    b2 = spark.createDataFrame(
        [(1, 2, "U", "a2"),            # update
         (2, 3, "D", None),            # delete
         (4, 1, "I", "new")], CH)      # insert
    dw = F.col("op") == "D"

    cat_a = IcebergishCatalog(str(tmp_path / "a"), spark)
    merge_changes(cat_a, "t", b1, ["k"], ["seq"], delete_when=dw)
    merge_changes(cat_a, "t", b2, ["k"], ["seq"], delete_when=dw)
    cat_b = IcebergishCatalog(str(tmp_path / "b"), spark)
    merge_changes(cat_b, "t", b1.unionByName(b2), ["k"], ["seq"],
                  delete_when=dw)

    seq_state = _read_state(spark, str(tmp_path / "a"), "t")
    assert seq_state == _read_state(spark, str(tmp_path / "b"), "t")
    assert seq_state == {1: (2, "a2"), 3: (1, "m"), 4: (1, "new")}


def test_merge_changes_stale_change_and_replay_are_noops(spark, tmp_path):
    from mc2skos_spark.operators.cdc import merge_changes
    from mc2skos_spark.sinks.icebergish import IcebergishCatalog
    cat = IcebergishCatalog(str(tmp_path / "wh"), spark)
    dw = F.col("op") == "D"
    b1 = spark.createDataFrame([(1, 5, "U", "newer")], CH)
    merge_changes(cat, "t", b1, ["k"], ["seq"], delete_when=dw)
    # a late-arriving STALE change (seq 3 < stored 5) must not win
    stale = spark.createDataFrame([(1, 3, "U", "older")], CH)
    merge_changes(cat, "t", stale, ["k"], ["seq"], delete_when=dw)
    assert _read_state(spark, str(tmp_path / "wh"), "t") == {1: (5, "newer")}
    # replaying the ORIGINAL batch is a content no-op (manifest advances)
    before = cat.current_manifest("t")["snapshot_id"]
    merge_changes(cat, "t", b1, ["k"], ["seq"], delete_when=dw)
    assert _read_state(spark, str(tmp_path / "wh"), "t") == {1: (5, "newer")}
    assert cat.current_manifest("t")["snapshot_id"] > before


def test_merge_changes_schema_mismatch_raises(spark, tmp_path):
    from mc2skos_spark.operators.cdc import merge_changes
    from mc2skos_spark.sinks.icebergish import IcebergishCatalog
    cat = IcebergishCatalog(str(tmp_path / "wh"), spark)
    merge_changes(cat, "t", spark.createDataFrame([(1, 1, "I", "a")], CH),
                  ["k"], ["seq"])
    bad = spark.createDataFrame([(1, 2, "b")], "k long, seq long, v string")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_changes(cat, "t", bad, ["k"], ["seq"])


def test_merge_changes_untouched_keys_never_shuffle(spark, tmp_path):
    """Plan assert: the stored-state branch feeding the output directly
    is an anti-join with BROADCAST distribution of the batch keys —
    no Exchange (shuffle) is allowed on the stored side."""
    from mc2skos_spark.operators.cdc import latest_snapshot
    from mc2skos_spark.sinks.icebergish import IcebergishCatalog
    cat = IcebergishCatalog(str(tmp_path / "wh"), spark)
    state = latest_snapshot(
        spark.createDataFrame([(1, 1, "I", "a"), (2, 1, "I", "b")], CH),
        ["k"], ["seq"])
    cat.write("t", state)
    current = cat.read("t")
    changes = spark.createDataFrame([(2, 2, "U", "b2")], CH)
    untouched = current.join(F.broadcast(changes.select("k").distinct()),
                             ["k"], "left_anti")
    plan = untouched._jdf.queryExecution().executedPlan().toString()
    # the anti-join must be broadcast (LeftAnti, no nested loop) ...
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # ... and the ONLY shuffle is the batch-key distinct (tiny side);
    # the stored-state scan reaches the join with no Exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_compress_changes_vectors(spark):
    from mc2skos_spark.operators.cdc import compress_changes
    changes = spark.createDataFrame(
        [(1, 1, "I", "a"), (1, 2, "U", "a"),   # no-op image dropped
         (1, 3, "U", "b"), (1, 4, "U", "a"),   # a->b->a both kept
         (2, 1, "I", None), (2, 2, "U", None), # null==null: no-op
         (2, 3, "U", "x"),
         (3, 7, "I", "z")], CH)                # singleton kept
    got = sorted((r["k"], r["seq"]) for r in
                 compress_changes(changes, ["k"], ["seq"], ["v"])
                 .collect())
    assert got == [(1, 1), (1, 3), (1, 4), (2, 1), (2, 3), (3, 7)]
    # composition: SCD2 over the compressed stream yields one interval
    # per VALUE RUN, not per redelivered image
    from mc2skos_spark.operators.cdc import scd2_history
    hist = scd2_history(
        compress_changes(changes, ["k"], ["seq"], ["v"])
        .filter(F.col("k") == 1), ["k"], "seq")
    assert [(r["v"], r["valid_from"], r["valid_to"])
            for r in hist.orderBy("valid_from").collect()] == \
        [("a", 1, 3), ("b", 3, 4), ("a", 4, None)]
