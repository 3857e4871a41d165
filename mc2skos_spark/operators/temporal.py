"""Temporal joins Spark's DataFrame API lacks: as-of and interval.

Both are classic lakehouse operators (pandas ``merge_asof``, DuckDB
``ASOF JOIN``, Databricks range-join hints) that naive SQL expresses
as an inequality join — which Spark plans as BroadcastNestedLoopJoin
or a cartesian product, both fatal at 100 TB.  The implementations
here are pure DataFrame compositions with linear shuffle cost:

- :func:`asof_join` — the union+window trick: tag both sides, union,
  ONE shuffle on the equality key, one sort, then a running
  ``last(ignorenulls)`` carries the most recent right payload forward
  onto each left row.  O(|L|+|R|) rows through one exchange; no
  inequality join anywhere in the plan.
- :func:`interval_join` — bucketed overlap join: explode each
  interval into fixed-width buckets, equi-join on (keys, bucket),
  re-filter the true overlap, and keep each pair only in the ONE
  bucket containing ``greatest(l_start, r_start)`` — every
  overlapping pair survives exactly once, so no dedup pass.  Shuffle
  volume is rows × (interval/width + 1); callers pick the width near
  the typical interval length.

Determinism: ties on the right side of the as-of join are broken by a
caller-named tiebreak column (``last`` under ``orderBy(ts, side,
tiebreak)`` keeps the max), so results are stable under any shuffle
order.  Null keys / null timestamps on the right never match (SQL
semantics); unmatched left rows survive with null payloads.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAY = "__asof_payload"
_ROW = "__asof_lrow"


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              value_cols: Sequence[str],
              direction: str = "backward",
              tolerance_us: int | None = None,
              right_tiebreak: str | None = None,
              block_us: int | None = None) -> DataFrame:
    """For each left row, attach the nearest right row per key.

    ``backward``: the right row with the greatest ``right_ts`` <=
    ``left_ts`` (inclusive, like DuckDB ``ASOF JOIN ... >=`` and
    pandas ``merge_asof``).  ``forward``: smallest ``right_ts`` >=
    ``left_ts``.  Left-join semantics: every left row survives; the
    attached ``value_cols`` (plus ``matched_ts``) are null when no
    right row qualifies or the match is farther than ``tolerance_us``
    (compared on exact integer microseconds when given).

    ``right_tiebreak``: column ordering right rows that share an
    identical (key, ts) — the max wins deterministically (in either
    direction).  Without it, callers must pre-deduplicate
    (key, ts) on the right or accept shuffle-order results.

    Plan shape: union → ONE Exchange on ``on`` → Sort → running
    ``last(ignorenulls)`` window → filter.  A pathologically hot key
    bounds one task (inherent to per-key ordered semantics — same
    note as sessionize) — UNLESS ``block_us`` is set: the block-salted
    two-phase variant (the ``reassemble_records(block_size=...)``
    trick in time) windows within ``(key, floor(ts/block_us))`` blocks
    so a hot key spreads over many tasks, then carries each block's
    boundary payload forward with a second window over the
    metadata-scale per-(key, block) summary table.  Semantics are
    IDENTICAL to the unsalted path (equality pytest in
    ``tests/test_temporal.py``); pick ``block_us`` so a hot key's rows
    per block fit a task comfortably.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("asof_join: direction must be backward|forward")
    on = list(on)
    bad = set(on) & set(value_cols)
    if bad:
        raise ValueError("asof_join: value_cols overlap keys: %s" % bad)
    clash = set(left.columns) & (set(value_cols) | {"matched_ts"})
    if clash:
        raise ValueError(
            "asof_join: output columns %s collide with left columns — "
            "rename the right value columns first" % sorted(clash))

    payload_cols = [F.col(c) for c in value_cols] + [
        F.col(right_ts).alias("matched_ts")]
    pay_t = right.select(F.struct(*payload_cols).alias(_PAY)) \
        .schema[_PAY].dataType
    row_t = left.select(F.struct("*").alias(_ROW)).schema[_ROW].dataType
    # right rows with a null key or null ts can never match (SQL
    # equality/inequality semantics) — drop them before the union so
    # Spark's null-grouping partitioner cannot pair them with left
    # null keys
    r_valid = right.na.drop(subset=on + [right_ts])
    tb = (F.col(right_tiebreak) if right_tiebreak
          else F.lit(0)).alias("__asof_tb")
    r_side = r_valid.select(
        *on, F.col(right_ts).alias(_TS), F.lit(0).alias(_SIDE), tb,
        F.struct(*payload_cols).alias(_PAY),
        F.lit(None).cast(row_t).alias(_ROW))
    l_side = left.select(
        *on, F.col(left_ts).alias(_TS), F.lit(1).alias(_SIDE),
        F.lit(0).alias("__asof_tb"),
        F.lit(None).cast(pay_t).alias(_PAY),
        F.struct("*").alias(_ROW))

    if direction == "backward":
        order = [F.col(_TS).asc_nulls_first(), F.col(_SIDE).asc(),
                 F.col("__asof_tb").asc()]
    else:
        # reverse time: the running last() then carries the NEXT
        # right row backward; right still sorts before left at ties,
        # and tb stays ascending so the MAX tiebreak wins in both
        # directions
        order = [F.col(_TS).desc_nulls_first(), F.col(_SIDE).asc(),
                 F.col("__asof_tb").asc()]
    w = (Window.partitionBy(*on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (r_side.unionByName(l_side)
               .withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
               .filter(F.col(_SIDE) == 1))
    if tolerance_us is not None:
        dt = dict(matched.dtypes)[_TS]
        if dt == "timestamp":
            us = F.unix_micros
        elif dt == "timestamp_ntz":
            us = _ntz_micros
        else:                       # already-numeric event time
            us = lambda c: c        # noqa: E731
        gap = us(F.col(_TS)) - us(F.col(_PAY)["matched_ts"])
        if direction == "forward":
            gap = -gap
        matched = matched.withColumn(
            _PAY, F.when(gap <= F.lit(int(tolerance_us)), F.col(_PAY)))
    out_cols = [F.col(_ROW)[f.name].alias(f.name) for f in row_t.fields]
    out_cols += [F.col(_PAY)[c].alias(c) for c in value_cols]
    out_cols.append(F.col(_PAY)["matched_ts"].alias("matched_ts"))
    return matched.select(*out_cols)


def _ntz_micros(c):
    from mc2skos_spark.operators.sessionize import event_micros
    return event_micros(c)


def interval_join(left: DataFrame, right: DataFrame,
                  on: Sequence[str],
                  l_start: str, l_end: str,
                  r_start: str, r_end: str,
                  bucket_width: int) -> DataFrame:
    """Inclusive interval-overlap equi-join without a dedup pass.

    Emits one row per (left, right) pair whose closed intervals
    ``[l_start, l_end]`` and ``[r_start, r_end]`` overlap and whose
    ``on`` keys are equal (``on`` may be empty for a pure range
    join).  Start/end are any integer columns (callers convert
    timestamps to epoch micros first — exact arithmetic, TZ-proof).

    Strategy: each side explodes into the fixed-width buckets its
    interval covers, the join is an equi-join on (keys, bucket), and
    the pair is kept only in the bucket containing
    ``greatest(l_start, r_start)`` — for an overlapping pair that
    bucket lies inside BOTH intervals and is unique, so each pair
    appears exactly once without a distinct.  Explosion factor is
    ``len/width + 1`` per row; pick ``bucket_width`` near the typical
    interval length.  At 100 TB this is the Databricks range-join
    optimization expressed in plain DataFrame ops: shuffle volume is
    linear in exploded rows, never quadratic, and AQE handles bucket
    skew (a globally hot time window is split by the (keys, bucket)
    hash).

    Column names of ``left`` and ``right`` must be disjoint apart
    from ``on`` (rename before calling; the returned frame carries
    both sides' columns).
    """
    if bucket_width <= 0:
        raise ValueError("interval_join: bucket_width must be positive")
    on = list(on)
    overlap_l = set(left.columns) & set(right.columns) - set(on)
    if overlap_l:
        raise ValueError(
            "interval_join: ambiguous columns %s — rename one side"
            % sorted(overlap_l))
    w = int(bucket_width)

    def buckets(df, s, e):
        lo = F.floor(F.col(s) / w).cast("long")
        hi = F.floor(F.col(e) / w).cast("long")
        return df.filter(F.col(s) <= F.col(e)).withColumn(
            "__bucket", F.explode(F.sequence(lo, hi)))

    lb = buckets(left, l_start, l_end)
    rb = buckets(right, r_start, r_end).withColumnRenamed(
        "__bucket", "__rbucket")
    for k in on:
        rb = rb.withColumnRenamed(k, "__r_" + k)
    cond = F.col("__bucket") == F.col("__rbucket")
    for k in on:
        cond = cond & (F.col(k) == F.col("__r_" + k))
    anchor = F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / w).cast("long")
    pairs = (lb.join(rb, cond)
             .filter((F.col(l_start) <= F.col(r_end)) &
                     (F.col(r_start) <= F.col(l_end)) &
                     (F.col("__bucket") == anchor)))
    drop = ["__bucket", "__rbucket"] + ["__r_" + k for k in on]
    return pairs.drop(*drop)
