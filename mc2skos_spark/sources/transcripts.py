"""Stage 0 — transcript reassembly: conversations → MARCXML records.

Input: the BASELINE.json input_hint table
``(conv_id, turn_idx, role, text, tool, ts)`` where record payloads ride
in the ``text`` of ``tool='marc_export'`` turns, split across consecutive
turns.  The per-row invariant is *per-turn text equality under stable
(conv_id, turn_idx) ordering* — so stage 0 is a deterministic sort-and-
concatenate per conversation followed by record-boundary recovery.

Scale notes (the part that must survive 100 TB):

* filter to payload turns FIRST — predicate pushdown drops the filler
  turns (and every non-``text`` column) at the scan;
* ONE shuffle: ``groupBy(conv_id)`` with an ``array_sort(collect_list
  (struct(turn_idx, text)))`` aggregate.  A window + separate groupBy
  would shuffle twice for the same result; sorting inside the aggregated
  array replaces a per-partition global sort;
* record spans are recovered with ``regexp_extract_all`` + ``explode``
  — JVM-side, no Python;
* conversations are independent units (a record never spans
  conversations), so the stage parallelizes perfectly across conv_ids;
  a pathologically hot conv_id is bounded by conversation length, and
  AQE's skew-join/partition splitting handles stragglers.  The record
  payload itself is the unit of work downstream, where we explicitly
  ``repartition`` for balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# A standalone serialized MARC record span, any namespace prefix.
RECORD_SPAN_PATTERN = r"(?s)<(?:\w+:)?record[\s>].*?</(?:\w+:)?record>"
# shared with the stateful-streaming path: record_id derivation must be
# byte-identical between batch and streaming (tested), so there is ONE
# 001-controlfield pattern
CONTROL_001_PATTERN = r'<(?:\w+:)?controlfield[^>]*tag="001"[^>]*>([^<]*)<'


def reassemble_records(transcripts: DataFrame,
                       payload_tool: str = "marc_export",
                       block_size: int | None = None) -> DataFrame:
    """Transcripts → MARC_RECORDS (record_id, conv_id, record_xml).

    record_id is derived from the 001 controlfield when present, else a
    deterministic ``<conv_id>#<k>`` position id.

    ``block_size``: the explicit skew/scale path (SURVEY.md §4 item 1).
    A pathologically hot conv_id (one conversation with millions of
    turns) would force all its rows through one reduce task and one
    in-memory array.  With ``block_size=B`` the fold runs in two phases:
    first ``groupBy(conv_id, turn_idx div B)`` concatenates each
    *contiguous* B-turn block (the salt — cardinality rises by x(turns/B),
    keys become uniform), then the per-conversation fold concatenates
    the far-smaller blocks in block order.  Exact same output.
    """
    payload_turns = (transcripts
                     .filter(F.col("tool") == payload_tool)
                     .select("conv_id", "turn_idx", "text"))

    def ordered_concat(order_col, text_col):
        # struct sort orders by the leading field → turn/block order
        return (F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(order_col, text_col))),
                lambda s: s[text_col]), ""))

    if block_size:
        blocks = (payload_turns
                  .withColumn("block",
                              F.floor(F.col("turn_idx") / block_size))
                  .groupBy("conv_id", "block")
                  .agg(ordered_concat("turn_idx", "text").alias("text")))
        assembled = (blocks.groupBy("conv_id")
                     .agg(ordered_concat("block", "text").alias("payload")))
    else:
        assembled = (payload_turns.groupBy("conv_id")
                     .agg(ordered_concat("turn_idx", "text")
                          .alias("payload")))
    records = (
        assembled
        .select(
            "conv_id",
            F.posexplode(
                F.regexp_extract_all("payload",
                                     F.lit(RECORD_SPAN_PATTERN), 0)
            ).alias("pos", "record_xml"))
    )
    return records.select(
        F.coalesce(
            F.regexp_extract("record_xml", CONTROL_001_PATTERN, 1),
            F.lit(""),
        ).alias("raw_001"),
        "conv_id", "pos", "record_xml",
    ).select(
        F.when(F.col("raw_001") != "", F.col("raw_001"))
         .otherwise(F.concat_ws("#", "conv_id", "pos"))
         .alias("record_id"),
        "conv_id", "record_xml",
    )


def roundtrip_check(transcripts: DataFrame, records: DataFrame,
                    payload_tool: str = "marc_export") -> dict:
    """Evidence for the per-turn-equality invariant: every payload byte
    must land in exactly one reassembled record.  ``payload_tool`` must
    match the value the records were reassembled with."""
    payload_chars = (transcripts.filter(F.col("tool") == payload_tool)
                     .agg(F.sum(F.length("text"))).collect()[0][0]) or 0
    record_chars = (records.agg(F.sum(F.length("record_xml")))
                    .collect()[0][0]) or 0
    return {"payload_chars": int(payload_chars),
            "record_chars": int(record_chars)}
