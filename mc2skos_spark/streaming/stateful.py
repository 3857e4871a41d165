"""Stateful streaming reassembly via ``applyInPandasWithState``.

The foreachBatch path (:mod:`.incremental`) re-runs the batch operators
per micro-batch; this module is the streaming-*native* alternative: a
custom stateful operator that accumulates each conversation's turns in
group state across micro-batches and emits the conversation's MARC
records exactly once, when the turn range is complete.

State per conv_id: the payload turns seen so far plus the terminal turn
index (if seen).  Completeness = contiguous turn coverage 0..max with
the terminal marker at max — the same rule as the batch gate
(``incremental.py``: ``F.max`` over done markers, so a mid-conversation
'done' before the terminal one does not mask it), so both paths produce
identical records (tested).
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.transcripts import CONTROL_001_PATTERN, RECORD_SPAN_PATTERN

OUTPUT_SCHEMA = T.StructType([
    T.StructField("record_id", T.StringType()),
    T.StructField("conv_id", T.StringType()),
    T.StructField("record_xml", T.StringType()),
])

# arrays survive spark->pandas->spark state round trips; parallel lists
STATE_SCHEMA = T.StructType([
    T.StructField("turn_idxs", T.ArrayType(T.IntegerType())),
    T.StructField("texts", T.ArrayType(T.StringType())),
    T.StructField("payload_flags", T.ArrayType(T.BooleanType())),
    T.StructField("done_idx", T.IntegerType()),
])

_CONTROL_001_RE = re.compile(CONTROL_001_PATTERN)


def _emit_records(conv_id: str, turn_idxs, texts, payload_flags):
    ordered = sorted(zip(turn_idxs, texts, payload_flags))
    payload = "".join(text for _, text, is_payload in ordered if is_payload)
    rows = []
    for pos, match in enumerate(re.finditer(RECORD_SPAN_PATTERN, payload)):
        xml = match.group(0)
        m001 = _CONTROL_001_RE.search(xml)
        record_id = (m001.group(1) if m001 and m001.group(1)
                     else "%s#%d" % (conv_id, pos))
        rows.append((record_id, conv_id, xml))
    return rows


def _make_reassemble_fn(timeout_ms: int | None):
    def fn(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if timeout_ms is not None and state.hasTimedOut:
            # evict-and-drop: a conversation whose terminal turn never
            # arrives (or whose state was recreated by re-delivery
            # after emission) must not grow the state store forever
            state.remove()
            yield pd.DataFrame(columns=["record_id", "conv_id",
                                        "record_xml"])
            return
        if state.exists:
            turn_idxs, texts, payload_flags, done_idx = state.get
            turn_idxs, texts, payload_flags = (list(turn_idxs), list(texts),
                                               list(payload_flags))
            done_idx = (done_idx if done_idx is not None and done_idx >= 0
                        else None)
        else:
            turn_idxs, texts, payload_flags, done_idx = [], [], [], None

        seen = set(turn_idxs)
        for pdf in pdfs:
            for turn_idx, role, text, tool in zip(
                    pdf["turn_idx"], pdf["role"], pdf["text"], pdf["tool"]):
                turn_idx = int(turn_idx)
                if turn_idx in seen:
                    continue  # replay-idempotent
                seen.add(turn_idx)
                is_payload = tool == "marc_export"
                turn_idxs.append(turn_idx)
                # null payload text behaves like the batch path's
                # array_join (nulls contribute nothing, never crash)
                texts.append((text or "") if is_payload else "")
                payload_flags.append(bool(is_payload))
                if role == "assistant" and text == "done":
                    # max, not last-processed: matches the batch gate's
                    # F.max over done markers under out-of-order arrival
                    done_idx = (turn_idx if done_idx is None
                                else max(done_idx, turn_idx))

        complete = (done_idx is not None and max(turn_idxs) == done_idx
                    and len(turn_idxs) == done_idx + 1)
        if complete:
            rows = _emit_records(conv_id, turn_idxs, texts, payload_flags)
            state.remove()
            yield pd.DataFrame(rows, columns=["record_id", "conv_id",
                                              "record_xml"])
        else:
            state.update((turn_idxs, texts, payload_flags,
                          done_idx if done_idx is not None else -1))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(columns=["record_id", "conv_id",
                                        "record_xml"])

    return fn


def reassemble_stream(transcripts_stream: DataFrame,
                      state_timeout_ms: int | None = None) -> DataFrame:
    """Streaming transcripts → streaming MARC_RECORDS (exactly-once per
    conversation, arbitrary turn arrival order across micro-batches).

    ``state_timeout_ms``: optional processing-time eviction for
    conversations that never complete (lost terminal turns, re-delivered
    fragments after emission) — REQUIRED on unbounded production
    streams or the state store grows without bound; left off by default
    so bounded backfills stay exact.
    """
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_timeout_ms is not None
               else GroupStateTimeout.NoTimeout)
    return (transcripts_stream
            .select("conv_id", "turn_idx", "role", "text", "tool")
            .groupBy("conv_id")
            .applyInPandasWithState(
                _make_reassemble_fn(state_timeout_ms),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))
