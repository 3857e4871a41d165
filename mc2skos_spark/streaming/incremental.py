"""Incremental ingestion via Structured Streaming.

The reference is strictly batch (SURVEY.md §2B: iterparse streaming is
an I/O detail, not event-time semantics), so this module adds the one
streaming capability a 10^12-turn pipeline actually needs: *incremental
processing of newly-landed transcript partitions* without reprocessing
history.

Design: ``readStream`` over the transcripts directory → watermarked
grouping is NOT used for reassembly (a conversation may span file
batches; correctness first) — instead each micro-batch is routed through
``foreachBatch`` where we:

1. restrict to conversations fully contained in the batch (conv_ids
   whose ``done`` marker turn arrived — here: the max turn with
   role='assistant' text='done'), carrying incomplete conversations
   forward via a small state table in the catalog;
2. run the exact batch operators (reassembly → extraction) — one code
   path, no semantic fork between batch and streaming;
3. append committed snapshots to the Icebergish catalog (idempotent by
   batch id: a replayed batch overwrites its own snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import (extract_triples, quarantine_from_extracted,
                                 triples_from_extracted)
from ..plans import schemas
from ..sinks.icebergish import IcebergishCatalog
from ..sources.transcripts import reassemble_records


class IncrementalExtractor:
    """foreachBatch handler with conversation-completeness gating."""

    def __init__(self, warehouse: str, options: dict | None = None,
                 default_scheme: str | None = None):
        self.warehouse = warehouse
        self.options = dict(options or {})
        self.default_scheme = default_scheme

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        catalog = IcebergishCatalog(self.warehouse, spark)

        # merge pending (incomplete) turns from previous batches; the
        # (conv_id, turn_idx) dedup makes batch REPLAY idempotent (a
        # recovered foreachBatch may re-deliver rows already persisted
        # into pending_turns)
        if catalog.exists("pending_turns"):
            batch = (batch.unionByName(catalog.read("pending_turns"))
                     .dropDuplicates(["conv_id", "turn_idx"]))

        # A conversation is complete iff its turns cover the contiguous
        # range 0..max AND the max turn is the terminal marker.  (The
        # marker alone is not enough: file-based micro-batches split a
        # conversation's rows arbitrarily, so later turn_idx values can
        # arrive in an *earlier* batch than earlier ones.)
        terminal = F.max(F.when((F.col("role") == "assistant") &
                                (F.col("text") == "done"),
                                F.col("turn_idx")))
        done = (batch.groupBy("conv_id")
                .agg(F.count_distinct("turn_idx").alias("n_turns"),
                     F.max("turn_idx").alias("max_idx"),
                     terminal.alias("done_idx"))
                .filter((F.col("done_idx") == F.col("max_idx")) &
                        (F.col("n_turns") == F.col("max_idx") + 1))
                .select("conv_id"))
        complete = batch.join(F.broadcast(done), "conv_id", "semi")
        pending = batch.join(F.broadcast(done), "conv_id", "anti")

        extracted = extract_triples(
            reassemble_records(complete), self.options, self.default_scheme)
        catalog.write("triples_batch_%06d" % batch_id,
                      triples_from_extracted(extracted),
                      lineage_key="subj")
        catalog.write("quarantine_batch_%06d" % batch_id,
                      quarantine_from_extracted(extracted),
                      lineage_key="record_id")
        catalog.write("pending_turns", pending, lineage_key="conv_id")


def stream_transcripts(spark: SparkSession, input_dir: str, warehouse: str,
                       checkpoint_dir: str,
                       options: dict | None = None,
                       default_scheme: str | None = None,
                       available_now: bool = True,
                       max_files_per_trigger: int = 16):
    """Start (and by default drain) an incremental extraction stream.

    ``available_now=True`` processes everything currently in the
    directory then stops — the test/backfill mode; pass False for a
    continuously-running ingestion.
    """
    extractor = IncrementalExtractor(warehouse, options, default_scheme)
    source = (spark.readStream.schema(schemas.TRANSCRIPTS)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(input_dir))
    writer = (source.writeStream
              .foreachBatch(extractor.process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()


def streamed_triples(spark: SparkSession, warehouse: str) -> DataFrame:
    """Union of all committed per-batch triple snapshots."""
    catalog = IcebergishCatalog(warehouse, spark)
    import os
    tables = sorted(t for t in os.listdir(warehouse)
                    if t.startswith("triples_batch_"))
    out = None
    for t in tables:
        df = catalog.read(t)
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise FileNotFoundError("no streamed triple snapshots in %s"
                                % warehouse)
    return out.dropDuplicates(["subj", "pred", "obj", "obj_lang",
                               "obj_datatype", "component_pos"])
