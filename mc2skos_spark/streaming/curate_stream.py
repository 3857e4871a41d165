"""Streaming corpus curation — the curation pipeline applied per
micro-batch, composing the stateless gates (profile / quality /
repetition / PII scrub) with the stateful persisted-index dedup of
``dedup_stream.py``.

``readStream`` over a documents directory → ``foreachBatch`` where
each micro-batch:

1. profiles its documents (tokens / quality / language / top-bigram
   repetition) and applies the quality + repetition gates — pure
   projections, deterministic under replay — plus, when configured, a
   CCNet-style perplexity gate against a FIXED reference unigram LM
   (``lm_path``/``max_avg_nll``; fixed so replays gate identically);
2. redacts PII spans;
3. commits the surviving rows (with their profile columns) as the
   versioned snapshot ``curated_batch_N`` — a replay rewrites the
   identical bytes;
4. delegates to :class:`~.dedup_stream.StreamingDeduper` with
   ``assign_keepers=True``: the batch's scrubbed text is signed,
   joined against the persisted MinHash index, and the append-only
   keeper/remap cluster state advances (all replay-guarded by the
   deduper's ``last_batch_id`` check).

DSIR importance weighting is deliberately NOT composed per-batch: its
weights are relative to the POOL distribution, so a per-batch variant
would gate the same document differently depending on its batch — run
``functions/dsir.py`` over the accumulated curated corpus instead.

``curated_corpus`` reads the result: the union of curated snapshots
restricted to documents that are their own cluster keeper under the
CURRENT resolved keeper state — so a later batch linking an old doc to
a smaller id retroactively (and correctly) evicts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.incremental import current_keepers
from ..functions.lm import lm_nll_scores
from ..functions.pii import scrub_pii
from ..functions.textstats import profile_and_gate
from ..sinks.icebergish import IcebergishCatalog
from .dedup_stream import StreamingDeduper, start_stream, union_snapshots

CURATED_TABLE = "curated_batch_%06d"


class StreamingCurator:
    """foreachBatch handler: quality gate + PII scrub + keeper dedup."""

    def __init__(self, warehouse: str, name: str = "docs_minhash",
                 min_quality: float = 0.0, max_top_bigram: float = 1.0,
                 scrub: bool = True, id_col: str = "doc_id",
                 text_col: str = "text", lm_path: str | None = None,
                 max_avg_nll: float | None = None, **dedup_kwargs):
        # the LM gate REQUIRES a fixed reference LM: self-training per
        # micro-batch would make the gate depend on batch composition
        # (and differ on replay), so both knobs come together
        if (lm_path is None) != (max_avg_nll is None):
            raise ValueError("StreamingCurator: lm_path and max_avg_nll "
                             "must be passed together (the streaming LM "
                             "gate needs a FIXED reference LM)")
        self.lm_path = lm_path
        self.max_avg_nll = max_avg_nll
        self.warehouse = warehouse
        self.min_quality = min_quality
        self.max_top_bigram = max_top_bigram
        self.scrub = scrub
        self.id_col = id_col
        self.text_col = text_col
        self.deduper = StreamingDeduper(
            warehouse, name=name, id_col=id_col, text_col=text_col,
            assign_keepers=True, **dedup_kwargs)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        catalog = IcebergishCatalog(self.warehouse, batch.sparkSession)
        # the SAME gate the batch CLI applies (functions/textstats.py)
        curated = profile_and_gate(batch, self.min_quality,
                                   self.max_top_bigram,
                                   self.id_col, self.text_col)
        if self.max_avg_nll is not None:
            # fixed reference LM (token, cnt): the per-batch score is a
            # pure function of the document, so replays gate rows
            # identically
            lm = batch.sparkSession.read.parquet(self.lm_path)
            ok = (lm_nll_scores(curated, lm=lm, id_col=self.id_col,
                                text_col=self.text_col)
                  .filter(F.col("avg_nll") <= self.max_avg_nll)
                  .select(self.id_col))
            curated = curated.join(ok, self.id_col)
        if self.scrub:
            curated = curated.withColumn(
                self.text_col, scrub_pii(F.col(self.text_col)))
        # one materialization feeds the replay guard, the snapshot
        # write AND the dedup path
        curated = curated.localCheckpoint()
        # the guard runs BEFORE any commit of our own: on a genuine
        # replay every commit (including the curated snapshot) must be
        # skipped, and on a checkpoint/warehouse mismatch it raises —
        # writing the snapshot first would let the error path clobber
        # the original batch's committed curated rows.  The guard sees
        # CURATED ids (the set that got indexed): gated-out docs never
        # entered the index, so raw-batch ids would misread a genuine
        # replay as a mismatch.
        if self.deduper.replay_applied(
                curated.select(self.id_col, self.text_col), batch_id,
                catalog):
            return
        catalog.write(CURATED_TABLE % batch_id, curated,
                      lineage_key=self.id_col)
        self.deduper.process_batch(
            curated.select(self.id_col, self.text_col), batch_id)


def stream_curate(spark: SparkSession, input_dir: str, warehouse: str,
                  checkpoint_dir: str, schema: str | None = None,
                  available_now: bool = True,
                  max_files_per_trigger: int = 1, **curator_kwargs):
    """Start (and by default drain) a streaming curation over a
    documents directory."""
    curator = StreamingCurator(warehouse, **curator_kwargs)
    return start_stream(spark, input_dir, checkpoint_dir,
                        curator.process_batch, schema=schema,
                        available_now=available_now,
                        max_files_per_trigger=max_files_per_trigger)


def curated_corpus(spark: SparkSession, warehouse: str,
                   name: str = "docs_minhash",
                   id_col: str = "doc_id") -> DataFrame:
    """Union of all curated snapshots, restricted to current cluster
    keepers (``id == keeper_id`` under the resolved keeper state)."""
    out = union_snapshots(spark, warehouse, "curated_batch_")
    catalog = IcebergishCatalog(warehouse, spark)
    keepers = (current_keepers(catalog, name)
               .filter(F.col("id") == F.col("keeper_id"))
               .select(F.col("id").alias(id_col)))
    return out.join(keepers, id_col)
