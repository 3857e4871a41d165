"""Streaming near-duplicate detection against the persisted MinHash
index — the production shape for a document stream at 100 TB.

``readStream`` over a documents directory → ``foreachBatch`` where each
micro-batch:

1. signs ONLY its own documents and equi-joins the *persisted* banded
   index (``functions/incremental.py`` — corpus never recomputed, never
   rewritten);
2. commits the batch's near-dup pairs as a versioned snapshot
   (``dedup_pairs_batch_N`` — replay overwrites identical content);
3. appends the batch's signatures/buckets into the index
   (``append_batch_to_index``, guarded per table by ``last_batch_id``).

Replay idempotence (the same contract as ``IncrementalExtractor``):
the pairs snapshot is written BEFORE the index appends, pair
computation reads only pre-batch index state, and each append skips
itself when its table already carries this batch id — so a kill at any
point replays to byte-identical state.  The first batch bootstraps an
empty index (same code path; batch-internal pairs still emitted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..functions.incremental import (BUCKET_SUFFIX, KEEPER_SUFFIX,
                                     REMAP_SUFFIX, SIG_SUFFIX, VEC_SUFFIX,
                                     append_batch_to_index,
                                     append_batch_to_semantic_index,
                                     batch_index_rows, batch_vec_rows,
                                     create_minhash_index,
                                     create_semantic_index,
                                     incremental_minhash_pairs,
                                     incremental_semantic_pairs)
from ..sinks.icebergish import IcebergishCatalog

PAIRS_TABLE = "dedup_pairs_batch_%06d"
SEM_PAIRS_TABLE = "semdedup_pairs_batch_%06d"


class StreamingDeduper:
    """foreachBatch handler: batch vs persisted-index near-dup pairs."""

    def __init__(self, warehouse: str, name: str = "docs_minhash",
                 id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.9, n: int = 3,
                 num_hashes: int = 32, bands: int = 8,
                 assign_keepers: bool = False,
                 compact_every: int | None = None,
                 compact_policy: dict | None = None):
        self.warehouse = warehouse
        self.name = name
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        from ..functions.dedup import validate_lsh_params
        validate_lsh_params(num_hashes, bands)
        self.params = {"n": n, "num_hashes": num_hashes, "bands": bands}
        #: also maintain the append-only keeper/remap cluster state per
        #: batch (incremental_keeper_assign) — the full dedup DECISION
        #: on the stream, not just pair detection
        self.assign_keepers = assign_keepers
        #: every N batches, compact + expire the index's tables —
        #: streaming is where append-per-batch small-file buildup bites
        #: hardest (one parquet file per table per micro-batch).
        #: Maintenance runs AFTER the batch's guarded commits and is
        #: replay-transparent: compaction preserves rows, properties
        #: (incl. the last_batch_id guards) and the committed schema,
        #: and a kill mid-compaction leaves the previous snapshot
        #: current — the next trigger simply retries the maintenance.
        self.compact_every = compact_every
        #: manifest-STAT-driven alternative to the blind counter:
        #: kwargs for ``IcebergishCatalog.maintain`` (``max_files`` /
        #: ``min_rows_per_file``), evaluated after EVERY batch — the
        #: check reads only the manifest JSON, and compaction fires
        #: exactly when the policy says (e.g. a skewed append pattern
        #: fragments one table long before its siblings).  Takes
        #: precedence over ``compact_every`` when both are set.
        self.compact_policy = compact_policy

    def replay_applied(self, batch: DataFrame, batch_id: int,
                       catalog: IcebergishCatalog | None = None) -> bool:
        """Bootstrap an empty index when absent; return True when
        ``batch_id`` is already applied (genuine replay — caller must
        skip ALL its commits, including any snapshots of its own, so a
        replay cannot clobber committed state); raise on a
        checkpoint/warehouse mismatch.  Runs BEFORE any caller-side
        write by contract."""
        catalog = catalog or IcebergishCatalog(self.warehouse,
                                               batch.sparkSession)
        buckets = catalog.current_manifest(self.name + BUCKET_SUFFIX)
        if buckets is None:
            # bootstrap an EMPTY index so batch 0 runs the same
            # incremental path as every later batch
            create_minhash_index(catalog, self.name, batch.limit(0),
                                 self.id_col, self.text_col,
                                 **self.params)
            return False
        if buckets["properties"].get("last_batch_id", -1) >= batch_id:
            # either a genuine foreachBatch replay of an applied batch
            # (skip silently) — or a FRESH stream checkpoint pointed at
            # an old warehouse, where Spark restarts batch ids at 0 and
            # skipping would silently drop brand-new data.  A replay
            # redelivers the same documents, so every id is already in
            # the index; a checkpoint reset delivers ids the index has
            # never seen (ids are globally unique by contract) — one
            # broadcast anti-join distinguishes the two.
            missing = (batch.select(F.col(self.id_col).alias("id"))
                       .join(catalog.read(self.name + SIG_SUFFIX)
                             .select("id"), "id", "left_anti")
                       .limit(1).count())
            if missing:
                raise RuntimeError(
                    "dedup stream checkpoint/warehouse mismatch: batch "
                    "%d carries ids the index (last_batch_id=%s) has "
                    "never seen — the stream checkpoint was reset "
                    "against an existing warehouse.  Restart with the "
                    "original checkpoint, or a fresh warehouse."
                    % (batch_id,
                       buckets["properties"].get("last_batch_id")))
            return True
        return False

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        catalog = IcebergishCatalog(self.warehouse, batch.sparkSession)
        if self.replay_applied(batch, batch_id, catalog):
            return
        if self.assign_keepers:
            # pairs + keeper/remap/index commits in one guarded step;
            # the per-batch pair snapshot is not separately materialized
            # on this path (the keeper state is the product)
            from ..functions.incremental import incremental_keeper_assign
            incremental_keeper_assign(
                catalog, self.name, batch, self.id_col, self.text_col,
                threshold=self.threshold, batch_id=batch_id)
            self._maybe_maintain(catalog, batch_id)
            return
        # sign the batch ONCE; pair join and index append share it
        pre = batch_index_rows(catalog, self.name, batch,
                               self.id_col, self.text_col)
        pairs = incremental_minhash_pairs(
            catalog, self.name, batch, self.id_col, self.text_col,
            threshold=self.threshold, commit=False,
            precomputed=pre).localCheckpoint()
        catalog.write(PAIRS_TABLE % batch_id, pairs, lineage_key="id_a")
        append_batch_to_index(catalog, self.name, batch_id=batch_id,
                              precomputed=pre)
        self._maybe_maintain(catalog, batch_id)

    def _maybe_maintain(self, catalog: IcebergishCatalog,
                        batch_id: int) -> None:
        """Compact + expire this index's tables — manifest-stat policy
        or every-``compact_every``-th batch (see the two __init__
        attributes).  Only the index's OWN tables (its four known
        suffixes) are touched — an open-ended prefix match would also
        sweep up a sibling index named e.g. ``<name>_v2`` in the same
        warehouse and expire its snapshot history.  Per-batch pair
        snapshots are single-write tables that never fragment, so they
        are skipped too."""
        _maintain_suffixes(catalog, self.name,
                           (SIG_SUFFIX, BUCKET_SUFFIX, KEEPER_SUFFIX,
                            REMAP_SUFFIX),
                           self.compact_every, self.compact_policy,
                           batch_id)


def _maintain_suffixes(catalog: IcebergishCatalog, name: str,
                       suffixes: tuple, compact_every: int | None,
                       compact_policy: dict | None,
                       batch_id: int) -> None:
    """Shared per-batch maintenance dispatch for the streaming
    handlers: a manifest-stat policy (``compact_policy`` →
    ``catalog.maintain``, evaluated after EVERY batch — the no-op case
    costs one manifest JSON read per table, and only the tables whose
    stats trip the policy are rewritten) or the blind every-N counter
    (``compact_every``).  Policy wins when both are set."""
    existing = set(catalog.tables(prefix=name))
    targets = [name + s for s in suffixes if name + s in existing]
    if compact_policy:
        for table in targets:
            catalog.maintain(table, keep_last=1, **compact_policy)
        return
    if not compact_every or (batch_id + 1) % compact_every:
        return
    for table in targets:
        catalog.compact(table)
        catalog.expire_snapshots(table, keep_last=1)


class StreamingSemanticDeduper:
    """foreachBatch handler for the EMBEDDING stream — the SemDeDup
    twin of :class:`StreamingDeduper`.  Persisted state is the
    ``(id, centroid, vn)`` vec table plus the centroid table picked
    from the FIRST batch and held fixed (see
    ``functions/incremental.py``'s semantic-index section); each
    micro-batch is assigned via the broadcast centroid matmul-argmax
    and scored against its centroid buckets only.  Same replay /
    bootstrap / checkpoint-mismatch / maintenance contracts as the
    MinHash handler."""

    def __init__(self, warehouse: str, name: str = "docs_semantic",
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 threshold: float = 0.97, num_centroids: int = 16,
                 centroid_mod: int = 8,
                 assign_keepers: bool = False,
                 compact_every: int | None = None,
                 compact_policy: dict | None = None):
        self.warehouse = warehouse
        self.name = name
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = threshold
        self.params = {"num_centroids": num_centroids,
                       "centroid_mod": centroid_mod}
        self.assign_keepers = assign_keepers
        self.compact_every = compact_every
        self.compact_policy = compact_policy

    def replay_applied(self, batch: DataFrame, batch_id: int,
                       catalog: IcebergishCatalog | None = None) -> bool:
        """Bootstrap when absent (EMPTY vec table + centroids from this
        first batch — it then flows through the same incremental path
        as every later batch); True on a genuine replay; raise on a
        checkpoint/warehouse mismatch (never-seen ids under an
        already-applied batch id)."""
        catalog = catalog or IcebergishCatalog(self.warehouse,
                                               batch.sparkSession)
        vecs = catalog.current_manifest(self.name + VEC_SUFFIX)
        if vecs is None:
            create_semantic_index(catalog, self.name, batch.limit(0),
                                  self.id_col, self.vec_col,
                                  centroid_source=batch, **self.params)
            return False
        if vecs["properties"].get("last_batch_id", -1) >= batch_id:
            missing = (batch.select(F.col(self.id_col).alias("id"))
                       .join(catalog.read(self.name + VEC_SUFFIX)
                             .select("id"), "id", "left_anti")
                       .limit(1).count())
            if missing:
                raise RuntimeError(
                    "semantic dedup stream checkpoint/warehouse "
                    "mismatch: batch %d carries ids the index "
                    "(last_batch_id=%s) has never seen — the stream "
                    "checkpoint was reset against an existing "
                    "warehouse.  Restart with the original checkpoint, "
                    "or a fresh warehouse."
                    % (batch_id, vecs["properties"].get("last_batch_id")))
            return True
        return False

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        catalog = IcebergishCatalog(self.warehouse, batch.sparkSession)
        if self.replay_applied(batch, batch_id, catalog):
            return
        if self.assign_keepers:
            from ..functions.incremental import (
                incremental_semantic_keeper_assign)
            incremental_semantic_keeper_assign(
                catalog, self.name, batch, self.id_col, self.vec_col,
                threshold=self.threshold, batch_id=batch_id)
            self._maybe_maintain(catalog, batch_id)
            return
        # assign the batch ONCE; pair join and index append share it
        pre = batch_vec_rows(catalog, self.name, batch,
                             self.id_col, self.vec_col)
        pairs = incremental_semantic_pairs(
            catalog, self.name, batch, self.id_col, self.vec_col,
            threshold=self.threshold, commit=False,
            precomputed=pre).localCheckpoint()
        catalog.write(SEM_PAIRS_TABLE % batch_id, pairs,
                      lineage_key="id_a")
        append_batch_to_semantic_index(catalog, self.name, pre,
                                       batch_id=batch_id)
        self._maybe_maintain(catalog, batch_id)

    def _maybe_maintain(self, catalog: IcebergishCatalog,
                        batch_id: int) -> None:
        """Compact + expire the vec/keeper/remap tables — manifest-stat
        policy or every-``compact_every``-th batch; the centroid table
        is single-write and never fragments, so it is skipped (same
        suffix-scoped rule as the MinHash handler)."""
        _maintain_suffixes(catalog, self.name,
                           (VEC_SUFFIX, KEEPER_SUFFIX, REMAP_SUFFIX),
                           self.compact_every, self.compact_policy,
                           batch_id)


def start_stream(spark: SparkSession, input_dir: str,
                 checkpoint_dir: str, handler,
                 schema: str | None = None,
                 available_now: bool = True,
                 max_files_per_trigger: int = 1):
    """Shared readStream → foreachBatch boilerplate for the streaming
    handlers (dedup, curation).  ``schema`` defaults to the driver
    documents shape; ``available_now`` drains the source and returns."""
    source = (spark.readStream
              .schema(schema or "doc_id long, text string")
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(input_dir))
    writer = (source.writeStream
              .foreachBatch(handler)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()


def union_snapshots(spark: SparkSession, warehouse: str,
                    prefix: str) -> DataFrame:
    """Union of all committed per-batch snapshots under a table
    prefix."""
    catalog = IcebergishCatalog(warehouse, spark)
    out = None
    for t in catalog.tables(prefix):
        df = catalog.read(t)
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise FileNotFoundError("no %s* snapshots in %s"
                                % (prefix, warehouse))
    return out


def stream_documents(spark: SparkSession, input_dir: str, warehouse: str,
                     checkpoint_dir: str, schema: str | None = None,
                     available_now: bool = True,
                     max_files_per_trigger: int = 1,
                     **dedup_kwargs):
    """Start (and by default drain) a streaming dedup over a documents
    directory."""
    deduper = StreamingDeduper(warehouse, **dedup_kwargs)
    return start_stream(spark, input_dir, checkpoint_dir,
                        deduper.process_batch, schema=schema,
                        available_now=available_now,
                        max_files_per_trigger=max_files_per_trigger)


def streamed_pairs(spark: SparkSession, warehouse: str) -> DataFrame:
    """Union of all committed per-batch pair snapshots."""
    return union_snapshots(spark, warehouse, "dedup_pairs_batch_")


def stream_embeddings(spark: SparkSession, input_dir: str,
                      warehouse: str, checkpoint_dir: str,
                      schema: str | None = None,
                      available_now: bool = True,
                      max_files_per_trigger: int = 1,
                      **dedup_kwargs):
    """Start (and by default drain) a streaming SEMANTIC dedup over an
    embeddings directory."""
    deduper = StreamingSemanticDeduper(warehouse, **dedup_kwargs)
    return start_stream(
        spark, input_dir, checkpoint_dir, deduper.process_batch,
        schema=schema or "vec_id long, embedding array<double>",
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger)


def streamed_semantic_pairs(spark: SparkSession,
                            warehouse: str) -> DataFrame:
    """Union of all committed per-batch semantic-pair snapshots."""
    return union_snapshots(spark, warehouse, "semdedup_pairs_batch_")
