"""Incremental MinHash dedup against a persisted signature index.

The production 100 TB shape: the corpus's MinHash signatures and their
banded LSH buckets are computed ONCE and persisted through the catalog
(``sinks/icebergish.py`` — same call surface as an Iceberg table); each
arriving batch signs only its own documents, equi-joins its banded
buckets against the *persisted* index (corpus side never recomputed,
never rewritten — ``catalog.append`` adds only the batch's files), and
emits near-duplicate pairs

* batch × corpus — new docs duplicating something already ingested, and
* batch × batch — duplicates inside the arriving batch itself,

then commits the batch's signatures/buckets into the index so the next
batch sees them.  Candidate generation stays an equi-join on
``(band, bucket)`` (linear in batch size + bucket cohabitants, never
all-pairs over the corpus), and the pair scoring is the SAME
``minhash_similarity`` join the from-scratch path uses — the module's
exact-equality contract with ``dedup_minhash_lsh`` holds by
construction, not by parallel re-implementation.

Signing parameters (``n``, ``num_hashes``, ``bands``) are recorded in
the index manifest's properties at creation and re-read per batch, so a
batch can never be signed with different parameters than the corpus it
joins against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sinks.icebergish import IcebergishCatalog
from .dedup import minhash_banded, minhash_signatures, minhash_similarity

#: table-name suffixes under one logical index name
SIG_SUFFIX = "_sigs"
BUCKET_SUFFIX = "_buckets"


def create_minhash_index(catalog: IcebergishCatalog, name: str,
                         df: DataFrame, id_col: str, text_col: str,
                         n: int = 3, num_hashes: int = 32,
                         bands: int = 8) -> dict:
    """Sign the seed corpus and commit the two index tables:
    ``<name>_sigs (id, sig)`` and ``<name>_buckets (id, band, bucket)``.
    Returns the buckets manifest."""
    props = {"minhash_n": n, "minhash_num_hashes": num_hashes,
             "minhash_bands": bands}
    sigs = minhash_signatures(df, id_col, text_col, n=n,
                              num_hashes=num_hashes)
    catalog.write(name + SIG_SUFFIX, sigs, lineage_key="id",
                  properties=props)
    banded = minhash_banded(catalog.read(name + SIG_SUFFIX), bands)
    return catalog.write(name + BUCKET_SUFFIX, banded, lineage_key="id",
                         properties=props)


def index_params(catalog: IcebergishCatalog, name: str) -> dict:
    manifest = catalog.current_manifest(name + BUCKET_SUFFIX)
    if manifest is None:
        raise FileNotFoundError("no committed minhash index %r" % name)
    p = manifest["properties"]
    return {"n": p["minhash_n"], "num_hashes": p["minhash_num_hashes"],
            "bands": p["minhash_bands"]}


def batch_index_rows(catalog: IcebergishCatalog, name: str,
                     batch: DataFrame, id_col: str, text_col: str
                     ) -> tuple[DataFrame, DataFrame]:
    """Sign ONE batch with the index's committed parameters:
    ``(sigs, buckets)``, both lazily checkpointed so every consumer
    (candidate join, similarity lookups, the index appends) shares one
    materialization — the batch is shingled and hashed exactly once."""
    params = index_params(catalog, name)
    sigs = minhash_signatures(batch, id_col, text_col, n=params["n"],
                              num_hashes=params["num_hashes"]
                              ).localCheckpoint(eager=False)
    buckets = (minhash_banded(sigs, params["bands"])
               .localCheckpoint(eager=False))
    return sigs, buckets


def append_batch_to_index(catalog: IcebergishCatalog, name: str,
                          batch: DataFrame | None = None,
                          id_col: str = "doc_id", text_col: str = "text",
                          batch_id: int | None = None,
                          precomputed: tuple[DataFrame, DataFrame] |
                          None = None) -> None:
    """Append one batch's signatures + buckets to the index, guarded
    per table by ``last_batch_id`` so a REPLAY of an already-applied
    batch id is a no-op (exactly-once per table even when a kill lands
    between the two appends).  Pass ``precomputed`` (from
    ``batch_index_rows``) to reuse signatures already computed for the
    pair join instead of signing the batch again."""
    if precomputed is None:
        if batch is None:
            raise ValueError("either batch or precomputed is required")
        precomputed = batch_index_rows(catalog, name, batch,
                                       id_col, text_col)
    new_sigs, new_buckets = precomputed
    props = {} if batch_id is None else {"last_batch_id": batch_id}
    for suffix, df in ((SIG_SUFFIX, new_sigs), (BUCKET_SUFFIX, new_buckets)):
        manifest = catalog.current_manifest(name + suffix)
        last = (manifest or {}).get("properties", {}) \
            .get("last_batch_id", -1)
        if batch_id is not None and last >= batch_id:
            continue  # replay of an applied batch: leave the snapshot
        catalog.append(name + suffix, df, lineage_key="id",
                       properties=props)


def incremental_minhash_pairs(catalog: IcebergishCatalog, name: str,
                              batch: DataFrame, id_col: str,
                              text_col: str,
                              threshold: float = 0.9,
                              commit: bool = True,
                              batch_id: int | None = None,
                              precomputed: tuple[DataFrame, DataFrame] |
                              None = None) -> DataFrame:
    """Near-duplicate pairs for one arriving batch vs the persisted
    index (plus batch-internal pairs), ``(id_a, id_b, est_jaccard)``
    with ``id_a < id_b``; ids must be globally unique across batches.

    ``commit=True`` appends the batch's signatures and buckets to the
    index (new snapshot referencing the prior files — the corpus is not
    rewritten) AFTER materializing the pair result, so a kill before
    the append leaves the index at the previous snapshot and the batch
    can simply be re-run (same idempotence contract as the pipeline
    stages).  Pass ``batch_id`` to make the commit replay-safe: a rerun
    of an already-committed batch id skips the append instead of
    double-ingesting the signatures (the guard an external retrying
    orchestrator needs).
    """
    if precomputed is None:
        precomputed = batch_index_rows(catalog, name, batch,
                                       id_col, text_col)
    new_sigs, new_buckets = precomputed
    corpus_sigs = catalog.read(name + SIG_SUFFIX)
    corpus_buckets = catalog.read(name + BUCKET_SUFFIX)

    # Replay robustness: if a prior half-applied run already appended
    # this batch's rows to ONE of the index tables (kill between the
    # two appends), the corpus side would carry the batch ids and the
    # scoring join would emit duplicate rows.  Anti-join the batch ids
    # off the corpus side — broadcast (the id column of one batch),
    # so it stays a map-side filter over the corpus scan.
    new_ids = F.broadcast(new_sigs.select("id"))
    corpus_sigs = corpus_sigs.join(new_ids, "id", "left_anti")
    corpus_buckets = corpus_buckets.join(new_ids, "id", "left_anti")

    # batch × (corpus ∪ batch): dedup against everything already
    # ingested AND inside the arriving batch — one equi-join, the
    # right side unions the PERSISTED corpus buckets (scan, no
    # recompute) with the batch's own
    right = corpus_buckets.unionByName(new_buckets)
    cand = (new_buckets.alias("a")
            .join(right.alias("b"), ["band", "bucket"])
            .filter(F.col("a.id") != F.col("b.id"))
            .select(F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                    F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"))
            .distinct())

    # the SAME scorer as the from-scratch LSH path (functions/dedup.py)
    all_sigs = corpus_sigs.unionByName(new_sigs)
    pairs = (minhash_similarity(all_sigs, cand)
             .filter(F.col("est_jaccard") >= threshold))

    if commit:
        pairs = pairs.localCheckpoint()  # materialize BEFORE the commit
        append_batch_to_index(catalog, name, batch_id=batch_id,
                              precomputed=precomputed)
    return pairs
