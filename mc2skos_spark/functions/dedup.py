"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (what survives 100 TB):

* **exact** — one hash aggregate on the full text (or a fingerprint
  column to avoid shuffling long strings);
* **n-gram Jaccard** — shingle → explode → self-join on shingle →
  per-pair intersection counts → Jaccard.  The shingle join is the
  classic quadratic trap; at scale you cap per-shingle frequency
  (drop stop-shingles) before joining — exposed as ``max_shingle_freq``;
* **MinHash + LSH** — signatures via ``xxhash64(shingle, seed)`` min-
  aggregated per doc (JVM-side, no Python), banded into buckets, and
  only bucket-cohabitants are pair-joined: candidate generation is
  linear in data size, the join is on (band, bucket-hash);
* **SimHash** — 64-bit weighted-bit signature via bit arithmetic on
  token hashes; near-dups are signatures within Hamming distance k
  (joined on rotated prefix blocks at scale; here: direct popcount).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shingles(col, n: int = 3):
    """Word n-gram shingles as distinct strings."""
    toks = F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")))


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical documents: (keeper_id, dup_count)."""
    return (df.groupBy(text_col)
            .agg(F.min(id_col).alias("keeper_id"),
                 F.count(F.lit(1)).alias("dup_count"))
            .filter(F.col("dup_count") > 1)
            .select("keeper_id", "dup_count"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.8,
                        max_shingle_freq: int | None = 100) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with Jaccard(shingles) ≥ threshold."""
    sh = (df.select(F.col(id_col).alias("id"),
                    F.explode(shingles(F.col(text_col), n)).alias("sh")))
    if max_shingle_freq:
        hot = (sh.groupBy("sh").count()
               .filter(F.col("count") > max_shingle_freq).select("sh"))
        sh = sh.join(hot, "sh", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (sh.alias("a").join(sh.alias("b"), "sh")
             .filter(F.col("a.id") < F.col("b.id"))
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    return (inter
            .join(sizes.withColumnRenamed("id", "id_a")
                       .withColumnRenamed("sz", "sz_a"), "id_a")
            .join(sizes.withColumnRenamed("id", "id_b")
                       .withColumnRenamed("sz", "sz_b"), "id_b")
            .select("id_a", "id_b",
                    F.round(F.col("inter") /
                            (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                            4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3, num_hashes: int = 32) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures, fully JVM-side."""
    sh = df.select(F.col(id_col).alias("id"),
                   shingles(F.col(text_col), n).alias("shs"))
    sig = F.array(*[
        F.array_min(F.transform(
            F.col("shs"), lambda s, seed=i: F.xxhash64(s, F.lit(seed))))
        for i in range(num_hashes)])
    return sh.select("id", sig.alias("sig"))


def minhash_lsh_candidates(signatures: DataFrame, bands: int = 8) -> DataFrame:
    """Band the signatures and emit co-bucketed candidate pairs."""
    num_hashes = None  # derived per-row via slice
    rows_per_band = F.floor(F.size("sig") / bands).cast("int")
    banded = signatures.select(
        "id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(F.concat_ws(
                ",", F.transform(
                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                    lambda v: v.cast("string")))))).alias("band", "bucket"))
    return (banded.alias("a")
            .join(banded.alias("b"), ["band", "bucket"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())


def minhash_similarity(signatures: DataFrame,
                       candidates: DataFrame) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of equal minhashes."""
    sigs = signatures
    return (candidates
            .join(sigs.withColumnRenamed("id", "id_a")
                      .withColumnRenamed("sig", "sig_a"), "id_a")
            .join(sigs.withColumnRenamed("id", "id_b")
                      .withColumnRenamed("sig", "sig_b"), "id_b")
            .select("id_a", "id_b",
                    F.round(
                        F.size(F.filter(
                            F.zip_with("sig_a", "sig_b",
                                       lambda x, y: x == y),
                            lambda eq: eq)) / F.size("sig_a"),
                        4).alias("est_jaccard")))


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             num_planes: int = 0) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine ≥ t).

    ``num_planes=0`` — exact all-pairs (the small-N / verification
    path); ``num_planes>0`` — candidates restricted to co-bucketed rows
    under random-hyperplane LSH first (the 100 TB path: the pair join is
    on the bucket key, linear candidate generation).
    """
    from .similarity import _planes, cosine, lsh_bucket

    base = embeddings.select(F.col(id_col).alias("id"),
                             F.col(vec_col).cast("array<double>")
                             .alias("vec"))
    if num_planes:
        dim = len(base.first()["vec"])
        planes = _planes(dim, num_planes)
        base = base.withColumn("bucket", lsh_bucket(F.col("vec"), planes))
        pairs = (base.alias("a").join(base.alias("b"), "bucket")
                 .filter(F.col("a.id") < F.col("b.id")))
    else:
        pairs = (base.alias("a").join(
            base.alias("b"), F.col("a.id") < F.col("b.id")))
    return (pairs.select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        F.floor(cosine(F.col("a.vec"), F.col("b.vec")) * 10000)
         .cast("double").alias("cosine_e4"))
        .filter(F.col("cosine_e4") >= threshold * 10000)
        .select("id_a", "id_b", (F.col("cosine_e4") / 10000).alias("cosine")))


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: sign-sum of token-hash bits."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # One vote expression per bit position (b is a plain int: shift
    # amounts must be literals for whole-stage codegen).
    def vote_fn(mask):
        # exactly-2-arg lambda (PySpark infers HOF arity from the
        # signature, so the mask must be closed over, not defaulted)
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, F.lit(1)).otherwise(F.lit(-1))

    sig = F.lit(0).cast("long")
    for b in range(64):
        # two's-complement literal: bit 63 is the (negative) sign bit
        mask = (1 << b) - (1 << 64 if b == 63 else 0)
        vote = F.aggregate(hashes, F.lit(0), vote_fn(mask))
        sig = sig + F.when(vote > 0,
                           F.lit(mask).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col).alias("id"), sig.alias("simhash"))


def simhash_near_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs within Hamming distance k (popcount via bit_count)."""
    return (sigs.alias("a").crossJoin(sigs.alias("b"))
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.bit_count(F.col("a.simhash")
                                .bitwiseXOR(F.col("b.simhash")))
                    .alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))
