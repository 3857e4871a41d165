"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — brute-force exact top-k: JVM-side dot product
  via ``F.zip_with``/``F.aggregate``; the baseline every ANN variant is
  measured against.
* :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH
  buckets (signs of dot products with seeded pseudo-random planes),
  candidates restricted to the query's bucket (and neighbors via
  multi-probe), then exact re-rank.  At 100 TB the bucket join replaces
  the full cross product; bucketing is a narrow map + one equi-join.
* :func:`ivf_topk` — IVF-style: k-means-lite centroid assignment
  (centroids sampled deterministically), probe the ``nprobe`` closest
  centroids only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    # try_divide: a zero-magnitude vector yields NULL→0.0 instead of an
    # ANSI DIVIDE_BY_ZERO that would kill the whole query (parity with
    # the Python helper in ivf_topk)
    return F.coalesce(F.try_divide(_dot(a, b), _norm(a) * _norm(b)),
                      F.lit(0.0))


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 4)
         .alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def _planes(dim: int, num_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy dependency in
    the plan; values from a fixed LCG so both tests and docs can
    reproduce them)."""
    state = seed
    planes = []
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id for a vector column."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(vec_col.cast("array<double>"), p) >= 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return bucket


def lsh_bucketed_topk(embeddings: DataFrame, query_vec: list[float],
                      k: int = 10, num_planes: int = 8,
                      multiprobe: int = 1,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: exact re-rank within the query's LSH bucket plus all
    buckets within Hamming distance ``multiprobe`` (multi-probe LSH —
    recall rises steeply per probe while candidates stay a tiny fraction
    of the corpus)."""
    dim = len(query_vec)
    planes = _planes(dim, num_planes)
    bucketed = embeddings.withColumn("bucket",
                                     lsh_bucket(F.col(vec_col), planes))
    qbits = 0
    for i, plane in enumerate(planes):
        if sum(px * qx for px, qx in zip(plane, query_vec)) >= 0:
            qbits |= (1 << i)
    probes = {qbits}
    frontier = {qbits}
    for _ in range(multiprobe):
        frontier = {b ^ (1 << i) for b in frontier for i in range(num_planes)}
        probes |= frontier
    candidates = bucketed.filter(F.col("bucket").isin([*probes]))
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def unit_vector(vec_col) -> "F.Column":
    """Unit-normalized copy of a double-array column (zero vector →
    zeros).  The norm is bound to a lambda variable so it is computed
    ONCE per row — a plain ``transform(v, x -> x / _norm(v))`` would
    re-evaluate the norm subtree per element (Catalyst does not CSE
    into HOF lambda bodies).  Pre-normalizing once per row turns every
    downstream cosine into a single dot product."""
    return F.aggregate(
        F.array(_norm(vec_col)), F.array().cast("array<double>"),
        lambda acc, nrm: F.transform(
            vec_col, lambda x: F.coalesce(F.try_divide(x, nrm),
                                          F.lit(0.0))))


def centroid_assign_normalized(unit_vec_col,
                               unit_centroids: list[tuple]) -> "F.Column":
    """Nearest-centroid id for a PRE-NORMALIZED vector column against
    pre-normalized centroids: cosine degenerates to one dot product per
    centroid (ties → larger cid, same as :func:`centroid_assign`)."""
    entries = F.array(*[
        F.struct(_dot(unit_vec_col,
                      F.array(*[F.lit(x) for x in cvec])).alias("s"),
                 F.lit(cid).alias("cid"))
        for cid, cvec in unit_centroids])
    return F.array_max(entries)["cid"]


def centroid_assign(vec_col, centroids: list[tuple]) -> "F.Column":
    """Nearest-centroid id (by cosine; ties → larger cid) for a vector
    column, as ONE linear expression.

    argmax via ``array_max`` over (score, cid) structs: the expression
    tree stays LINEAR in num_centroids.  (A chained
    ``when(score > best).otherwise(best)`` references the accumulated
    tree twice per centroid — 2^k nodes, OOM at plan build for k=16.)
    """
    entries = F.array(*[
        F.struct(cosine(vec_col, F.array(*[F.lit(x) for x in cvec]))
                  .alias("s"),
                 F.lit(cid).alias("cid"))
        for cid, cvec in centroids])
    return F.array_max(entries)["cid"]


def arithmetic_centroids(embeddings: DataFrame, num_centroids: int,
                         centroid_mod: int = 8,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> list[tuple]:
    """Deterministic centroid pick that an ANSI-SQL oracle can mirror:
    the ``num_centroids`` smallest ids of the arithmetic slice
    ``id % centroid_mod == 0``.  Like the xxhash slice in
    :func:`ivf_topk`, the rank happens WITHIN the slice only (a
    metadata-scale TakeOrdered after a cheap filter scan, never a
    full-corpus sort); unlike it, the slice predicate is plain modulo,
    so DuckDB reproduces the exact same centroids."""
    rows = (embeddings
            .filter(F.col(id_col) % centroid_mod == 0)
            .orderBy(id_col)
            .limit(num_centroids)
            .select(F.col(id_col).alias("cid"),
                    F.col(vec_col).alias("cvec"))
            .collect())
    if not rows:
        raise ValueError("arithmetic_centroids: empty centroid slice")
    return [(r["cid"], [float(x) for x in r["cvec"]]) for r in rows]


def ivf_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             num_centroids: int = 16, nprobe: int = 4,
             sample_mod: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-lite ANN: deterministic sampled centroids, probe the nprobe
    nearest lists, exact re-rank inside them.

    Centroid pick: a deterministic hash slice (``xxhash64(id) %
    sample_mod == 0`` — a Bernoulli sample that, unlike ``df.sample``,
    is independent of how the scan happened to be partitioned) followed
    by a TakeOrdered *within the slice only*.  Nothing hash-ranks the
    full corpus; the full scan touches each row once with a cheap
    filter.  Size ``sample_mod`` so corpus/sample_mod is comfortably ≥
    num_centroids but small — at 100 TB something like 2**20 keeps the
    ranked slice metadata-scale.
    """
    sample = (embeddings
              .filter(F.pmod(F.xxhash64(F.col(id_col)),
                             F.lit(sample_mod)) == 0)
              .orderBy(F.xxhash64(F.col(id_col)))
              .limit(num_centroids)
              .select(F.col(id_col).alias("cid"),
                      F.col(vec_col).alias("cvec"))
              .collect())
    if len(sample) < num_centroids:
        # thin slice → the corpus is at most ~sample_mod*num_centroids
        # rows, where the pre-slice full TakeOrdered is cheap anyway
        # (a mis-sized sample_mod on a big corpus pays that rank once
        # rather than returning degraded centroids silently)
        sample = (embeddings.orderBy(F.xxhash64(F.col(id_col)))
                  .limit(num_centroids)
                  .select(F.col(id_col).alias("cid"),
                          F.col(vec_col).alias("cvec"))
                  .collect())
    if not sample:
        raise ValueError("ivf_topk: empty embeddings input")
    # keep the native id value — the API supports non-numeric id_col
    centroids = [(r["cid"], [float(x) for x in r["cvec"]])
                 for r in sample]

    def cos_py(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = sum(x * x for x in a) ** 0.5
        db = sum(y * y for y in b) ** 0.5
        return num / (da * db) if da and db else 0.0

    probe = sorted(centroids, key=lambda c: -cos_py(c[1], query_vec))[:nprobe]
    probe_ids = [cid for cid, _ in probe]

    assigned = embeddings.withColumn(
        "centroid",
        centroid_assign(F.col(vec_col).cast("array<double>"), centroids))
    candidates = assigned.filter(F.col("centroid").isin(probe_ids))
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)
