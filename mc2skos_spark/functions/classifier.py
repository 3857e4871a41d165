"""fastText-style linear quality classifier over hashed n-gram features.

The CCNet / LLaMA-pipeline corpus gate: a linear classifier trained to
recognize "wiki-like" text (fastText supervised in the papers) scores
every pool document, and only documents above a threshold survive.
Re-expressed Spark-first in two halves:

* :func:`linear_text_scores` — INFERENCE as pure relational ops: the
  per-document hashed {1,2}-gram bucket counts (the same one-scan
  feature table DSIR uses — ``functions/dsir.py:hashed_ngram_buckets``)
  equi-join a broadcast ``(bucket, w_q)`` weight table, and the
  decision statistic is the exact integer logit
  ``logit_q = bias_q + Σ_b cnt_b · w_q[b]``.  Sigmoid is monotone, so
  gating on ``logit_q ≥ τ_q`` IS gating on the model probability —
  with no cross-engine ``exp()`` parity bet and no floats anywhere:
  the driver oracle hash-matches the scores under any shuffle order.
  At 100 TB this is one corpus scan, a ≤ buckets-row broadcast, and a
  per-doc integer aggregate — model scoring as a broadcast join.
* :func:`train_quality_classifier` — TRAINING via ``pyspark.ml``
  LogisticRegression over the same bucket-count vectors: LBFGS on a
  buckets-dim problem is a driver-side optimization over distributed
  gradient aggregates, exactly what MLlib is for.  Returns the
  quantized weight rows :func:`linear_text_scores` consumes, so the
  train → quantize → relational-inference loop is closed (pytest
  proves the quantized relational scorer reproduces the MLlib model's
  decisions on a margin-separated corpus).

Quantization: weights/bias are floor-scaled by 1e4 (the repo-wide
``SCALE`` discipline).  A count-weighted sum of 1e-4-quantized weights
differs from the float logit by < 1e-4·n_grams — negligible against
any real decision margin, and in exchange the score is exactly
reproducible across engines, shuffles and reruns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mc2skos_spark.functions.dsir import SCALE, hashed_ngram_buckets


def linear_text_scores(documents: DataFrame,
                       weights: dict[int, int],
                       bias_q: int = 0,
                       buckets: int = 256,
                       id_col: str = "doc_id",
                       text_col: str = "text",
                       hash_fn: str = "md5") -> DataFrame:
    """Score every document with a linear model over hashed
    {1,2}-gram bucket counts.

    ``weights`` maps bucket id → 1e-4-quantized integer weight
    (buckets absent from the map weigh 0); ``bias_q`` is the quantized
    intercept.  Returns ``(id_col, n_grams, logit_q, keep)`` where
    ``logit_q = bias_q + Σ cnt·w_q`` is an exact long and ``keep`` is
    the ``logit_q >= 0`` gate verdict.  Documents with no tokens get
    no row (no features → no evidence; gate them by length upstream).

    Plan: ZERO shuffle — the model is a plan-time constant, so the
    weight table is a ``buckets``-element literal array and the logit
    is a per-row long fold over the hashed gram-bucket ids (the
    occurrence-wise sum of weights is exactly the former cnt-weighted
    sum: long adds, any order).  One scan, one projection; round 7
    replaced the explode → (doc, bucket, cnt) aggregate → broadcast
    join → per-doc aggregate pipeline (two Exchanges) with this
    (guide §2.4).  Nothing here is model-serving infrastructure — the
    model IS a literal.
    """
    if not weights:
        raise ValueError("linear_text_scores: empty weight map")
    if hash_fn == "md5" and not 1 <= buckets <= 256:
        raise ValueError("linear_text_scores: md5 path needs buckets "
                         "in 1..256")
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"_bucket: unknown hash_fn {hash_fn!r}")
    bad = [b for b in weights if not 0 <= int(b) < buckets]
    if bad:
        raise ValueError("linear_text_scores: bucket ids outside "
                         "[0, %d): %s" % (buckets, sorted(bad)[:5]))
    from mc2skos_spark.functions.dsir import _bucket
    from mc2skos_spark.functions.textstats import word_grams12

    wmap = {int(b): int(w) for b, w in weights.items()}
    w_arr = F.array(*[F.lit(wmap.get(b, 0)).cast("long")
                      for b in range(int(buckets))])
    bks = F.transform(word_grams12(F.col(text_col)),
                      lambda g: _bucket(g, buckets, hash_fn))

    def scores_of(p):
        bk, wa = p["b"], p["w"]
        return F.struct(
            F.size(bk).cast("long").alias("n_grams"),
            (F.lit(int(bias_q)).cast("long")
             + F.aggregate(bk, F.lit(0).cast("long"),
                           lambda acc, b:
                           acc + F.element_at(wa, b + 1)))
            .alias("logit_q"))

    # bind the bucket array + weight literal once (repo HOF
    # discipline), expand the struct via inline so both output
    # columns come from ONE evaluation
    st = F.aggregate(
        F.array(F.struct(bks.alias("b"), w_arr.alias("w"))),
        F.lit(None).cast("struct<n_grams:bigint,logit_q:bigint>"),
        lambda acc, p: scores_of(p))
    return (documents
            .select(F.col(id_col), F.inline(F.array(st)))
            .filter(F.col("n_grams") > 0)
            .withColumn("keep", F.col("logit_q") >= 0))


def _bucket_vectors(documents: DataFrame, buckets: int,
                    id_col: str, text_col: str, label: Column,
                    hash_fn: str) -> DataFrame:
    """(id, label, features) rows for MLlib: per-doc bucket counts
    assembled into a dense ``buckets``-dim vector entirely JVM-side —
    a map→array expansion under whole-stage codegen feeding
    ``pyspark.ml.functions.array_to_vector``; no Python row loop
    anywhere (the repo-wide no-BatchEvalPython claim is plan-asserted
    in tests/test_classifier.py).  Dense is the right shape here: the
    feature space is the hashed-bucket table (≤ a few thousand), not a
    vocabulary — buckets × 8 bytes per doc is smaller than the text it
    came from.  ``try_element_at`` (NOT ``element_at``) because ANSI
    mode makes the latter THROW on absent map keys."""
    from pyspark.ml.functions import array_to_vector

    db = hashed_ngram_buckets(
        documents.withColumn("__label", label.cast("double")),
        buckets, id_col, text_col, keep_cols=["__label"],
        hash_fn=hash_fn)
    packed = (db.groupBy(id_col, "__label")
              .agg(F.map_from_entries(
                  F.sort_array(F.collect_list(
                      F.struct(F.col("bucket"), F.col("cnt")))))
                  .alias("__counts")))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(int(buckets) - 1)),
        lambda b: F.coalesce(
            F.try_element_at(F.col("__counts"), b),
            F.lit(0)).cast("double"))
    return packed.select(F.col(id_col), F.col("__label").alias("label"),
                         array_to_vector(dense).alias("features"))


def save_classifier(path: str, weights: dict[int, int], bias_q: int,
                    buckets: int = 256, hash_fn: str = "md5") -> None:
    """Persist a trained gate as one JSON file — the model IS a
    dimension table, so its wire format is a dict, not a model-server
    artifact.  Consumed by :func:`load_classifier` /
    ``jobs/curate.py --classifier-gate``."""
    import json
    with open(path, "w") as fp:
        json.dump({"weights": {str(b): int(w)
                               for b, w in sorted(weights.items())},
                   "bias_q": int(bias_q), "buckets": int(buckets),
                   "hash_fn": hash_fn}, fp)


def load_classifier(path: str) -> dict:
    """Load :func:`save_classifier` output as the keyword arguments
    :func:`linear_text_scores` takes (weights keys back to ints —
    JSON object keys are strings)."""
    import json
    with open(path) as fp:
        raw = json.load(fp)
    return {"weights": {int(b): int(w)
                        for b, w in raw["weights"].items()},
            "bias_q": int(raw["bias_q"]),
            "buckets": int(raw["buckets"]),
            "hash_fn": raw.get("hash_fn", "md5")}


def train_quality_classifier(documents: DataFrame, is_positive: Column,
                             buckets: int = 256,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             hash_fn: str = "md5",
                             reg_param: float = 0.0,
                             max_iter: int = 100) -> tuple[dict[int, int],
                                                           int]:
    """Train the gate: MLlib LogisticRegression over hashed-bucket
    count vectors, labels from the ``is_positive`` predicate (your
    trusted "wiki-like" slice vs the pool).  Returns
    ``(weights, bias_q)`` quantized for :func:`linear_text_scores` —
    the model leaves training as a plain dimension table, so inference
    at 100 TB is the relational plan above, not a model server.

    Docs with no tokens contribute nothing (no feature rows — same
    contract as scoring)."""
    from pyspark.ml.classification import LogisticRegression

    train = _bucket_vectors(documents, buckets, id_col, text_col,
                            is_positive, hash_fn)
    model = LogisticRegression(
        maxIter=int(max_iter), regParam=float(reg_param),
        standardization=False).fit(train)
    import math
    weights = {b: math.floor(float(w) * SCALE)
               for b, w in enumerate(model.coefficients) if w != 0.0}
    bias_q = math.floor(float(model.intercept) * SCALE)
    return weights, bias_q
