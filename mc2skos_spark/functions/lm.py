"""Language-model quality filtering for training-data pipelines.

The CCNet-style corpus filter (Wenzek et al. 2020): score every
document by its negative log-likelihood under a unigram language model
and gate on the score — documents far from the reference distribution
(boilerplate, lorem-ipsum, non-language noise) score high and are
dropped.  CCNet uses a 5-gram KenLM; the distributed re-expression here
is the unigram member of that family (the n-gram generalization is the
same join with :func:`~mc2skos_spark.functions.textstats.word_ngrams`
keys), which is what the scale shape — not the smoothing order — is
about.

Scale shape (100 TB):

* the corpus is tokenized ONCE into a per-document **distinct-token**
  frequency table ``(doc_id, token, tf)`` — Heaps' law makes that table
  far smaller than the raw token stream, and it is the only thing that
  shuffles;
* the LM itself is vocabulary-sized.  Self-training (``lm=None``)
  derives it from the same tf table with one extra aggregate — no
  second corpus scan; production passes a precomputed ``(token, cnt)``
  reference-corpus table and the score join is a plain equi-join on
  ``token`` (AQE broadcasts it when the vocabulary fits);
* per-token log-probabilities are **floor-truncated to 1e-4 and summed
  as integers** — a double sum per document would be summation-order-
  dependent and could differ between Spark and the DuckDB oracle in the
  last ulp (the same discipline as
  :mod:`mc2skos_spark.functions.retrieval`).

Laplace (add-1) smoothing keeps every probability finite, so an OOV
token under an external LM scores ``ln(1 / (total + V))`` rather than
-inf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mc2skos_spark.functions.textstats import tokens

SCALE = 10_000


def doc_term_freq(documents: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document distinct-token frequencies ``(id, token, tf)``:
    lowercased whitespace tokens, one row per (doc, distinct token).
    Documents with no tokens contribute no rows."""
    return (documents
            .select(F.col(id_col),
                    F.explode(tokens(F.lower(F.col(text_col))))
                    .alias("token"))
            .groupBy(id_col, "token")
            .agg(F.count(F.lit(1)).cast("long").alias("tf")))


def unigram_lm(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Train a unigram LM: corpus-wide ``(token, cnt)`` counts.  In
    production this is written once per reference-corpus snapshot and
    passed to :func:`lm_nll_scores` for every scoring run."""
    return (doc_term_freq(documents, text_col=text_col)
            .groupBy("token")
            .agg(F.sum("tf").alias("cnt")))


def lm_nll_scores(documents: DataFrame, lm: DataFrame | None = None,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document unigram negative log-likelihood under ``lm``.

    Returns ``(id_col, n_tokens, nll_q, avg_nll)`` where ``nll_q`` is
    the exact integer sum of 1e-4-quantized per-token NLLs (long —
    order-independent, so the hash-compare is deterministic under any
    shuffle order) and ``avg_nll`` = per-token average in nats, floor-
    truncated to 4 decimals.  Higher = less like the LM's corpus; gate
    with ``.filter(F.col("avg_nll") <= cutoff)``.

    ``lm=None`` self-trains on ``documents`` (the "score the corpus by
    itself" diagnostic); passing a precomputed ``(token, cnt)`` table is
    the production path and skips the extra aggregate.  The external
    table must have ONE row per token (what :func:`unigram_lm`
    produces) — duplicate token rows would fan out the score join.
    Empty documents have no tokens and therefore no score row.
    """
    tf = doc_term_freq(documents, id_col, text_col)
    if lm is None:
        # one extra aggregate over the SAME tf table — the corpus scan
        # is not repeated; lineage-cut so tf materializes once for both
        # the LM aggregate and the scoring join
        tf = tf.localCheckpoint(eager=False)
        lm = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
        # lm feeds BOTH the stats aggregate and the logp table — cut
        # the lineage so the vocab aggregate (its token-keyed shuffle)
        # runs once, not once per consumer
        lm = lm.localCheckpoint(eager=False)

    stats = lm.agg(F.sum("cnt").cast("long").alias("total"),
                   F.count(F.lit(1)).cast("long").alias("v"))
    # add-1 smoothed, quantized per-token log-prob (negative long).
    # (cnt+1)/(total+v) is one IEEE double division of exact integers —
    # identical in every engine; ln parity at 1e-4 truncation is the
    # same bet retrieval.py's BM25 idf already wins.
    logp = (lm.crossJoin(F.broadcast(stats))
            .select("token",
                    F.floor(F.log((F.col("cnt") + 1.0)
                                  / (F.col("total") + F.col("v")))
                            * SCALE)
                    .cast("long").alias("lp")))

    # OOV under an external LM: cnt = 0 → ln(1/(total+v)) via the
    # 1-row broadcast stats frame; the coalesce never fires for a
    # self-trained LM
    scored = (tf.join(logp, "token", "left")
              .crossJoin(F.broadcast(stats))
              .select(
                  F.col(id_col), "tf",
                  F.coalesce(
                      F.col("lp"),
                      F.floor(F.log(1.0 / (F.col("total")
                                           + F.col("v"))) * SCALE)
                      .cast("long")).alias("lp")))

    return (scored
            .groupBy(id_col)
            .agg(F.sum("tf").alias("n_tokens"),
                 (-F.sum(F.col("tf") * F.col("lp"))).alias("nll_q"),
                 (F.floor(-F.sum(F.col("tf") * F.col("lp"))
                          / F.sum("tf")) / F.lit(float(SCALE)))
                 .alias("avg_nll")))


def doc_bigram_freq(documents: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document distinct-transition frequencies
    ``(id, w1, w2, tf)`` over consecutive lowercased whitespace tokens.
    Documents with fewer than two tokens contribute no rows."""
    col = F.col(text_col)

    def pairs_of(tk):
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - 1, F.lit(0)))
        full = F.transform(
            idx, lambda i: F.struct(F.element_at(tk, i).alias("w1"),
                                    F.element_at(tk, i + 1).alias("w2")))
        return F.when(F.size(tk) >= 2, full).otherwise(
            F.array().cast("array<struct<w1:string,w2:string>>"))

    from mc2skos_spark.functions.textstats import _once
    pairs = _once(tokens(F.lower(col)), pairs_of,
                  F.array().cast("array<struct<w1:string,w2:string>>"))
    return (documents
            .select(F.col(id_col), F.explode(pairs).alias("p"))
            .select(F.col(id_col), F.col("p.w1").alias("w1"),
                    F.col("p.w2").alias("w2"))
            .groupBy(id_col, "w1", "w2")
            .agg(F.count(F.lit(1)).cast("long").alias("tf")))


def bigram_nll_scores(documents: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      lam: float = 0.5) -> DataFrame:
    """Per-document NLL under a self-trained INTERPOLATED bigram LM —
    the conditional-model step toward CCNet's 5-gram KenLM, with the
    same scale shape as :func:`lm_nll_scores` one order up:

        p(w2 | w1) = lam·(c2(w1,w2)+1)/(c1(w1)+V)
                   + (1−lam)·(c1(w2)+1)/(total+V)

    (add-1 in both terms keeps everything finite; the interpolation is
    the standard stupid-backoff-ish smoothing).  Only transitions are
    scored (n−1 terms per doc); docs with <2 tokens get no row.

    Scale shape: the corpus shuffles as the per-doc DISTINCT-transition
    table (Heaps' law again); the bigram-vocab logp table is built with
    two unigram-count joins and equi-joins back on (w1, w2).  Per-
    transition logps are 1e-4-quantized and summed as LONGS — and the
    interpolated probability is the same literal expression tree in
    Spark and the DuckDB oracle, so the one-IEEE-op-per-step argument
    carries through the +.

    Returns ``(id_col, n_transitions, nll2_q, avg_nll2)``.
    """
    tf2 = doc_bigram_freq(documents, id_col, text_col)
    tf2 = tf2.localCheckpoint(eager=False)      # feeds c2 + scoring
    tf1 = doc_term_freq(documents, id_col, text_col)
    lm1 = tf1.groupBy("token").agg(F.sum("tf").alias("cnt"))
    lm1 = lm1.localCheckpoint(eager=False)      # feeds stats + 2 joins
    c2 = tf2.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    stats = lm1.agg(F.sum("cnt").cast("long").alias("total"),
                    F.count(F.lit(1)).cast("long").alias("v"))

    lam = float(lam)
    logp = (c2
            .join(lm1.select(F.col("token").alias("w1"),
                             F.col("cnt").alias("c1w1")), "w1")
            .join(lm1.select(F.col("token").alias("w2"),
                             F.col("cnt").alias("c1w2")), "w2")
            .crossJoin(F.broadcast(stats))
            .select("w1", "w2",
                    F.floor(F.log(
                        lam * ((F.col("c2") + 1.0)
                               / (F.col("c1w1") + F.col("v")))
                        + (1.0 - lam) * ((F.col("c1w2") + 1.0)
                                         / (F.col("total") + F.col("v")))
                    ) * SCALE).cast("long").alias("lp")))

    return (tf2.join(logp, ["w1", "w2"])
            .groupBy(id_col)
            .agg(F.sum("tf").alias("n_transitions"),
                 (-F.sum(F.col("tf") * F.col("lp"))).alias("nll2_q"),
                 (F.floor(-F.sum(F.col("tf") * F.col("lp"))
                          / F.sum("tf")) / F.lit(float(SCALE)))
                 .alias("avg_nll2")))


def doc_trigram_freq(documents: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document distinct trigram-transition frequencies
    ``(id, w1, w2, w3, tf)`` over consecutive lowercased whitespace
    tokens.  Documents with fewer than three tokens contribute no
    rows."""
    col = F.col(text_col)
    empty = F.array().cast("array<struct<w1:string,w2:string,w3:string>>")

    def triples_of(tk):
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - 2, F.lit(0)))
        full = F.transform(
            idx, lambda i: F.struct(F.element_at(tk, i).alias("w1"),
                                    F.element_at(tk, i + 1).alias("w2"),
                                    F.element_at(tk, i + 2).alias("w3")))
        return F.when(F.size(tk) >= 3, full).otherwise(empty)

    from mc2skos_spark.functions.textstats import _once
    triples = _once(tokens(F.lower(col)), triples_of, empty)
    return (documents
            .select(F.col(id_col), F.explode(triples).alias("p"))
            .select(F.col(id_col), F.col("p.w1").alias("w1"),
                    F.col("p.w2").alias("w2"), F.col("p.w3").alias("w3"))
            .groupBy(id_col, "w1", "w2", "w3")
            .agg(F.count(F.lit(1)).cast("long").alias("tf")))


def trigram_nll_scores(documents: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       lam3: float = 0.5,
                       lam2: float = 0.25) -> DataFrame:
    """Per-document NLL under a self-trained INTERPOLATED trigram LM —
    the induction step from :func:`bigram_nll_scores` toward CCNet's
    5-gram KenLM (Wenzek et al. 2020), demonstrating that the
    distinct-transition Heaps-table shape generalizes order by order:

        p(w3 | w1,w2) = lam3·(c3(w1,w2,w3)+1)/(c2(w1,w2)+V)
                      + lam2·(c2(w2,w3)+1)/(c1(w2)+V)
                      + (1−lam3−lam2)·(c1(w3)+1)/(total+V)

    (add-1 everywhere keeps probabilities finite; defaults 0.5/0.25
    leave an exactly-representable 0.25 unigram weight so the literal
    expression tree is bit-identical in the DuckDB oracle).  Only full
    trigram transitions are scored (n−2 terms per doc); docs with <3
    tokens get no row.

    Scale shape: one corpus tokenization feeding the per-doc distinct
    TRIGRAM table (the only corpus-scale shuffle; Heaps' law keeps it
    far below the raw token stream), corpus-wide c3/c2/c1 tables built
    by re-aggregating it, equi-joins back on the n-gram keys (AQE
    broadcasts the vocab-sized sides), per-transition logps
    1e-4-quantized and summed as LONGS — the identical discipline as
    the unigram and bigram members.

    Returns ``(id_col, n_transitions3, nll3_q, avg_nll3)``.
    """
    lam3, lam2 = float(lam3), float(lam2)
    lam1 = 1.0 - lam3 - lam2
    tf3 = doc_trigram_freq(documents, id_col, text_col)
    tf3 = tf3.localCheckpoint(eager=False)      # feeds c3/c2 + scoring
    tf1 = doc_term_freq(documents, id_col, text_col)
    lm1 = tf1.groupBy("token").agg(F.sum("tf").alias("cnt"))
    lm1 = lm1.localCheckpoint(eager=False)      # feeds stats + 2 joins
    # context bigram counts derived from the trigram table would MISS
    # each document's final bigram, so count them from their own pass
    # over the bigram transitions (still Heaps-table scale)
    tf2 = doc_bigram_freq(documents, id_col, text_col)
    c2 = tf2.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    c2 = c2.localCheckpoint(eager=False)        # context + continuation
    c3 = tf3.groupBy("w1", "w2", "w3").agg(F.sum("tf").alias("c3"))
    stats = lm1.agg(F.sum("cnt").cast("long").alias("total"),
                    F.count(F.lit(1)).cast("long").alias("v"))

    logp = (c3
            .join(c2.select(F.col("w1"), F.col("w2"),
                            F.col("c2").alias("c2ctx")), ["w1", "w2"])
            .join(c2.select(F.col("w1").alias("w2"),
                            F.col("w2").alias("w3"),
                            F.col("c2").alias("c2cont")), ["w2", "w3"])
            .join(lm1.select(F.col("token").alias("w2"),
                             F.col("cnt").alias("c1w2")), "w2")
            .join(lm1.select(F.col("token").alias("w3"),
                             F.col("cnt").alias("c1w3")), "w3")
            .crossJoin(F.broadcast(stats))
            .select("w1", "w2", "w3",
                    F.floor(F.log(
                        lam3 * ((F.col("c3") + 1.0)
                                / (F.col("c2ctx") + F.col("v")))
                        + lam2 * ((F.col("c2cont") + 1.0)
                                  / (F.col("c1w2") + F.col("v")))
                        + lam1 * ((F.col("c1w3") + 1.0)
                                  / (F.col("total") + F.col("v")))
                    ) * SCALE).cast("long").alias("lp")))

    return (tf3.join(logp, ["w1", "w2", "w3"])
            .groupBy(id_col)
            .agg(F.sum("tf").alias("n_transitions3"),
                 (-F.sum(F.col("tf") * F.col("lp"))).alias("nll3_q"),
                 (F.floor(-F.sum(F.col("tf") * F.col("lp"))
                          / F.sum("tf")) / F.lit(float(SCALE)))
                 .alias("avg_nll3")))
