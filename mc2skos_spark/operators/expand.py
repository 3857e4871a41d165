"""G2 — SKOS inference expansion (the ``--expand`` post-pass).

The reference delegates to skosify (/root/reference/mc2skos/mc2skos.py:
192-196: ``skos_related`` symmetrizes related, ``skos_topConcept`` adds
hasTopConcept inverses, ``skos_hierarchical(narrower=True)`` adds
narrower inverses; asserted by test/test_skosify.py:19-23).

Spark-first this is a pure inverse-edge projection — ``select(obj,
inverse_pred, subj)`` + union + set-dedup.  No join, no Python; one
map-side projection and the shared dedup hash-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core import constants as C

# Bidirectional, mirroring skosify.infer: skos_related symmetrizes,
# skos_hierarchical(narrower=True) ensures BOTH broader→narrower and
# narrower→broader (authority 5XX $w='h' records emit skos:narrower
# directly, so the inverse broader edge must be inferred too), and
# skos_topConcept keeps topConceptOf/hasTopConcept in sync both ways.
# The map itself lives in core.constants (shared with the Spark-free
# library surface, core/api.py).
_INVERSES = C.SKOS_INVERSES


def expand_inferred(triples: DataFrame) -> DataFrame:
    """Return triples ∪ inferred inverse edges, deduplicated."""
    return _expand(triples, _INVERSES)


def expand_hierarchical(triples: DataFrame) -> DataFrame:
    """The hierarchical slice only — broader <-> narrower inverses
    (skosify.infer.skos_hierarchical, the ``narrower=True`` key in a
    skosify config file) without touching related/topConcept."""
    hier = {p: q for p, q in _INVERSES.items()
            if p.endswith("#broader") or p.endswith("#narrower")}
    return _expand(triples, hier)


def _expand(triples: DataFrame, inverses: dict) -> DataFrame:
    mapping = F.create_map(
        *[F.lit(x) for pair in inverses.items() for x in pair])
    inverses = (
        triples
        .filter(F.col("pred").isin(list(inverses)) &
                ~F.col("obj_is_literal"))
        .select(
            F.col("obj").alias("subj"),
            mapping[F.col("pred")].alias("pred"),
            F.col("subj").alias("obj"),
            F.lit(False).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("int").alias("component_pos"),
            F.col("record_id"),
        )
    )
    return (triples.unionByName(inverses)
            .dropDuplicates(["subj", "pred", "obj", "obj_lang",
                             "obj_datatype", "component_pos"]))
