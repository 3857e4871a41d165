"""Transitive closure over edge relations (skosify ``transitive=True``).

The reference reaches this capability through its ``--skosify cfg``
post-pass (/root/reference/mc2skos/mc2skos.py:198-201 with
/root/reference/examples/skosify.cfg:3 setting ``transitive=True`` —
skosify materializes ``skos:broaderTransitive`` from the broader
hierarchy).  Spark-first this is the classic iterative-doubling join:

    paths₀ = edges
    pathsₙ₊₁ = distinct(pathsₙ ∪ (pathsₙ ⋈ pathsₙ))

Path length doubles per round, so the driver loop runs O(log diameter)
rounds; each round is one self-join + one dedup shuffle, lineage is cut
with ``localCheckpoint`` (same loop discipline as the connected-
components operator, ``operators/canonicalize.py:95``), and convergence
is a driver-side count comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def transitive_closure(edges: DataFrame, max_rounds: int = 20,
                       loop_partitions: int | None = None) -> DataFrame:
    """(src, dst) edge list → all (src, dst) pairs connected by a
    directed path of ≥1 edges.  Cycles are safe (a node never pairs
    with itself unless the input contains a genuine cycle).

    Like the union-find loop, the iteration runs at its own shuffle
    width scaled to the materialized path count (~1M rows/partition,
    floor 8) — per-round task overhead dominates small iterative jobs,
    while a 100× bigger edge list gets proportional width.
    """
    paths = (edges.select("src", "dst").distinct()
             .localCheckpoint())
    n = paths.count()
    spark = edges.sparkSession
    if loop_partitions is None:
        loop_partitions = max(8, n // 1_000_000)
    shuffle_conf = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(shuffle_conf)
    spark.conf.set(shuffle_conf, str(loop_partitions))
    try:
        for _ in range(max_rounds):
            hops = (paths.alias("a")
                    .join(paths.alias("b"),
                          F.col("a.dst") == F.col("b.src"))
                    .select(F.col("a.src").alias("src"),
                            F.col("b.dst").alias("dst")))
            grown = (paths.unionByName(hops).distinct()
                     .localCheckpoint())
            m = grown.count()
            paths = grown
            if m == n:   # fixpoint: no new reachable pair this round
                break
            n = m
    finally:
        spark.conf.set(shuffle_conf, saved)
    return paths


def broader_transitive(triples: DataFrame,
                       skos_ns: str = "http://www.w3.org/2004/02/skos/core#"
                       ) -> DataFrame:
    """Materialize ``skos:broaderTransitive`` triples from the asserted
    ``skos:broader`` edges — the Spark counterpart of skosify's
    hierarchical transitive inference."""
    edges = (triples
             .filter((F.col("pred") == skos_ns + "broader") &
                     ~F.col("obj_is_literal"))
             .select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
    closure = transitive_closure(edges)
    return closure.select(
        F.col("src").alias("subj"),
        F.lit(skos_ns + "broaderTransitive").alias("pred"),
        F.col("dst").alias("obj"),
        F.lit(False).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("int").alias("component_pos"),
        F.lit(None).cast("string").alias("record_id"))
