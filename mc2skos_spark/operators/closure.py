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

    Like the union-find loop, the per-round self-join runs at its own
    explicit width scaled to the materialized path count (~1M rows/
    partition, floor 8, re-derived per round as the path set doubles):
    both join inputs are ``repartition(width, join_key)``-ed, which
    REPLACES the exchange the join would have planned anyway — the
    session's ``spark.sql.shuffle.partitions`` is never read-modified,
    so concurrent queries on a shared session keep their own width.
    The grow-step ``distinct`` stays at session width (AQE coalesces;
    map-side partial combine applies).
    """
    paths = (edges.select("src", "dst").distinct()
             .localCheckpoint())
    # no up-front count job: the first round's count seeds n.  Round 1
    # therefore has no explicit width — the join plans its own
    # exchanges at session width and AQE right-sizes them from runtime
    # statistics, which is exactly what an unknown-size input needs (a
    # fixed floor width here would funnel a huge first-round self-join
    # through too few tasks).  From round 2 on, the counted path size
    # drives the explicit width as before.
    n = -1
    fixed_width = loop_partitions is not None
    for _ in range(max_rounds):
        if fixed_width:
            width = loop_partitions
        elif n < 0:
            width = None            # round 1: planner + AQE decide
        else:
            width = max(8, n // 1_000_000)
        left = paths.repartition(width, "dst") if width else paths
        right = paths.repartition(width, "src") if width else paths
        hops = (left.alias("a")
                .join(right.alias("b"),
                      F.col("a.dst") == F.col("b.src"))
                .select(F.col("a.src").alias("src"),
                        F.col("b.dst").alias("dst")))
        # LAZY checkpoint + count: the count action itself materializes
        # the round (one Spark job per round, not two) — at bench scale
        # iterative-loop wall time is job count, not data (CLAUDE.md)
        grown = (paths.unionByName(hops).distinct()
                 .localCheckpoint(eager=False))
        m = grown.count()
        paths = grown
        if m == n:   # fixpoint: no new reachable pair this round
            break
        n = m
    return paths


def cycle_members(edges: DataFrame, max_rounds: int = 20,
                  loop_partitions: int | None = None) -> DataFrame:
    """Vertices that lie on a directed cycle: ``(vertex)``.

    A vertex is on a cycle iff it reaches itself through ≥1 edge, i.e.
    the transitive closure contains the pair (v, v) — so this reuses
    the doubling loop verbatim and filters the diagonal.  This is the
    first slice of the skosify *validation* pass the reference reaches
    via ``--skosify`` (/root/reference/mc2skos/mc2skos.py:198-201:
    skosify's hierarchy checks reject ``skos:broader`` cycles); here it
    feeds the warning side-channel instead of a hard failure.
    """
    closure = transitive_closure(edges, max_rounds, loop_partitions)
    return (closure.filter(F.col("src") == F.col("dst"))
            .select(F.col("src").alias("vertex")))


def broader_cycle_warnings(triples: DataFrame,
                           skos_ns: str =
                           "http://www.w3.org/2004/02/skos/core#"
                           ) -> DataFrame:
    """``skos:broader`` cycle report in the warning-channel shape
    ``(record_id, reason)`` — a concept hierarchy must be a DAG, so any
    URI on a broader-cycle is flagged (skosify's hierarchy-cycle check,
    warn-and-report rather than throw, matching the P7/P8 policy)."""
    edges = (triples
             .filter((F.col("pred") == skos_ns + "broader") &
                     ~F.col("obj_is_literal"))
             .select(F.col("subj").alias("src"),
                     F.col("obj").alias("dst")))
    return cycle_members(edges).select(
        F.col("vertex").alias("record_id"),
        F.lit("skos:broader cycle").alias("reason"))


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
