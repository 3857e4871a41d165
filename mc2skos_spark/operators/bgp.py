"""Basic-graph-pattern (BGP) matching over materialized triples —
the SELECT/WHERE core of SPARQL (Pérez, Arenas & Gutierrez,
"Semantics and Complexity of SPARQL", ISWC 2006) as a relational
plan over the pipeline's ``(subj, pred, obj)`` tables (the
kg_construct north star materializes the graph exactly in that
shape; the reference emits the same triples through rdflib,
`/root/reference/mc2skos/record.py` via `process_record`).

Each triple pattern is ONE filtered scan of the triple table:
constants become pushed-down predicate filters (partition-pruning
when the table is partitioned by ``pred``, which the Icebergish
triple sink is), variables project to columns, and shared variables
across patterns become equi-join keys.  A BGP of k patterns is
therefore k scans + (k−1) hash joins — Catalyst reorders and
AQE broadcasts the small filtered sides, which is the textbook
distributed-SPARQL plan (SPARQLGX, Graux et al. 2016 compiles BGPs
to exactly this Spark shape).

Scale notes: selective patterns (constant ``pred`` + constant
``subj``/``obj``) shrink to broadcast size after pushdown; the join
graph never materializes the full triple table more than once per
pattern.  Patterns with NO shared variable with everything matched
so far would need a cartesian product — rejected by default
(``allow_product=False``) because an unconstrained product is never
what a 100 TB query means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_POS = ("subj", "pred", "obj")


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def bgp_match(triples: DataFrame, patterns, optional=(),
              allow_product: bool = False) -> DataFrame:
    """Match a list of ``(subj, pred, obj)`` triple patterns against
    a triple DataFrame with columns ``subj, pred, obj``.

    Terms starting with ``?`` are variables; anything else is matched
    as a literal constant.  Returns one column per distinct variable
    (named without the ``?``), one row per binding (bag semantics —
    callers wanting set semantics add ``.distinct()``, matching
    SPARQL's default vs ``SELECT DISTINCT``).

    A variable repeated WITHIN one pattern (e.g. ``("?x", "knows",
    "?x")``) constrains that pattern to rows where the positions are
    equal, per SPARQL semantics.

    ``optional`` is a list of pattern GROUPS (each a list of
    patterns), one per SPARQL ``OPTIONAL { ... }`` block: each group
    is matched as its own BGP and LEFT-joined on the variables it
    shares with the mandatory part — unmatched bindings keep the row
    with the group's exclusive variables null, per SPARQL's leftjoin
    algebra.  A group must share at least one variable (an
    unconstrained optional product is rejected like a disconnected
    mandatory pattern).
    """
    if not patterns:
        raise ValueError("empty BGP")
    bound: DataFrame | None = None
    seen_vars: set[str] = set()
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError("pattern must be a (subj, pred, obj) "
                             "triple, got %r" % (pat,))
        scan = triples
        proj: dict[str, str] = {}      # var name -> first position
        for pos, term in zip(_POS, pat):
            if _is_var(term):
                name = term[1:]
                if not name:
                    raise ValueError("bare '?' variable in %r" % (pat,))
                if name in proj:       # repeated var inside pattern
                    scan = scan.filter(F.col(pos) == F.col(proj[name]))
                else:
                    proj[name] = pos
            else:
                scan = scan.filter(F.col(pos) == F.lit(term))
        step = scan.select(*[F.col(pos).alias(name)
                             for name, pos in proj.items()])
        if bound is None:
            bound, seen_vars = step, set(proj)
            continue
        keys = sorted(seen_vars & set(proj))
        if keys:
            bound = bound.join(step, keys)
        elif allow_product:
            bound = bound.crossJoin(step)
        else:
            raise ValueError(
                "pattern %r shares no variable with the patterns "
                "before it — an unconstrained product; reorder the "
                "BGP or pass allow_product=True" % (pat,))
        seen_vars |= set(proj)
    for group in optional:
        sub = bgp_match(triples, group, allow_product=allow_product)
        keys = sorted(seen_vars & set(sub.columns))
        if not keys:
            raise ValueError(
                "optional group %r shares no variable with the "
                "mandatory patterns — an unconstrained product"
                % (group,))
        bound = bound.join(sub, keys, "left")
        seen_vars |= set(sub.columns)
    return bound
