"""S3 — RDF include source: preload extra RDF files into the graph.

The reference's ``--include`` flag parses the files into the output
graph before conversion (/root/reference/mc2skos/mc2skos.py:283-288),
typically to define concept schemes — **as Turtle when the outformat is
turtle, as JSON-LD otherwise**.  Spark-first this is a ``unionByName``
of a small triples DataFrame read on the driver: Turtle through the
same embedded reader the golden oracle uses (rdflib is not available
offline), JSKOS/NDJSON through the inverse of the sink's JSON-LD frame
(``sinks/jskos.py``), chosen per file by extension.

One documented loss on the JSKOS path: the sink emits *unmapped*
literal predicates (e.g. ``wd:`` extras) as plain JSON strings without
a language tag, so a JSKOS round-trip recovers those triples with
``obj_lang = NULL`` — the context-mapped label/note families keep
their languages exactly.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..core import constants as C
from ..core.turtle import parse_turtle_file
from ..plans import schemas

_JSKOS_EXTS = (".jskos", ".json", ".jsonld", ".ndjson")


def read_turtle_triples(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Parse Turtle files into a TRIPLES DataFrame (record_id = path)."""
    rows = []
    for path in paths:
        for (subj, pred, obj, is_lit, lang, dtype,
             pos) in parse_turtle_file(path):
            rows.append((subj, pred, obj, is_lit, lang, dtype, pos, path))
    return spark.createDataFrame(rows, schema=schemas.TRIPLES)


def _concept_rows(doc: dict, path: str) -> list[tuple]:
    """One JSKOS concept object → triple rows (inverse of
    ``sinks.jskos._concept_object``, driven by the same context maps)."""
    from ..sinks import jskos as J

    # JSKOS keys concepts by "uri"; generic JSON-LD uses "@id" — accept
    # both, and fail with a diagnosis (not a KeyError) on anything else
    subj = doc.get("uri") or doc.get("@id")
    if not subj:
        raise ValueError(
            "JSKOS include %r: concept object without 'uri'/'@id' key "
            "(arbitrary JSON-LD framings beyond the JSKOS context are "
            "not supported offline — convert the file to Turtle or "
            "JSKOS first): %.120r" % (path, doc))
    inv_lang_single = {v: k for k, v in J._LANGUAGE_SINGLE.items()}
    inv_lang_multi = {v: k for k, v in J._LANGUAGE_MULTI.items()}
    inv_uri_sets = {v: k for k, v in J._URI_SETS.items()}
    inv_literal_sets = {v: k for k, v in J._LITERAL_SETS.items()}
    inv_scalars = {v: k for k, v in J._SCALARS.items()}
    rows: list[tuple] = []

    def add(pred, obj, is_lit, lang=None, dtype=None, pos=None):
        rows.append((subj, pred, obj, is_lit, lang, dtype, pos, path))

    def uri_of(v, key):
        if isinstance(v, dict) and ("uri" in v or "@id" in v):
            return v.get("uri") or v.get("@id")
        raise ValueError(
            "JSKOS include %r: %r value is not a {'uri': …} object: "
            "%.80r" % (path, key, v))

    for key, val in doc.items():
        if key in ("uri", "@id", "@context"):
            continue
        if key == "memberList":
            for pos, member in enumerate(val):
                add(J._MEMBER_LIST, uri_of(member, key), False,
                    pos=pos)
        elif key in inv_scalars:
            for v in (val if isinstance(val, list) else [val]):
                add(inv_scalars[key], v, True,
                    dtype=C.XSD + "date")
        elif key in inv_lang_single:
            for lang, v in val.items():
                add(inv_lang_single[key], v, True,
                    lang=None if lang == "und" else lang)
        elif key in inv_lang_multi:
            for lang, values in val.items():
                for v in values:
                    add(inv_lang_multi[key], v, True,
                        lang=None if lang == "und" else lang)
        elif key in inv_uri_sets:
            for v in val:
                add(inv_uri_sets[key], uri_of(v, key), False)
        elif key in inv_literal_sets:
            for v in val:
                add(inv_literal_sets[key], v, True)
        elif isinstance(val, list) and val and isinstance(val[0], dict):
            for v in val:  # unmapped URI-valued predicate
                add(key, uri_of(v, key), False)
        elif isinstance(val, bool):
            add(key, "true" if val else "false", True,
                dtype=C.XSD + "boolean")
        else:  # unmapped literal predicate (language lost by the frame)
            for v in (val if isinstance(val, list) else [val]):
                add(key, v, True)
    return rows


def read_jskos_triples(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Parse JSKOS files — NDJSON (one concept per line) or the single
    indented ``@graph`` document — into a TRIPLES DataFrame."""
    rows: list[tuple] = []
    for path in paths:
        with open(path, encoding="utf-8") as fp:
            text = fp.read().strip()
        try:  # one document (possibly with a top-level @graph) …
            whole = json.loads(text)
            docs = whole.get("@graph", [whole]) \
                if isinstance(whole, dict) else whole
        except json.JSONDecodeError:  # … else NDJSON, one per line
            docs = [json.loads(line)
                    for line in text.splitlines() if line.strip()]
        for doc in docs:
            rows.extend(_concept_rows(doc, path))
    return spark.createDataFrame(rows, schema=schemas.TRIPLES)


def include_triples(triples: DataFrame, spark: SparkSession,
                    include_paths: list[str]) -> DataFrame:
    """Union preloaded RDF into the pipeline output, with set-dedup.
    Turtle vs JSKOS is chosen per file by extension (the reference
    chooses by OUTPUT format, mc2skos.py:283-288 — per-file extension
    is strictly more permissive: every reference invocation behaves
    identically, mixed includes additionally work)."""
    if not include_paths:
        return triples
    ttl = [p for p in include_paths
           if not p.lower().endswith(_JSKOS_EXTS)]
    jsk = [p for p in include_paths if p.lower().endswith(_JSKOS_EXTS)]
    extra = None
    if ttl:
        extra = read_turtle_triples(spark, ttl)
    if jsk:
        js = read_jskos_triples(spark, jsk)
        extra = js if extra is None else extra.unionByName(js)
    # obj_is_literal IS part of triple identity: a literal "http://x"
    # and the URI <http://x> under one predicate are distinct triples
    return (triples.unionByName(extra)
            .dropDuplicates(["subj", "pred", "obj", "obj_is_literal",
                             "obj_lang", "obj_datatype",
                             "component_pos"]))
