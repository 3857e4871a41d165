"""Regenerate VALUES-literal oracles for the xxhash64-dependent queries.

``dedup_minhash_lsh``, ``dedup_simhash`` and ``text_fingerprint`` hash
with Spark's ``xxhash64`` — a public, seeded, deterministic function
DuckDB does not ship.  Their outputs at sf0.01 are therefore fixed, so
the oracle is a literal ``VALUES`` table: this file runs the Spark
queries once against /root/testdata/sf0.01 and writes
``mc2skos_spark/plans/oracle_values.py``.  Re-run only if the operator
implementations (or the driver testdata) change.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "mc2skos_spark", "plans", "oracle_values.py")

#: second-scale pins: sf dir → generated module (used by
#: tools/check_correctness.py --sf-dir to keep VALUE comparison instead
#: of dropping to rows-only).  Regenerate with
#: ``python tools/gen_oracle_values.py --sf-dir /root/testdata/sf0.1``.
SF_VALUES_MODULES = {
    "/root/testdata/sf0.1": "oracle_values_sf0_1",
}

# query -> (column, duckdb type) in output order
SPECS = {
    "dedup_minhash_lsh": [("id_a", "BIGINT"), ("id_b", "BIGINT"),
                          ("est_jaccard", "DOUBLE")],
    "dedup_incremental_minhash": [("id_a", "BIGINT"), ("id_b", "BIGINT"),
                                  ("est_jaccard", "DOUBLE")],
    "dedup_incremental_keepers": [("id", "BIGINT"),
                                  ("keeper_id", "BIGINT")],
    "dedup_simhash": [("id_a", "BIGINT"), ("id_b", "BIGINT"),
                      ("hamming", "INT")],
    "text_fingerprint": [("doc_id", "BIGINT"), ("fp", "BIGINT")],
    "text_rolling_fingerprint": [("doc_id", "BIGINT"), ("rfp", "BIGINT")],
    # ANN variants: deterministic (seeded LCG planes / xxhash64 centroid
    # sampling); recall-vs-exact is pytest-asserted, the driver row pins
    # the output
    "sim_ann_lsh_topk": [("vec_id", "BIGINT"), ("cosine", "DOUBLE")],
    "sim_ann_ivf_topk": [("vec_id", "BIGINT"), ("cosine", "DOUBLE")],
    # recall@10 of both ANN variants vs the brute-force twin (the
    # relational semi-join row in __spark_entry__.py) — deterministic
    # for the same reasons as the two rows above
    "sim_ann_recall": [("method", "VARCHAR"), ("hits", "BIGINT"),
                       ("recall_at_10", "DOUBLE")],
}

# kg_golden_triples is NOT dumped from Spark output: its expected rows
# come straight from the reference's golden Turtle files, so the driver
# hash-compare proves pipeline-vs-reference parity, not self-consistency.
KG_SPEC = [("subj", "VARCHAR"), ("pred", "VARCHAR"), ("obj", "VARCHAR"),
           ("obj_is_literal", "BOOLEAN"), ("obj_lang", "VARCHAR"),
           ("obj_datatype", "VARCHAR"), ("component_pos", "INT")]


def lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return repr(v)  # shortest round-trip repr → identical double
    if isinstance(v, str):
        return "'%s'" % v.replace("'", "''")
    return str(v)


def s4_turtle_block() -> str:
    """Expected ordered-Turtle blocks for the gnd golden family,
    rendered FROM THE REFERENCE GOLDEN .ttl (not from Spark output):
    parse /root/reference/examples/gnd-*.ttl with the repo's Turtle
    reader, then lay the triples out exactly as the sink documents
    (sinks/serializers.py triples_to_turtle — one ``    <pred> term``
    statement per triple, statements byte-sorted, ' ;\\n' joins, block
    ``<subj>\\n…body… .\\n``).  The driver hash-compare then proves the
    Spark pipeline SERIALIZES the reference's triples byte-for-byte."""
    import glob

    from mc2skos_spark.core.turtle import parse_turtle_file

    xsd_boolean = "http://www.w3.org/2001/XMLSchema#boolean"
    rows = set()
    for path in sorted(glob.glob(
            "/root/reference/examples/gnd-*.ttl")):
        rows.update(parse_turtle_file(path))

    def esc(s: str) -> str:
        return (s.replace("\\", "\\\\").replace('"', '\\"')
                 .replace("\n", "\\n").replace("\r", "\\r")
                 .replace("\t", "\\t"))

    def term(obj, is_lit, lang, dtype):
        if not is_lit:
            return "<%s>" % obj
        if lang:
            return '"%s"@%s' % (esc(obj), lang)
        if dtype == xsd_boolean:
            return obj  # bare true/false
        if dtype:
            return '"%s"^^<%s>' % (esc(obj), dtype)
        return '"%s"' % esc(obj)

    by_subj: dict[str, list[str]] = {}
    for subj, pred, obj, is_lit, lang, dtype, pos in rows:
        stmt = "    <%s> %s" % (pred, term(obj, is_lit, lang, dtype))
        if pos is not None:
            stmt += "  # pos=%d" % pos
        by_subj.setdefault(subj, []).append(stmt)
    blocks = sorted(
        "<%s>\n%s .\n" % (subj, " ;\n".join(sorted(stmts)))
        for subj, stmts in by_subj.items())
    values = ",\n".join("    (%s)" % lit(b) for b in blocks)
    print("s4_turtle_blocks: %d blocks (from reference goldens)"
          % len(blocks))
    return ("SELECT CAST(block AS VARCHAR) AS block FROM (VALUES\n%s\n)"
            " AS t(block)" % values)


def s5_jskos_block() -> str:
    """Expected JSKOS NDJSON lines for the gnd golden family, framed
    FROM THE REFERENCE GOLDEN .ttl (not from Spark output): parse
    /root/reference/examples/gnd-*.ttl and apply the JSON-LD frame the
    reference serializes with (jskos-context.json: @language containers
    for the label/note families, @set URI containers for the hierarchy
    terms, scalar dates, unmapped terms passed through under their full
    URI) — restated here INDEPENDENTLY of sinks/jskos.py, so the driver
    hash-compare proves the Spark sink frames the reference's triples
    the way the context mandates, not merely that the sink agrees with
    itself."""
    import glob
    import json

    from mc2skos_spark.core.turtle import parse_turtle_file

    skos = "http://www.w3.org/2004/02/skos/core#"
    dcterms = "http://purl.org/dc/terms/"
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    xsd_boolean = "http://www.w3.org/2001/XMLSchema#boolean"
    # jskos-context.json term map (the slice the goldens exercise)
    lang_single = {skos + "prefLabel": "prefLabel"}
    lang_multi = {skos + k: k for k in
                  ("altLabel", "hiddenLabel", "scopeNote", "definition",
                   "example", "historyNote", "editorialNote",
                   "changeNote", "note")}
    uri_sets = {rdf + "type": "type", skos + "narrower": "narrower",
                skos + "broader": "broader", skos + "related": "related",
                skos + "inScheme": "inScheme",
                skos + "topConceptOf": "topConceptOf",
                skos + "hasTopConcept": "topConcepts"}
    literal_sets = {skos + "notation": "notation",
                    dcterms + "identifier": "identifier"}
    scalars = {dcterms + "created": "created",
               dcterms + "modified": "modified"}

    by_subj: dict[str, list] = {}
    for path in sorted(glob.glob("/root/reference/examples/gnd-*.ttl")):
        for subj, pred, obj, is_lit, lang, dtype, pos in \
                parse_turtle_file(path):
            by_subj.setdefault(subj, []).append(
                (pred, obj, is_lit, lang, dtype, pos))

    lines = []
    for subj in sorted(by_subj):
        doc: dict = {"uri": subj,
                     "@context": "https://gbv.github.io/jskos/context.json"}
        members = []
        for pred, obj, is_lit, lang, dtype, pos in sorted(
                by_subj[subj], key=lambda t: (t[0], str(t[1]))):
            if pred == "http://www.loc.gov/mads/rdf/v1#componentList":
                members.append((pos or 0, obj))
            elif pred in scalars:
                doc[scalars[pred]] = obj
            elif pred in lang_single:
                doc.setdefault(lang_single[pred], {})[lang or "und"] = obj
            elif pred in lang_multi:
                (doc.setdefault(lang_multi[pred], {})
                    .setdefault(lang or "und", []).append(obj))
            elif pred in uri_sets:
                doc.setdefault(uri_sets[pred], []).append({"uri": obj})
            elif pred in literal_sets:
                doc.setdefault(literal_sets[pred], []).append(obj)
            elif not is_lit:
                doc.setdefault(pred, []).append({"uri": obj})
            elif dtype == xsd_boolean:
                doc[pred] = obj == "true"
            else:
                doc[pred] = obj
        if members:
            doc["memberList"] = [{"uri": v} for _, v in sorted(members)]
        for key, val in doc.items():
            if isinstance(val, list) and val and isinstance(val[0], dict) \
                    and key != "memberList":
                doc[key] = sorted(val, key=lambda d: d["uri"])
            elif isinstance(val, dict):
                doc[key] = {k: (sorted(v) if isinstance(v, list) else v)
                            for k, v in sorted(val.items())}
            elif isinstance(val, list) and key != "memberList":
                doc[key] = sorted(val)
        lines.append(json.dumps(doc, sort_keys=True, ensure_ascii=False))
    values = ",\n".join("    (%s)" % lit(s) for s in sorted(lines))
    print("s5_jskos_docs: %d concept lines (from reference goldens)"
          % len(lines))
    return ("SELECT CAST(line AS VARCHAR) AS line FROM (VALUES\n%s\n)"
            " AS t(line)" % values)


def kg_golden_block() -> str:
    from mc2skos_spark.sources.examples import golden_triples_union
    rows = sorted(golden_triples_union({"rvk"}),
                  key=lambda r: tuple("" if v is None else str(v)
                                      for v in r))
    cols = [c for c, _ in KG_SPEC]
    values = ",\n".join("    (%s)" % ", ".join(lit(v) for v in row)
                        for row in rows)
    casts = ", ".join("CAST(%s AS %s) AS %s" % (c, t, c)
                      for c, t in KG_SPEC)
    print("kg_golden_triples: %d rows (from reference goldens)" % len(rows))
    return ("SELECT %s FROM (VALUES\n%s\n) AS t(%s)"
            % (casts, values, ", ".join(cols)))


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF_DIR,
                    help="dump VALUES at this scale factor; a non-"
                         "default dir writes the second-scale module "
                         "from SF_VALUES_MODULES (SPECS queries only)")
    args = ap.parse_args()
    primary = os.path.normpath(args.sf_dir) == os.path.normpath(SF_DIR)
    if primary:
        out = OUT
    else:
        module = SF_VALUES_MODULES[os.path.normpath(args.sf_dir)]
        out = os.path.join(REPO, "mc2skos_spark", "plans",
                           module + ".py")

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("gen_oracle_values").getOrCreate())
    queries = entry.queries()
    blocks = {}
    for name, spec in SPECS.items():
        rows = queries[name](spark, args.sf_dir).collect()
        cols = [c for c, _ in spec]
        tuples = sorted(tuple(r[c] for c in cols) for r in rows)
        values = ",\n".join("    (%s)" % ", ".join(lit(v) for v in row)
                            for row in tuples)
        casts = ", ".join("CAST(%s AS %s) AS %s" % (c, t, c)
                          for c, t in spec)
        blocks[name] = ("SELECT %s FROM (VALUES\n%s\n) AS t(%s)"
                        % (casts, values, ", ".join(cols)))
        print("%s: %d rows" % (name, len(tuples)))
    spark.stop()
    if primary:
        # the reference-golden oracles are sf-independent; they live
        # only in the primary module the driver consumes
        blocks["kg_golden_triples"] = kg_golden_block()
        blocks["s4_turtle_blocks"] = s4_turtle_block()
        blocks["s5_jskos_docs"] = s5_jskos_block()

    with open(out, "w") as fp:
        fp.write('"""GENERATED by tools/gen_oracle_values.py — do not '
                 'edit by hand.\n\nVALUES-literal DuckDB oracles for the '
                 'xxhash64-dependent queries at %s\n(deterministic '
                 'seeded outputs; see the generator for rationale)."""'
                 '\n\nVALUES_SQL = {\n' % args.sf_dir)
        for name, sql in blocks.items():
            # %r (not a triple-quoted template): a backslash inside a
            # golden string value must survive the generated module's
            # OWN python-literal decoding
            fp.write("    %r: %r,\n" % (name, sql))
        fp.write("}\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
