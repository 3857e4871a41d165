"""JSKOS include round-trip (S3/S5): the converter's own JSKOS and
NDJSON outputs parse back through the include reader to the original
triple set — the reference's "--include as JSON-LD for non-turtle
outformats" capability (mc2skos.py:283-288), closed over our sink's
frame.  Context-mapped predicates round-trip exactly (labels/notes
keep language tags, dates keep xsd:date, componentList keeps order);
the one documented loss is the language tag on UNMAPPED literal
predicates (the frame emits them as plain strings)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))

from convert import convert  # noqa: E402

from mc2skos_spark.core import constants as C
from mc2skos_spark.plans import schemas
from mc2skos_spark.sources.rdf_include import (include_triples,
                                               read_jskos_triples)

pytestmark = pytest.mark.spark

EXAMPLES = "/root/reference/examples"
GND_XML = os.path.join(EXAMPLES, "gnd-1020118989.xml")


def _rows(df):
    return {(r["subj"], r["pred"], r["obj"], r["obj_is_literal"],
             r["obj_lang"], r["obj_datatype"], r["component_pos"])
            for r in df.collect()}


def test_ndjson_and_jskos_roundtrip_through_include(spark, tmp_path):
    """convert → .ndjson and → .jskos (the @graph document), then read
    both back with the include reader: triple sets equal the direct
    conversion's."""
    ttl = str(tmp_path / "direct.ttl")
    convert(spark, [GND_XML], ttl, scheme="gnd", altlabels=True)
    from mc2skos_spark.core.turtle import parse_turtle_file
    direct = {t for t in parse_turtle_file(ttl)}

    for fmt, name in (("ndjson", "out.ndjson"), ("jskos", "doc.jskos")):
        out = str(tmp_path / name)
        convert(spark, [GND_XML], out, scheme="gnd", altlabels=True,
                outformat=fmt)
        back = read_jskos_triples(spark, [out])
        got = {t[:7] for t in _rows(back)}
        assert got == direct, fmt


def test_include_mixed_formats_and_loss_documented(spark, tmp_path):
    """Mixed --include (one .ttl + one .ndjson) unions into the output;
    a componentList + deprecated + unmapped-literal concept shows the
    exact round-trip behavior branch by branch."""
    from mc2skos_spark.sinks.jskos import triples_to_jskos
    rows = [
        ("http://x/c", C.RDF + "type", C.SKOS + "Concept", False, None,
         None, None, "r"),
        ("http://x/c", C.SKOS + "prefLabel", "Ding", True, "de", None,
         None, "r"),
        ("http://x/c", C.OWL + "deprecated", "true", True, None,
         C.XSD + "boolean", None, "r"),
        ("http://x/c", C.MADS + "componentList", "http://x/a", False,
         None, None, 0, "r"),
        ("http://x/c", C.MADS + "componentList", "http://x/b", False,
         None, None, 1, "r"),
        # unmapped literal WITH a language tag: the frame drops the tag
        ("http://x/c", C.WD + "classHere", "et tema", True, "nb", None,
         None, "r"),
    ]
    src = spark.createDataFrame(rows, schema=schemas.TRIPLES)
    nd = str(tmp_path / "inc.ndjson")
    with open(nd, "w", encoding="utf-8") as fp:
        for r in triples_to_jskos(src).collect():
            fp.write(r["line"] + "\n")

    base = spark.createDataFrame([], schema=schemas.TRIPLES)
    merged = include_triples(
        base, spark, [os.path.join(EXAMPLES, "bk-54.65.ttl"), nd])
    got = {t[:7] for t in _rows(merged)}
    expected_roundtrip = {t[:7] for t in _rows(src)
                          if not t[1].startswith(C.WD)}
    assert expected_roundtrip <= got
    # the unmapped wd: literal survives — minus its language tag
    assert ("http://x/c", C.WD + "classHere", "et tema", True, None,
            None, None) in got
    # and the Turtle include is there too
    from mc2skos_spark.core.turtle import parse_turtle_file
    assert {t for t in parse_turtle_file(
        os.path.join(EXAMPLES, "bk-54.65.ttl"))} <= got
    # order survived the cons-list normalization
    comp = sorted((t[6], t[2]) for t in got
                  if t[1] == C.MADS + "componentList")
    assert comp == [(0, "http://x/a"), (1, "http://x/b")]
