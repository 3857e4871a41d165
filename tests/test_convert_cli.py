"""File-converter surface: jobs/convert.py must reproduce the
reference's `mc2skos map infile outfile` conversions file-for-file."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))

from convert import convert  # noqa: E402

from mc2skos_spark.core.turtle import parse_turtle_file, precision_recall

pytestmark = pytest.mark.spark

EXAMPLES = "/root/reference/examples"


def test_cli_list_schemes_no_spark():
    """-l/--list-schemes (reference mc2skos.py:247,267-271) prints the
    registry and exits — before any Spark session exists."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "convert.py"),
         "--list-schemes"],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0
    lines = out.stdout.strip().splitlines()
    assert lines[0] == "Schemes:"
    from mc2skos_spark.core.vocab import Vocabularies
    assert {ln[2:] for ln in lines[1:]} == {v.code for v in Vocabularies()}


def test_convert_turtle_matches_golden(spark, tmp_path):
    out = str(tmp_path / "out.ttl")
    stats = convert(spark, [os.path.join(EXAMPLES, "ddc23no-001.xml")],
                    out, webdewey=True)
    assert stats["subjects"] == 1 and stats["quarantined"] == 0
    produced = set(parse_turtle_file(out))
    golden = set(parse_turtle_file(os.path.join(EXAMPLES,
                                                "ddc23no-001.ttl")))
    assert produced == golden


def test_convert_skosify_clean_is_identity(spark, tmp_path):
    """--skosify on a clean golden file: zero warnings, repair is a
    no-op, output still matches the reference conversion."""
    out = str(tmp_path / "out.ttl")
    stats = convert(spark, [os.path.join(EXAMPLES, "ddc23no-001.xml")],
                    out, webdewey=True, skosify=True)
    assert stats["validation_warnings"] == 0
    produced = set(parse_turtle_file(out))
    golden = set(parse_turtle_file(os.path.join(EXAMPLES,
                                                "ddc23no-001.ttl")))
    assert produced == golden


def test_convert_authority_with_scheme_and_jskos(spark, tmp_path):
    out = str(tmp_path / "out.ndjson")
    stats = convert(spark, [os.path.join(EXAMPLES, "gnd-1020118989.xml")],
                    out, scheme="gnd", altlabels=True)
    assert stats["format"] == "ndjson" and stats["subjects"] >= 1
    lines = [json.loads(line) for line in open(out)]
    uris = {o["uri"] for o in lines}
    assert "http://d-nb.info/gnd/1020118989" in uris
    (concept,) = [o for o in lines
                  if o["uri"] == "http://d-nb.info/gnd/1020118989"]
    assert concept["prefLabel"]  # language-mapped labels survive

    # -o jskos: the reference's SINGLE indented JSON document with
    # @graph (mc2skos.py:349-355), not per-line records
    out2 = str(tmp_path / "doc.jskos")
    stats2 = convert(spark, [os.path.join(EXAMPLES,
                                          "gnd-1020118989.xml")],
                     out2, scheme="gnd", altlabels=True)
    assert stats2["format"] == "jskos"
    doc = json.load(open(out2))
    assert "@graph" in doc and isinstance(doc["@graph"], list)
    assert {o["uri"] for o in doc["@graph"]} == uris


def test_convert_multi_file_with_include_and_expand(spark, tmp_path):
    out = str(tmp_path / "multi.ttl")
    convert(spark,
            [os.path.join(EXAMPLES, "bk-54.65.xml"),
             os.path.join(EXAMPLES, "ddc23no-001.xml")],
            out, altlabels=True, webdewey=True, expand=True,
            include=[os.path.join(EXAMPLES, "bk-54.65.ttl")])
    produced = set(parse_turtle_file(out))
    bk = "http://uri.gbv.de/terminology/bk/"
    skos = "http://www.w3.org/2004/02/skos/core#"
    # the include preloaded the bk golden; expand added the narrower
    # inverse the reference's skosify test asserts
    assert (bk + "54", skos + "narrower", bk + "54.65",
            False, None, None, None) in produced
    # both files' subjects are present
    golden_bk = set(parse_turtle_file(os.path.join(EXAMPLES,
                                                   "bk-54.65.ttl")))
    _, recall, missing, _ = precision_recall(list(produced),
                                             list(golden_bk))
    assert recall == 1.0, sorted(missing)[:5]
