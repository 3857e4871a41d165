"""Byte-level sink format pins for a golden subject.

The triple-set tests prove WHAT the pipeline emits; these pin HOW the
sinks serialize it: the ordered-Turtle block and the JSKOS NDJSON line
for the reference example ``ddc23no-001`` (golden
/root/reference/examples/ddc23no-001.ttl, same statements modulo prefix
expansion and the sink's sorted statement-per-line layout) are asserted
byte-for-byte, and the Turtle block must round-trip through the Turtle
reader to exactly the reference file's triple rows.
"""

import json

import pytest
from pyspark.sql import functions as F

from mc2skos_spark.core.turtle import parse_turtle, parse_turtle_file
from mc2skos_spark.operators.extract import (extract_triples,
                                             triples_from_extracted)
from mc2skos_spark.plans import schemas
from mc2skos_spark.sinks.jskos import triples_to_jskos
from mc2skos_spark.sinks.serializers import triples_to_turtle, turtle_header
from mc2skos_spark.sources.examples import golden_record_families
from mc2skos_spark.sources.synth import make_transcript_rows
from mc2skos_spark.sources.transcripts import reassemble_records

pytestmark = pytest.mark.spark

SUBJECT = "http://dewey.info/class/001/e23/"
GOLDEN_TTL = "/root/reference/examples/ddc23no-001.ttl"

# the reference golden's statements, in the sink's layout: prefixes
# expanded, one statement per line, statements sorted, ' ;\n' joins,
# ' .' terminator
EXPECTED_BLOCK = (
    '<http://dewey.info/class/001/e23/>\n'
    '    <http://data.ub.uio.no/webdewey-terms#classHere> "Idéer fra flere områder"@nb ;\n'
    '    <http://data.ub.uio.no/webdewey-terms#classHere> "Tverrfaglig tilnærming til kunnskap"@nb ;\n'
    '    <http://data.ub.uio.no/webdewey-terms#including> "Tverrfaglige verker om spesialister"@nb ;\n'
    '    <http://purl.org/dc/terms/created> "2009-12-03"^^<http://www.w3.org/2001/XMLSchema#date> ;\n'
    '    <http://purl.org/dc/terms/identifier> "ocd00116591" ;\n'
    '    <http://purl.org/dc/terms/modified> "2015-09-29"^^<http://www.w3.org/2001/XMLSchema#date> ;\n'
    '    <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2004/02/skos/core#Concept> ;\n'
    '    <http://www.w3.org/2004/02/skos/core#broader> <http://dewey.info/class/00/e23/> ;\n'
    '    <http://www.w3.org/2004/02/skos/core#editorialNote> "Klassifiser en samling av kunnskap i en bestemt form med formen, f.eks. leksika"@nb ;\n'
    '    <http://www.w3.org/2004/02/skos/core#editorialNote> "Klassifiser erkjennelsesteori (epistemologi) i 121"@nb ;\n'
    '    <http://www.w3.org/2004/02/skos/core#editorialNote> "Se manualen: 500 vs. 001"@nb ;\n'
    '    <http://www.w3.org/2004/02/skos/core#editorialNote> "Spesialister eller bruken av spesialister innen et bestemt emne, se emnet, f.eks. spesialister innen lungemedisin, bruken av spesialister innen ingeniørfag, bruken av konsulenter innen ledelse"@nb ;\n'
    '    <http://www.w3.org/2004/02/skos/core#inScheme> <http://dewey.info/scheme/edition/e23/> ;\n'
    '    <http://www.w3.org/2004/02/skos/core#notation> "001" ;\n'
    '    <http://www.w3.org/2004/02/skos/core#prefLabel> "Kunnskap"@nb ;\n'
    '    <http://www.w3.org/2004/02/skos/core#scopeNote> "Beskrivelse og kritisk vurdering av intellektuell virksomhet i alminnelighet"@nb ;\n'
    '    <http://www.w3.org/2004/02/skos/core#scopeNote> "Her: Idéer fra flere områder; tverrfaglig tilnærming til kunnskap"@nb ;\n'
    '    <http://www.w3.org/2004/02/skos/core#scopeNote> "Inkluderer: Tverrfaglige verker om spesialister"@nb .\n'
)

EXPECTED_JSKOS = {
    "@context": "https://gbv.github.io/jskos/context.json",
    "uri": SUBJECT,
    "type": [{"uri": "http://www.w3.org/2004/02/skos/core#Concept"}],
    "notation": ["001"],
    "identifier": ["ocd00116591"],
    "prefLabel": {"nb": "Kunnskap"},
    "created": "2009-12-03",
    "modified": "2015-09-29",
    "broader": [{"uri": "http://dewey.info/class/00/e23/"}],
    "inScheme": [{"uri": "http://dewey.info/scheme/edition/e23/"}],
    "editorialNote": {"nb": [
        "Klassifiser en samling av kunnskap i en bestemt form med formen, "
        "f.eks. leksika",
        "Klassifiser erkjennelsesteori (epistemologi) i 121",
        "Se manualen: 500 vs. 001",
        "Spesialister eller bruken av spesialister innen et bestemt emne, "
        "se emnet, f.eks. spesialister innen lungemedisin, bruken av "
        "spesialister innen ingeniørfag, bruken av konsulenter innen "
        "ledelse"]},
    "scopeNote": {"nb": [
        "Beskrivelse og kritisk vurdering av intellektuell virksomhet i "
        "alminnelighet",
        "Her: Idéer fra flere områder; tverrfaglig "
        "tilnærming til kunnskap",
        "Inkluderer: Tverrfaglige verker om spesialister"]},
    # unmapped literal predicate with TWO values: both survive, sorted
    "http://data.ub.uio.no/webdewey-terms#classHere": [
        "Idéer fra flere områder",
        "Tverrfaglig tilnærming til kunnskap"],
    "http://data.ub.uio.no/webdewey-terms#including":
        "Tverrfaglige verker om spesialister",
}


@pytest.fixture(scope="module")
def golden_triples(spark):
    for options, default_scheme, recs in golden_record_families():
        stems = {s for s, _ in recs}
        if "ddc23no-001" in stems:
            chosen = [(s, x) for s, x in recs if s == "ddc23no-001"]
            rows = make_transcript_rows(chosen, seed=9)
            df = spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)
            return triples_from_extracted(
                extract_triples(reassemble_records(df), options,
                                default_scheme)).cache()
    raise AssertionError("ddc23no-001 not in golden families")


def test_turtle_block_bytes(golden_triples):
    blocks = triples_to_turtle(golden_triples).collect()
    assert len(blocks) == 1
    assert blocks[0]["block"] == EXPECTED_BLOCK


def test_turtle_block_roundtrips_to_reference_rows(golden_triples):
    block = triples_to_turtle(golden_triples).collect()[0]["block"]
    reparsed = set(parse_turtle(turtle_header() + block))
    golden = set(parse_turtle_file(GOLDEN_TTL))
    assert reparsed == golden


def test_turtle_escapes_control_chars_roundtrip(spark):
    """Raw LF/CR are illegal inside Turtle string literals: a note
    containing them must serialize escaped and round-trip through the
    reader to the original bytes."""
    nasty = 'line one\nline "two"\r\ttabbed \\ backslash'
    triples = spark.createDataFrame(
        [("http://x/s", "http://x/p", nasty, True, "en", None, None,
          "r1")],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, obj_datatype string, component_pos int, "
        "record_id string")
    block = triples_to_turtle(triples).collect()[0]["block"]
    assert r"\n" in block and r"\r" in block and r"\t" in block
    # the literal itself carries no raw control characters
    literal = block.split('"', 1)[1].rsplit('"', 1)[0]
    assert "\n" not in literal and "\r" not in literal \
        and "\t" not in literal
    rows = parse_turtle(turtle_header() + block)
    assert rows == [("http://x/s", "http://x/p", nasty, True, "en",
                     None, None)]


def test_jskos_line_bytes(golden_triples):
    lines = triples_to_jskos(golden_triples).collect()
    assert len(lines) == 1
    line = lines[0]["line"]
    assert json.loads(line) == EXPECTED_JSKOS
    # byte-level: the sink emits sort_keys json with ensure_ascii=False
    assert line == json.dumps(EXPECTED_JSKOS, sort_keys=True,
                              ensure_ascii=False)
