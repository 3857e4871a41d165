"""Property-based tests (hypothesis) for the order-sensitive folds and
the transcript sharding round-trip (SURVEY.md §5 'our test strategy')."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from mc2skos_spark.core.folds import parse_153, stringify
from mc2skos_spark.sources.synth import make_transcript_rows
from mc2skos_spark.sources.transcripts import RECORD_SPAN_PATTERN

value = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"),
                           whitelist_characters=".-"),
    min_size=1, max_size=8)
subfield = st.builds(lambda c, v: {"code": c, "value": v, "has_text": True},
                     st.sampled_from("azyacefjhix9"), value)


@given(st.lists(subfield, max_size=12))
@settings(max_examples=200, deadline=None)
def test_parse_153_invariants(subfields):
    """For arbitrary subfield sequences: never crashes unless notation
    accumulation starts with $y/$c (reference crashes identically);
    parent ⇒ not top concept; caption is the last $j."""
    try:
        table, notation, is_top, parent, caption = parse_153(subfields)
    except TypeError:
        # reference behavior: $y/$c before any $a concatenates onto None
        assert any(sf["code"] in ("y", "c") for sf in subfields)
        return
    if parent is not None:
        assert is_top is False
    js = [sf["value"] for sf in subfields if sf["code"] == "j"]
    if js:
        assert caption == js[-1]
    zs = [sf["value"] for sf in subfields if sf["code"] == "z"]
    if table is not None:
        assert table in zs


@given(st.lists(subfield, max_size=10))
@settings(max_examples=200, deadline=None)
def test_stringify_never_crashes_and_monotone(subfields):
    field = {"subfields": subfields}
    out = stringify(field)
    wanted = [sf for sf in subfields
              if sf["code"] in ("a", "c", "i", "t", "x")]
    assert len(out) >= sum(0 for _ in wanted)
    for sf in wanted:
        assert sf["value"] in out


record_xml = st.builds(
    lambda body: "<record xmlns=\"http://www.loc.gov/MARC21/slim\">%s</record>"
                 % body,
    st.text(alphabet=st.characters(whitelist_categories=("L", "N"),
                                   whitelist_characters=" .-"),
            min_size=0, max_size=200))


@given(st.lists(record_xml, min_size=1, max_size=6), st.integers(0, 2 ** 20))
@settings(max_examples=100, deadline=None)
def test_sharding_roundtrip_property(xmls, seed):
    """Arbitrary record payloads chunked into transcripts reassemble
    byte-exactly via concat + span extraction (the input_hint invariant),
    independent of chunking seed."""
    records = [("r%d" % i, xml) for i, xml in enumerate(xmls)]
    rows = make_transcript_rows(records, seed=seed)
    by_conv = {}
    for (cid, ti, role, text, tool, ts) in rows:
        if tool == "marc_export":
            by_conv.setdefault(cid, []).append((ti, text))
    got = []
    for cid, parts in by_conv.items():
        payload = "".join(t for _, t in sorted(parts))
        got.extend(m.group(0)
                   for m in re.finditer(RECORD_SPAN_PATTERN, payload))
    assert sorted(got) == sorted(xml for _, xml in records)


# --------------------------------------------------------------------
# Full transcript-graft round-trip (round-4 ask): ANY valid MARC record
# set → make_transcript_rows → reassemble_records (Spark) →
# extract/triple fan-out must equal the direct Spark-free
# core.api.process_records result — random record contents AND random
# turn splits, not just the fixed-seed fixtures.

import pytest as _pytest
from hypothesis import HealthCheck

_text = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"),
                           whitelist_characters=" .,-:()'"),
    min_size=1, max_size=40).map(lambda s: s.strip()).filter(bool)


@st.composite
def _classification_record(draw, idx):
    from xml.sax.saxutils import escape
    notation = "%03d.%02d" % (draw(st.integers(0, 999)),
                              draw(st.integers(0, 99)))
    caption = escape(draw(_text))
    topic = escape(draw(_text))
    return (
        '<record xmlns="http://www.loc.gov/MARC21/slim">'
        '<leader>00000nw  a2200000n  4500</leader>'
        '<controlfield tag="001">hyp%08d</controlfield>'
        '<controlfield tag="005">20150910004647.0</controlfield>'
        '<controlfield tag="008">091203aaaaaaaa</controlfield>'
        '<datafield tag="040" ind1=" " ind2=" ">'
        '<subfield code="b">nob</subfield></datafield>'
        '<datafield tag="084" ind1="0" ind2=" ">'
        '<subfield code="a">ddc</subfield>'
        '<subfield code="c">23no</subfield></datafield>'
        '<datafield tag="153" ind1=" " ind2=" ">'
        '<subfield code="a">%s</subfield>'
        '<subfield code="e">%s</subfield>'
        '<subfield code="j">%s</subfield></datafield>'
        '<datafield tag="680" ind1="1" ind2=" ">'
        '<subfield code="i">Her:</subfield>'
        '<subfield code="t">%s</subfield></datafield>'
        '</record>'
    ) % (idx, notation, notation[:3], caption, topic)


@st.composite
def _authority_record(draw, idx):
    from xml.sax.saxutils import escape
    heading = escape(draw(_text))
    alt = escape(draw(_text))
    return (
        '<record xmlns="http://www.loc.gov/MARC21/slim">'
        '<leader>00000nz  a2200000n  4500</leader>'
        '<controlfield tag="001">sh%07d</controlfield>'
        '<controlfield tag="005">20170814095021.0</controlfield>'
        '<controlfield tag="008">120224n|aana               a aaa     '
        '</controlfield>'
        '<datafield tag="040" ind1=" " ind2=" ">'
        '<subfield code="b">eng</subfield></datafield>'
        '<datafield tag="150" ind1=" " ind2=" ">'
        '<subfield code="a">%s</subfield></datafield>'
        '<datafield tag="450" ind1=" " ind2=" ">'
        '<subfield code="a">%s</subfield></datafield>'
        '</record>'
    ) % (idx, heading, alt)


@st.composite
def _record_set(draw):
    n = draw(st.integers(1, 5))
    xmls = []
    for i in range(n):
        if draw(st.booleans()):
            xmls.append(draw(_classification_record(i)))
        else:
            xmls.append(draw(_authority_record(i)))
    return xmls


@_pytest.mark.spark
@given(_record_set(), st.integers(0, 2 ** 20))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_graft_roundtrip_equals_library_property(spark, xmls, seed):
    from mc2skos_spark.core.api import process_records
    from mc2skos_spark.operators.extract import (extract_triples,
                                                 triples_from_extracted)
    from mc2skos_spark.plans import schemas
    from mc2skos_spark.sources.transcripts import reassemble_records

    options = {"include_altlabels": True}
    expected = set(process_records(xmls, options))

    records = [("r%d" % i, xml) for i, xml in enumerate(xmls)]
    rows = make_transcript_rows(records, seed=seed)
    df = spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_is_literal"],
         r["obj_lang"], r["obj_datatype"], r["component_pos"])
        for r in triples_from_extracted(
            extract_triples(reassemble_records(df), options)).collect()}
    assert got == expected


_word = st.text(alphabet="abcdz", min_size=1, max_size=3)


@_pytest.mark.spark
@given(st.lists(st.lists(_word, min_size=0, max_size=30), min_size=1,
                max_size=8))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_repetition_signals_match_python_reference(spark, docs):
    """The zero-shuffle hashed-fold repetition signals equal a direct
    Python computation (Counter multiplicities / set cardinality) on
    arbitrary token multisets — ONE Spark job per example batch."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from mc2skos_spark.functions.textstats import (dup_token_fraction,
                                                   top_ngram_fraction)

    def ref(tokens):
        if tokens:
            dup = math.floor((1.0 - len(set(tokens)) / len(tokens))
                             * 10000) / 10000
        else:
            dup = 0.0
        grams = [" ".join(tokens[i:i + 2])
                 for i in range(len(tokens) - 1)] if len(tokens) >= 2 else []
        if grams:
            top = math.floor(max(Counter(grams).values()) / len(grams)
                             * 10000) / 10000
        else:
            top = 0.0
        return dup, top

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id bigint, text string")
    got = {r["doc_id"]: (r["dup"], r["top2"]) for r in df.select(
        "doc_id", dup_token_fraction(F.col("text")).alias("dup"),
        top_ngram_fraction(F.col("text"), 2).alias("top2")).collect()}
    assert got == {i: ref(toks) for i, toks in enumerate(docs)}


# ---------------------------------------------------------------------------
# BPE encode: pure-Python properties (no JVM)

_sym = st.text(alphabet="ab", min_size=1, max_size=2)


@given(st.text(alphabet="abc", max_size=20),
       st.lists(st.tuples(_sym, _sym), max_size=6))
@settings(max_examples=300, deadline=None)
def test_bpe_encode_word_properties(word, merges):
    from mc2skos_spark.functions.bpe import encode_word
    out = encode_word(word, merges)
    # losslessness: tokens concatenate back to the word
    assert "".join(out) == word
    # every emitted token is a single char or a product of the merges
    vocab = set(word) | {a + b for a, b in merges}
    assert all(t in vocab for t in out)
    # closure/idempotence: every emitted token, re-encoded in
    # isolation with the same ordered merge list, reproduces itself —
    # the greedy passes rebuild the token bottom-up from its own
    # characters exactly as they did inside the word
    for t in out:
        assert encode_word(t, merges) == [t]
