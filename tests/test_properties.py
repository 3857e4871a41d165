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
