"""Entity-link scoring (operators/linking.py): cross-scheme label
similarity candidates, scored sameAs union, linked canonicalization."""

import pytest
from pyspark.sql import functions as F

from mc2skos_spark.core.constants import DCTERMS, SKOS
from mc2skos_spark.operators.linking import (label_link_candidates,
                                             linked_canonical_mapping,
                                             scored_sameas_edges)
from mc2skos_spark.plans import schemas

pytestmark = pytest.mark.spark


def _pref(subj, label, scheme):
    return [(subj, SKOS + "prefLabel", label, True, "en",
             None, None, "r"),
            (subj, SKOS + "inScheme", scheme, False, None,
             None, None, "r")]


@pytest.fixture()
def link_triples(spark):
    rows = []
    # A (scheme s1) and B (scheme s2): near-identical labels → linked
    rows += _pref("uri:A", "solar power generation methods", "s1")
    rows += _pref("uri:B", "solar power generation methods extra", "s2")
    # C (s1) and D (s1): identical labels but SAME scheme → not linked
    rows += _pref("uri:C", "wind turbine blade design", "s1")
    rows += _pref("uri:D", "wind turbine blade design", "s1")
    # E (s2): unrelated label → not linked to anything
    rows += _pref("uri:E", "medieval manuscript preservation", "s2")
    # F (s3) shares an identifier with A → exact edge at 1.0
    rows += _pref("uri:F", "completely different label here", "s3")
    rows += [("uri:A", DCTERMS + "identifier", "0042", True, None,
              None, None, "r"),
             ("uri:F", DCTERMS + "identifier", "0042", True, None,
              None, None, "r")]
    return spark.createDataFrame(rows, schema=schemas.TRIPLES)


def test_label_links_cross_scheme_only(link_triples):
    got = {(r["src"], r["dst"]): r["score"]
           for r in label_link_candidates(link_triples,
                                          threshold=0.6).collect()}
    # A-B bigram shingles: A has 3, B has 4, 3 shared →
    # 3 / (3 + 4 - 3) = 0.75; C-D identical but same scheme: excluded
    assert got == {("uri:A", "uri:B"): 0.75}


def test_scored_sameas_union(link_triples):
    got = {(r["src"], r["dst"]): r["score"]
           for r in scored_sameas_edges(link_triples,
                                        threshold=0.6).collect()}
    assert got == {("uri:A", "uri:B"): 0.75}
    # identifier edge: authorities differ ("uri:A" vs "uri:F" share
    # the substring_index(…,"/",3) prefix "uri:A"/"uri:F"... the
    # agency scoping keys on the URI authority — here they differ, so
    # the exact edge is dropped by design; re-check with same-authority
    # URIs below


def test_scored_sameas_identifier_edge(spark):
    rows = []
    rows += _pref("http://x.org/a/1", "alpha beta gamma", "s1")
    rows += _pref("http://x.org/a/2", "delta epsilon zeta", "s2")
    rows += [("http://x.org/a/1", DCTERMS + "identifier", "0042", True,
              None, None, None, "r"),
             ("http://x.org/a/2", DCTERMS + "identifier", "0042", True,
              None, None, None, "r")]
    t = spark.createDataFrame(rows, schema=schemas.TRIPLES)
    got = {(r["src"], r["dst"]): r["score"]
           for r in scored_sameas_edges(t, threshold=0.9).collect()}
    assert got == {("http://x.org/a/1", "http://x.org/a/2"): 1.0}
    mapping = {(r["uri"], r["canonical"])
               for r in linked_canonical_mapping(t).collect()}
    assert mapping == {("http://x.org/a/2", "http://x.org/a/1")}


def test_linked_canonical_mapping_merges_label_pair(link_triples):
    mapping = {(r["uri"], r["canonical"])
               for r in linked_canonical_mapping(
                   link_triples, link_threshold=0.6).collect()}
    assert mapping == {("uri:B", "uri:A")}
