"""Record-type / number-type enums.

Values mirror /root/reference/mc2skos/constants.py:5-16 so that extracted
columns are string-comparable with expectations ported from the reference
test-suite.
"""

SCHEDULE_RECORD = "schedule_record"
TABLE_RECORD = "table_record"
INTERNAL_SUMMARY_OF_SCHEDULE_NUMBER = "internal_summary_of_schedule_number"
EXTERNAL_SUMMARY = "external_summary"
INTERNAL_SUMMARY_OF_TABLE_NUMBER = "internal_summary_of_table_number"
MANUAL_NOTE_RECORD = "manual_note_record"

UNKNOWN = "unknown"

SINGLE_NUMBER = "single_number"
NUMBER_SPAN = "number_span"
SUMMARY_NUMBER_SPAN = "summary_number_span"

# Well-known namespaces used in emitted triples
# (bound in /root/reference/mc2skos/mc2skos.py:46-47,290-295).
SKOS = "http://www.w3.org/2004/02/skos/core#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
OWL = "http://www.w3.org/2002/07/owl#"
DCTERMS = "http://purl.org/dc/terms/"
XSD = "http://www.w3.org/2001/XMLSchema#"
WD = "http://data.ub.uio.no/webdewey-terms#"
MADS = "http://www.loc.gov/mads/rdf/v1#"

# G2 --expand inverse-edge map, mirroring skosify.infer (skos_related
# symmetrizes; skos_hierarchical(narrower=True) keeps broader/narrower
# bidirectional; skos_topConcept syncs topConceptOf/hasTopConcept).
# Single source of truth for operators/expand.py (DataFrame path) and
# core/api.py (Spark-free library path).
SKOS_INVERSES = {
    SKOS + "related": SKOS + "related",
    SKOS + "broader": SKOS + "narrower",
    SKOS + "narrower": SKOS + "broader",
    SKOS + "topConceptOf": SKOS + "hasTopConcept",
    SKOS + "hasTopConcept": SKOS + "topConceptOf",
}
