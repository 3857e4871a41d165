"""Concept property bag → normalized triple rows (the U1 "unpivot").

Reproduces ``add_record_to_graph`` (/root/reference/mc2skos/mc2skos.py:
50-154) as a pure fan-out function.  Output rows are 7-tuples::

    (subj, pred, obj, obj_is_literal, obj_lang, obj_datatype, component_pos)

* literal objects carry ``obj_is_literal=True`` plus optional language
  tag / datatype (xsd:date for created/modified, xsd:boolean for
  owl:deprecated — mc2skos.py:70-73,131);
* ordered ``mads:componentList`` cons-lists (bnodes in the reference,
  mc2skos.py:133-148) are normalized to positional rows
  ``(subj, mads:componentList, component_uri, pos=k)`` exactly as the
  reference's own test normalizes them via a SPARQL ``rdf:rest*`` walk
  (test/test_process_record.py:527-536);
* rdflib ``Graph`` *set* semantics (duplicate collapse) are applied by
  the caller with a hash-dedup over the full row.
"""

from __future__ import annotations

from . import constants as C

XSD_DATE = C.XSD + "date"
XSD_BOOLEAN = C.XSD + "boolean"


def _uri(subj, pred, obj):
    return (subj, pred, obj, False, None, None, None)


def _lit(subj, pred, obj, lang=None, datatype=None):
    return (subj, pred, obj, True, lang, datatype, None)


def concept_to_triples(bag: dict, options: dict | None = None) -> list[tuple]:
    """Fan a concept bag out into triple rows (mc2skos.py:50-154).

    ``options`` flags (same keys as the reference): ``include_webdewey``,
    ``include_altlabels``, ``include_components``, ``exclude_notes``.
    """
    options = options or {}
    uri = bag["uri"]
    lang = bag["lang"]
    out: list[tuple] = []

    out.append(_uri(uri, C.RDF + "type", C.SKOS + "Concept"))

    for scheme_uri in bag["scheme_uris"]:
        if bag["is_top_concept"]:
            out.append(_uri(uri, C.SKOS + "topConceptOf", scheme_uri))
        else:
            out.append(_uri(uri, C.SKOS + "inScheme", scheme_uri))

    if bag["created"] is not None:
        out.append(_lit(uri, C.DCTERMS + "created",
                        bag["created"].strftime("%Y-%m-%d"),
                        datatype=XSD_DATE))
    if bag["modified"] is not None:
        out.append(_lit(uri, C.DCTERMS + "modified",
                        bag["modified"].strftime("%Y-%m-%d"),
                        datatype=XSD_DATE))

    if bag["notation"]:
        # Table records prefix 'T' in the literal only (mc2skos.py:76-80).
        notation = bag["notation"]
        if bag["record_type"] == C.TABLE_RECORD:
            notation = "T" + notation
        out.append(_lit(uri, C.SKOS + "notation", notation))

    if bag["control_number"]:
        out.append(_lit(uri, C.DCTERMS + "identifier", bag["control_number"]))

    # U2: prefLabel, with webdewey first-index-term fallback that also
    # removes the promoted term from the altLabel list (mc2skos.py:86-94).
    alt_labels = list(bag["altLabel"])
    if bag["prefLabel"]:
        out.append(_lit(uri, C.SKOS + "prefLabel", bag["prefLabel"], lang=lang))
    elif options.get("include_webdewey") and alt_labels:
        caption = alt_labels.pop(0)
        if alt_labels:
            caption = caption + ", …"
        out.append(_lit(uri, C.SKOS + "prefLabel", caption, lang=lang))

    if options.get("include_altlabels"):
        for label in alt_labels:
            out.append(_lit(uri, C.SKOS + "altLabel", label, lang=lang))

    # E5 relation filter is upstream (relations with failed minting never
    # reach the bag); emit the surviving edges (mc2skos.py:101-104).
    for relation in bag["relations"]:
        if relation.get("uri") is not None:
            out.append(_uri(uri, relation["relation"], relation["uri"]))

    if not options.get("exclude_notes"):
        note_preds = [
            ("definition", C.SKOS + "definition"),
            ("note", C.SKOS + "note"),
            ("editorialNote", C.SKOS + "editorialNote"),
            ("scopeNote", C.SKOS + "scopeNote"),
            ("historyNote", C.SKOS + "historyNote"),
            ("changeNote", C.SKOS + "changeNote"),
            ("example", C.SKOS + "example"),
        ]
        for key, pred in note_preds:
            for note in bag[key]:
                out.append(_lit(uri, pred, note, lang=lang))

    if bag["deprecated"]:
        out.append(_lit(uri, C.OWL + "deprecated", "true",
                        datatype=XSD_BOOLEAN))

    # U3: positional normalization of the component cons-list.
    if options.get("include_components"):
        for pos, component_uri in enumerate(bag["component_uris"]):
            out.append((uri, C.MADS + "componentList", component_uri,
                        False, None, None, pos))

    if options.get("include_webdewey"):
        for key, values in bag["webDeweyExtras"].items():
            for value in values:
                out.append(_lit(uri, C.WD + key, value, lang=lang))

    return out
