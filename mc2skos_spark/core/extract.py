"""Record dict → concept property bag (the §1b intermediate schema).

Pure-Python re-expression of the eager single-pass parse in
/root/reference/mc2skos/record.py (``Record.parse``:129-159,
``ClassificationRecord.parse``:266-435, ``AuthorityRecord.parse``:619-761)
plus the leader dispatch of /root/reference/mc2skos/mc2skos.py:157-177.

The entry point :func:`extract_concept` returns either a concept dict or
raises :class:`InvalidRecordError`; batch callers convert the exception
into a quarantine row (never throw on the executor hot path).
"""

from __future__ import annotations

from .dates import parse_005, parse_yymmdd

from . import constants as C
from .errors import InvalidRecordError, UnknownSchemeError
from .folds import (assemble_heading_label, collect_terms,
                    parse_008_classification, parse_153,
                    parse_765_components, scan_mappings, stringify)
from .languages import ISO639_2B_TO_1
from .marcxml import (controlfield, datafield_subfield_text, datafields,
                      ess_codes, first_datafield, subfield_text,
                      subfield_texts)
from .util import is_uri
from .vocab import Vocabularies

SKOS = C.SKOS


def _capitalize(value: str) -> str:
    """Python ``str.capitalize`` — first char upper, rest LOWER.

    Not ``initcap``: the reference capitalizes webdewey topics with the
    plain string method (/root/reference/mc2skos/record.py:342).
    """
    return value.capitalize()


def _mint_relation(vocabularies: Vocabularies, relations: list,
                   warnings: list, scheme_code: str | None, relation: str,
                   tag: str | None = None, **kwargs) -> None:
    """append_relation (/root/reference/mc2skos/record.py:164-181):
    resolve scheme, mint URI, warn-and-skip when the scheme is unknown."""
    try:
        scheme = vocabularies.get(scheme_code, edition=kwargs.get("edition"))
        uri = scheme.uri("concept", **kwargs)
    except UnknownSchemeError:
        warnings.append(
            'unknown scheme "%s"%s' % (scheme_code,
                                       " in field %s" % tag if tag else ""))
        return
    except (TypeError, ValueError, IndexError, KeyError) as exc:
        # malformed edge data (e.g. a mapping field with $2 but no
        # value: template expansion slices None) — contain the damage
        # to THIS edge like the unknown-scheme branch above, instead of
        # quarantining the whole record
        warnings.append(
            "cannot mint %s URI%s: %s"
            % (relation.rpartition("#")[2],
               " in field %s" % tag if tag else "", exc))
        return
    if uri:
        relations.append({"uri": uri, "relation": relation})


def _base_parse(rec: dict, bag: dict) -> None:
    """Shared field extraction (/root/reference/mc2skos/record.py:129-159)."""
    # T1 control-number precedence: 016 $a > 010 $a > 001.
    control_number = controlfield(rec, "001")
    value = datafield_subfield_text(rec, "010", "a")
    if value is not None:
        control_number = value
    value = datafield_subfield_text(rec, "016", "a")
    if value is not None:
        control_number = value
    bag["control_number"] = control_number
    bag["control_number_identifier"] = controlfield(rec, "003")

    # T2: 005 → modified (invalid → warn + None, record.py:149-155).
    value = controlfield(rec, "005")
    if value is not None:
        try:
            bag["modified"] = parse_005(value)
        except ValueError:
            bag["warnings"].append("invalid date in 005 field: %s" % value)

    # T4: 040 $b ISO639-2b → ISO639-1, default eng→en (record.py:157-159).
    lang2b = datafield_subfield_text(rec, "040", "b") or "eng"
    try:
        bag["lang"] = ISO639_2B_TO_1[lang2b]
    except KeyError:
        raise InvalidRecordError("unknown language code in 040 $b: %s" % lang2b,
                                 control_number=control_number)


def _new_bag(kind: str) -> dict:
    return {
        "kind": kind,
        "control_number": None,
        "control_number_identifier": None,
        "created": None,
        "modified": None,
        "lang": None,
        "prefLabel": None,
        "altLabel": [],          # list[str] terms, order preserved
        "definition": [],
        "editorialNote": [],
        "note": [],
        "components": [],
        "scopeNote": [],
        "historyNote": [],
        "changeNote": [],
        "example": [],
        "relations": [],         # list[{"uri","relation"}]
        "webDeweyExtras": {},    # key → list[str]
        "deprecated": False,
        "is_top_concept": False,
        "notation": None,
        "table": None,
        "record_type": None,
        "number_type": None,
        "display": True,
        "synthesized": False,
        "uri": None,
        "scheme_uris": [],
        "component_uris": [],
        "is_public": True,
        "warnings": [],
    }


def _wrap_crash(fn, *args, control_number=None, what=""):
    try:
        return fn(*args)
    except InvalidRecordError:
        raise
    except Exception as exc:  # ValueError/IndexError/TypeError from bad data
        raise InvalidRecordError("cannot parse %s: %s" % (what, exc),
                                 control_number=control_number)


def extract_classification(rec: dict, vocabularies: Vocabularies,
                           options: dict) -> dict:
    bag = _new_bag("classification")
    _base_parse(rec, bag)
    cn = bag["control_number"]

    # T8 scheme resolution: 084 $a (+ $c edition).
    try:
        scheme = vocabularies.get_for_classification(
            datafield_subfield_text(rec, "084", "a"),
            datafield_subfield_text(rec, "084", "c"))
    except UnknownSchemeError as exc:
        exc.control_number = controlfield(rec, "001")
        raise

    # T5: 008 decode.
    value_008 = controlfield(rec, "008")
    (bag["created"], bag["record_type"], bag["number_type"], bag["display"],
     bag["synthesized"], bag["deprecated"]) = _wrap_crash(
        parse_008_classification, value_008, bag["warnings"],
        control_number=cn, what="008")

    # F1: 153 notation state machine (required field, record.py:275-277).
    field_153 = first_datafield(rec, "153")
    if field_153 is None:
        raise InvalidRecordError("153 field is missing", control_number=cn)
    (bag["table"], bag["notation"], bag["is_top_concept"], parent_notation,
     bag["prefLabel"]) = _wrap_crash(
        parse_153, field_153["subfields"], control_number=cn, what="153")

    if bag["record_type"] is None:
        bag["warnings"].append("no 008 field, guessing record type")
        bag["record_type"] = (C.SCHEDULE_RECORD if bag["table"] is None
                              else C.TABLE_RECORD)

    # URI minting (record.py:248-264).  Wrapped so malformed template
    # inputs (e.g. notation None from a $j-only 153: expansion slices
    # None → TypeError) surface as InvalidRecordError — the documented
    # contract of this module — not a raw TypeError.
    bag["scheme_uris"] = []

    def _mint_record_uris():
        if bag["record_type"] == C.TABLE_RECORD:
            uri = scheme.uri("scheme", collection="table",
                             object=bag["table"] if bag["table"] is not None
                             else "")
            if uri:
                bag["scheme_uris"].append(uri)
        obj = "edition" if scheme.edition is not None else ""
        uri = scheme.uri("scheme", collection="scheme", object=obj)
        if uri:
            bag["scheme_uris"].append(uri)
        bag["uri"] = scheme.uri("concept", collection="class",
                                object=bag["notation"], control_number=cn)

    _wrap_crash(_mint_record_uris, control_number=cn, what="URI minting")

    # E1 broader edge (record.py:289-295).
    if parent_notation is not None:
        parent_uri = scheme.uri("concept", collection="class",
                                object=parent_notation)
        if parent_uri is not None:
            bag["relations"].append({"uri": parent_uri,
                                     "relation": SKOS + "broader"})

    # U4 note routing: 253/353/683/684/694 → editorialNote, 685 → history.
    for field in datafields(rec, "253"):
        bag["editorialNote"].append(stringify(field))
    for field in datafields(rec, "353"):
        bag["editorialNote"].append(stringify(field))

    # 680 → definition (ess=ndf) else scopeNote + webdewey topic routing
    # (record.py:336-351).
    for field in datafields(rec, "680"):
        ess = ess_codes(field)
        if "ndf" in ess:
            bag["definition"].append(stringify(field))
        else:
            bag["scopeNote"].append(stringify(field))
            topics = [_capitalize(t) for t in subfield_texts(field, "t")
                      if t is not None]
            for topic in topics:
                if "nvn" in ess:
                    key = "variantName"
                elif "nch" in ess:
                    key = "classHere"
                elif "nin" in ess:
                    key = "including"
                elif "nph" in ess:
                    key = "formerName"
                else:
                    continue
                bag["webDeweyExtras"].setdefault(key, []).append(topic)

    for field in datafields(rec, "683"):
        bag["editorialNote"].append(stringify(field))
    for field in datafields(rec, "685"):
        bag["historyNote"].append(stringify(field))
    for field in datafields(rec, "684", "694"):
        bag["editorialNote"].append(stringify(field))

    # 7XX index terms → altLabel (record.py:390-394).
    for term in collect_terms(rec, "7"):
        bag["altLabel"].append(term["value"])

    # F3/E4: heading-linking mapping edges.
    _apply_mappings(rec, vocabularies, bag)

    # F2: 765 synthesized-number components (non-fatal anomalies land in
    # the bag's warning side-channel, mirroring record.py:427's log line).
    bag["components"] = _wrap_crash(
        parse_765_components, datafields(rec, "765"), bag["warnings"],
        control_number=cn, what="765")

    # U3 prep: component URIs are minted with the record's scheme at
    # fan-out time in the reference (mc2skos.py:136,142); minted here so
    # the triple fan-out stays scheme-free.  Only under the flag, to
    # match when the reference would surface minting errors.
    if options.get("include_components") and bag["components"]:
        bag["component_uris"] = _wrap_crash(
            lambda comps: [scheme.uri("concept", collection="class",
                                      object=comp) for comp in comps],
            bag["components"], control_number=cn, what="765 component URIs")
    else:
        bag["component_uris"] = []

    # P3 publish filter (record.py:574-591).
    if not bag["display"]:
        bag["is_public"] = False
    elif bag["record_type"] not in (C.SCHEDULE_RECORD, C.TABLE_RECORD):
        bag["is_public"] = False
    elif bag["notation"] is not None and ":" in bag["notation"]:
        bag["is_public"] = False

    return bag


def extract_authority(rec: dict, vocabularies: Vocabularies,
                      options: dict) -> dict:
    bag = _new_bag("authority")
    _base_parse(rec, bag)
    cn = bag["control_number"]

    # T8 scheme resolution: 008[11], 'z' → 040 $f (vocabularies.py:67-75).
    field_008 = controlfield(rec, "008")
    code_11 = None
    if field_008:
        code_11 = _wrap_crash(lambda v: v[11], field_008,
                              control_number=cn, what="008")
    try:
        scheme = vocabularies.get_for_authority(
            code_11, datafield_subfield_text(rec, "040", "f"))
    except UnknownSchemeError as exc:
        exc.control_number = controlfield(rec, "001")
        raise

    # URI minting (record.py:599-608).
    bag["scheme_uris"] = []
    scheme_uri = scheme.uri("scheme")
    if scheme_uri:
        bag["scheme_uris"].append(scheme_uri)
    bag["uri"] = _wrap_crash(
        lambda: scheme.uri("concept", control_number=cn),
        control_number=cn, what="URI minting")

    # T6 deprecation from leader[5] (record.py:625-627).
    leader = rec["leader"]
    if leader[5] in ("d", "o", "s", "x"):
        bag["deprecated"] = True

    # T3: created from 008[0:6] (record.py:630-632).
    if field_008:
        bag["created"] = _wrap_crash(
            lambda v: parse_yymmdd(v[:6]), field_008,
            control_number=cn, what="008 date")

    # E3: 065/080/083 class-number exactMatch edges (record.py:634-667).
    def class_number(field: dict) -> str | None:
        start = subfield_text(field, "a")
        end = subfield_text(field, "b")
        if end is not None:
            return "{}-{}".format(start, end)
        return start

    field = first_datafield(rec, "065")
    if field is not None:
        _mint_relation(vocabularies, bag["relations"], bag["warnings"],
                       subfield_text(field, "2"), SKOS + "exactMatch",
                       tag="065", object=class_number(field))
    field = first_datafield(rec, "080")
    if field is not None:
        _mint_relation(vocabularies, bag["relations"], bag["warnings"],
                       "udc", SKOS + "exactMatch",
                       tag="080", object=class_number(field))
    field = first_datafield(rec, "083")
    if field is not None:
        _mint_relation(vocabularies, bag["relations"], bag["warnings"],
                       "ddc", SKOS + "exactMatch", tag="083",
                       collection="class", object=class_number(field),
                       edition=subfield_text(field, "2"))

    # 1XX heading → prefLabel (last wins, record.py:669-671).
    for term in collect_terms(rec, "1"):
        bag["prefLabel"] = term["value"]

    # 4XX see-from → altLabel (record.py:673-677).
    for term in collect_terms(rec, "4"):
        bag["altLabel"].append(term["value"])

    # E2: 5XX see-also tracing edges (record.py:679-708).
    for term in collect_terms(rec, "5"):
        field = term["field"]
        local_id = subfield_text(field, "0")
        if local_id:
            sf_w = subfield_text(field, "w")
            sf_4 = subfield_text(field, "4")
            if sf_w == "g":
                relation = SKOS + "broader"
            elif sf_w == "h":
                relation = SKOS + "narrower"
            elif sf_w == "r" and sf_4 is not None and is_uri(sf_4):
                relation = sf_4
            else:
                relation = SKOS + "related"
            if is_uri(local_id):
                bag["relations"].append({"uri": local_id,
                                         "relation": relation})
            else:
                _mint_relation(vocabularies, bag["relations"],
                               bag["warnings"], scheme.code, relation,
                               tag=field["tag"], control_number=local_id)

    # U4 note routing (record.py:710-751).
    for field in datafields(rec, "667"):
        bag["editorialNote"].append(stringify(field, ("a",)))
    for field in datafields(rec, "670"):
        bag["note"].append("Source: " + stringify(field, ("a",)))
    for field in datafields(rec, "677"):
        bag["definition"].append(stringify(field, ("a",)))
    for field in datafields(rec, "678"):
        bag["note"].append(stringify(field, ("a", "b")))
    for field in datafields(rec, "680"):
        bag["note"].append(stringify(field, ("a", "i")))
    for field in datafields(rec, "681"):
        bag["example"].append(stringify(field, ("a", "i")))
    for field in datafields(rec, "682"):
        bag["changeNote"].append(stringify(field, ("a", "i")))
    for field in datafields(rec, "688"):
        bag["historyNote"].append(stringify(field, ("a",)))

    # F3/E4 heading-linking mapping edges.
    _apply_mappings(rec, vocabularies, bag)

    return bag


def _apply_mappings(rec: dict, vocabularies: Vocabularies, bag: dict) -> None:
    """Route scan_mappings output through minting (record.py:396-404,753-761)."""
    for mapping in scan_mappings(rec):
        if "uri" in mapping:
            bag["relations"].append({"uri": mapping["uri"],
                                     "relation": mapping["relation"]})
        else:
            _mint_relation(vocabularies, bag["relations"], bag["warnings"],
                           mapping["scheme_code"], mapping["relation"],
                           tag=mapping["tag"],
                           control_number=mapping["control_number"])


def extract_concept(rec: dict, vocabularies: Vocabularies,
                    options: dict | None = None) -> dict | None:
    """Leader dispatch + extraction (mc2skos.py:157-177).

    Returns the concept bag, or ``None`` when a skip flag filtered the
    record kind.  Raises :class:`InvalidRecordError` for invalid records.
    """
    options = options or {}
    leader = rec.get("leader")
    if leader is None:
        raise InvalidRecordError("Record does not have a leader",
                                 control_number=controlfield(rec, "001"))
    kind = leader[6] if len(leader) > 6 else ""
    if kind == "w":
        if options.get("skip_classification"):
            return None
        return extract_classification(rec, vocabularies, options)
    if kind == "z":
        if options.get("skip_authority"):
            return None
        return extract_authority(rec, vocabularies, options)
    raise InvalidRecordError(
        "Record is not a Marc21 Classification or Authority record",
        control_number=controlfield(rec, "001"))
