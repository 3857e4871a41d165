"""Vocabulary registry + URI-template mini-language.

Re-implements the semantics of /root/reference/mc2skos/vocabularies.py
(registry: :37-83, template engine: :113-160) and embeds the scheme data
from /root/reference/mc2skos/vocabularies.yml:1-54 as Python literals
(config data, restated — the YAML loader is not needed offline).

Template mini-language: ``{param}``, ``{param[start:end]}``,
``{param[start:end]:fmt}`` where ``:d``/``:f`` cast to int/float, plus a
leading-organization strip on control numbers (``^\\(.+\\)(.+)$`` → group 1)
and whitespace→replacement-char substitution in the final URI.

Quirks preserved on purpose (each has a regression test):

* ``whitespace: ''`` is falsy and therefore falls back to ``'-'``
  (vocabularies.py:102) — proven by the isni URI with dashes in
  /root/reference/examples/gnd-1020118989.ttl:15;
* scheme URIs force ``control_number=''`` (vocabularies.py:126-127);
* an empty sliced value skips the numeric cast (vocabularies.py:138-142);
* scheme code ``'n'`` ("source not specified") is always unknown
  (vocabularies.py:50-51).
"""

from __future__ import annotations

import re

from .errors import UnknownSchemeError

CLASSIFICATION = "classification"
AUTHORITY = "authority"

# Scheme registry data (vocabularies.yml:1-54 restated).  A plain string
# value means base_uri; a dict gives concept/scheme/whitespace overrides.
VOCABULARY_DATA: dict[str, dict[str, dict | str]] = {
    CLASSIFICATION: {
        "asb": "http://uri.gbv.de/terminology/asb/{object}",
        "bkl": "http://uri.gbv.de/terminology/bk/{object}",
        "ddc": "http://dewey.info/{collection}/{object}/e{edition}/",
        "rvk": {
            "concept": "http://rvk.uni-regensburg.de/nt/{object}",
            "scheme": "http://rvk.uni-regensburg.de/nt/",
            "whitespace": "_",
        },
        "utklklass": {
            "concept": "http://data.ub.uio.no/lklass/L{object[2:]}",
            "scheme": "http://data.ub.uio.no/lklass/",
        },
    },
    AUTHORITY: {
        "a": {
            "concept": "http://id.loc.gov/authorities/subjects/{control_number}",
            "scheme": "http://id.loc.gov/authorities/subjects",
        },
        "d": "http://lod.nal.usda.gov/nalt/{control_number[4:]:d}",
        "usvd": {
            "concept": "http://data.ub.uio.no/usvd/c{control_number[4:]}",
            "scheme": "http://data.ub.uio.no/usvd/",
        },
        "humord": {
            "concept": "http://data.ub.uio.no/humord/c{control_number[4:]}",
            "scheme": "http://data.ub.uio.no/humord/",
        },
        "noubojur": {
            "concept": "http://data.ub.uio.no/lskjema/c{control_number[4:]:06d}",
            "scheme": "http://data.ub.uio.no/lskjema/",
        },
        "noubomn": {
            "concept": "http://data.ub.uio.no/realfagstermer/c{control_number[4:]}",
            "scheme": "http://data.ub.uio.no/realfagstermer/",
        },
        "noubomr": {
            "concept": "http://data.ub.uio.no/mrtermer/c{control_number[3:]}",
            "scheme": "http://data.ub.uio.no/mrtermer/",
        },
        "gnd": {
            "concept": "http://d-nb.info/gnd/{control_number}",
            "scheme": "http://d-nb.info/gnd/",
        },
        "lccn": {
            "concept": "http://id.loc.gov/authorities/names/{control_number}",
            "scheme": "http://id.loc.gov/authorities/names/",
        },
        "lcgft": {
            "concept": "http://id.loc.gov/authorities/genreForms/{control_number}",
            "scheme": "http://id.loc.gov/authorities/genreForms",
        },
        "ddcri": {
            "scheme": "http://id.loc.gov/vocabulary/subjectSchemes/ddcri",
        },
        "TESA": {
            "scheme": "http://lod.nal.usda.gov/nalt/",
        },
        "viaf": {
            "concept": "http://viaf.org/viaf/{control_number}",
        },
        "wikidata": {
            "concept": "http://www.wikidata.org/entity/{control_number}",
        },
        "isni": {
            "concept": "http://isni.org/{control_number}",
            "whitespace": "",  # falsy → '-' (the preserved quirk)
        },
        "orcid": {
            "concept": "https://orcid.org/{control_number}",
        },
    },
}

_PLACEHOLDER_RE = re.compile(
    r"\{(?P<param>[a-z_]+)"
    r"(?:\[(?P<start>\d+)?:(?P<end>\d+)?\])?"
    r"(?P<formatter>[:!][^\}]+)?\}"
)
_ORG_PREFIX_RE = re.compile(r"^\(.+\)(.+)$")


class ConceptScheme:
    """One vocabulary's URI-minting configuration (vocabularies.py:87-160)."""

    def __init__(self, concept_type: str | None = None, code: str | None = None,
                 edition: str | None = None, options: dict | None = None):
        options = options or {}
        self.type = concept_type
        self.code = code
        self.edition = edition
        self.options = options
        self.edition_numeric = re.sub(r"[^0-9]", "", edition or "")
        self.uri_templates = {
            "concept": options.get("concept") or options.get("base_uri"),
            "scheme": options.get("scheme") or options.get("base_uri"),
        }
        # NB: `or` not `if None` — empty string falls back (the quirk).
        self.whitespace = options.get("whitespace") or "-"

    def with_edition(self, edition: str) -> "ConceptScheme":
        return ConceptScheme(self.type, self.code, edition, self.options)

    def uri(self, uri_type: str, **kwargs) -> str:
        if uri_type not in self.uri_templates:
            raise ValueError("Unknown URI type: %s" % uri_type)
        template = self.uri_templates[uri_type]
        if template is None:
            raise UnknownSchemeError(
                self.code,
                message='No URI template found for URIs of type "%s" in '
                        'vocabulary "%s"' % (uri_type, self.code))

        kwargs["edition"] = self.edition_numeric
        if uri_type == "scheme":
            kwargs["control_number"] = ""
        if kwargs.get("control_number") is not None:
            kwargs["control_number"] = _ORG_PREFIX_RE.sub(
                r"\1", kwargs["control_number"])

        def expand(match: re.Match) -> str:
            start = int(match.group("start")) if match.group("start") else None
            end = int(match.group("end")) if match.group("end") else None
            value = kwargs[match.group("param")][start:end]
            if len(value) == 0:
                # Empty → skip numeric casts (scheme URIs pass '').
                fmt = "{0}"
            else:
                fmt = ("{0" + match.group("formatter") + "}"
                       if match.group("formatter") else "{0}")
                if "d" in fmt:
                    value = int(value)
                elif "f" in fmt:
                    value = float(value)
            return fmt.format(value)

        uri = _PLACEHOLDER_RE.sub(expand, template)
        # Second pass for any literal braces the regex did not consume
        # (the reference calls str.format after the substitution).
        uri = uri.format(**kwargs)
        return uri.replace(" ", self.whitespace)


class Vocabularies:
    """Scheme registry with edition memo-cache (vocabularies.py:10-83)."""

    def __init__(self):
        self.entries: dict[str, ConceptScheme] = {}
        self.default_scheme: ConceptScheme | None = None
        for concept_type, vocabs in VOCABULARY_DATA.items():
            for scheme_code, options in vocabs.items():
                if isinstance(options, str):
                    options = {"base_uri": options}
                self.entries[scheme_code] = ConceptScheme(
                    concept_type, scheme_code, options=options)

    def __iter__(self):
        return iter(self.entries.values())

    def set_default_scheme(self, generic: str | None = None,
                           concept: str | None = None,
                           scheme: str | None = None,
                           whitespace: str | None = None) -> None:
        if generic is None and concept is None and scheme is None:
            self.default_scheme = None
            return
        options = {"base_uri": generic, "concept": concept,
                   "scheme": scheme, "whitespace": whitespace}
        if scheme in self.entries:
            self.default_scheme = self.entries[scheme]
        else:
            self.default_scheme = ConceptScheme(options=options)

    def get(self, scheme_code: str | None, edition: str | None = None) -> ConceptScheme:
        if scheme_code == "n":
            raise UnknownSchemeError()
        if scheme_code not in self.entries:
            raise UnknownSchemeError(scheme_code)
        scheme = self.entries[scheme_code]
        if edition is not None:
            key = "%s-%s" % (scheme_code, edition)
            if key not in self.entries:
                self.entries[key] = scheme.with_edition(edition)
            return self.entries[key]
        return scheme

    def get_for_classification(self, scheme_code: str | None,
                               edition: str | None) -> ConceptScheme:
        """084 $a (+ $c edition) resolution (vocabularies.py:77-81)."""
        if self.default_scheme is not None:
            return self.default_scheme
        if scheme_code:
            return self.get(scheme_code, edition=edition)
        raise UnknownSchemeError()

    def get_for_authority(self, code_008_11: str | None,
                          code_040_f: str | None) -> ConceptScheme:
        """008[11] resolution, ``z`` deferring to 040 $f (vocabularies.py:67-75)."""
        if self.default_scheme is not None:
            return self.default_scheme
        code = code_008_11
        if code == "z":
            code = code_040_f
        if code:
            return self.get(code)
        raise UnknownSchemeError()
