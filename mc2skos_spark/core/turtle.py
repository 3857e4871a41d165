"""Minimal Turtle reader + precision/recall scorer for the golden oracle.

The reference's end-to-end correctness gate is triple containment against
the 38 golden files under /root/reference/examples/*.ttl
(test/test_process_examples.py:29-46).  Those files use a small, regular
Turtle subset (verified: ``@prefix``, ``a``, ``<uri>``, ``prefix:name``,
``"literal"`` with ``@lang`` / ``^^xsd:date``, bare ``true``, ``;``/``,``
continuation — no bnodes, no triple-quoted strings).  This reader covers
exactly that subset plus standard string escapes, producing the same
normalized 7-tuple rows as :mod:`.triples` for set comparison.

This is original tooling (the reference relies on rdflib, unavailable
offline); it is the judge of every extraction stage downstream.
"""

from __future__ import annotations

import re

from . import constants as C

_TOKEN_RE = re.compile(r"""
    (?P<comment>\#[^\n]*)
  | (?P<uri><[^>]*>)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<langtag>@[A-Za-z][A-Za-z0-9\-]*)
  | (?P<dtype>\^\^)
  | (?P<punct>[;,.\[\]\(\)])
  | (?P<pname>[A-Za-z_][\w\-]*)?:(?P<plocal>[\w\-.%]*[\w\-%])?
  | (?P<bare>[A-Za-z][\w\-]*)
  | (?P<ws>\s+)
""", re.VERBOSE)

_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", '"': '"', "\\": "\\",
            "b": "\b", "f": "\f", "'": "'"}


def _unescape(raw: str) -> str:
    out = []
    i = 0
    while i < len(raw):
        ch = raw[i]
        if ch == "\\" and i + 1 < len(raw):
            nxt = raw[i + 1]
            if nxt == "u":
                out.append(chr(int(raw[i + 2:i + 6], 16)))
                i += 6
                continue
            if nxt == "U":
                out.append(chr(int(raw[i + 2:i + 10], 16)))
                i += 10
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _tokenize(text: str):
    pos = 0
    while pos < len(text):
        match = _TOKEN_RE.match(text, pos)
        if match is None:
            raise ValueError("turtle: cannot tokenize at %r" % text[pos:pos + 40])
        pos = match.end()
        if match.lastgroup in ("ws", "comment"):
            continue
        if match.group("uri") is not None:
            yield ("uri", match.group("uri")[1:-1])
        elif match.group("string") is not None:
            yield ("string", _unescape(match.group("string")[1:-1]))
        elif match.group("langtag") is not None:
            yield ("langtag", match.group("langtag")[1:])
        elif match.group("dtype") is not None:
            yield ("dtype", "^^")
        elif match.group("punct") is not None:
            yield ("punct", match.group("punct"))
        elif match.group("bare") is not None:
            yield ("bare", match.group("bare"))
        else:
            yield ("pname", ((match.group("pname") or ""),
                             (match.group("plocal") or "")))


def parse_turtle(text: str) -> list[tuple]:
    """Parse a Turtle document into normalized triple rows."""
    prefixes: dict[str, str] = {}
    rows: list[tuple] = []
    tokens = list(_tokenize(text))
    i = 0
    n = len(tokens)

    def resolve(tok):
        kind, value = tok
        if kind == "uri":
            return value
        if kind == "pname":
            prefix, local = value
            if prefix not in prefixes:
                raise ValueError("turtle: unknown prefix %r" % prefix)
            return prefixes[prefix] + local
        raise ValueError("turtle: expected IRI, got %r" % (tok,))

    while i < n:
        kind, value = tokens[i]
        if kind == "bare" and value == "prefix" or \
           kind == "langtag" and value == "prefix":
            # '@prefix' tokenizes as langtag 'prefix'.  Hard errors, not
            # asserts: this parser is the golden-file judge, so a
            # malformed directive must fail loudly even under python -O
            if i + 3 >= n:
                raise ValueError("turtle: truncated @prefix directive")
            pfx_kind, pfx_value = tokens[i + 1]
            prefixes[pfx_value[0] if pfx_kind == "pname" else ""] = \
                tokens[i + 2][1]
            if tokens[i + 3] != ("punct", "."):
                raise ValueError("turtle: @prefix not terminated by '.', "
                                 "got %r" % (tokens[i + 3],))
            i += 4
            continue

        subj = resolve(tokens[i])
        i += 1
        while True:
            # predicate
            kind, value = tokens[i]
            if kind == "bare" and value == "a":
                pred = C.RDF + "type"
            else:
                pred = resolve(tokens[i])
            i += 1
            while True:
                # object
                kind, value = tokens[i]
                i += 1
                if kind == "string":
                    lang = None
                    datatype = None
                    if i < n and tokens[i][0] == "langtag":
                        lang = tokens[i][1]
                        i += 1
                    elif i < n and tokens[i][0] == "dtype":
                        datatype = resolve(tokens[i + 1])
                        i += 2
                    rows.append((subj, pred, value, True, lang, datatype, None))
                elif kind == "bare" and value in ("true", "false"):
                    rows.append((subj, pred, value, True, None,
                                 C.XSD + "boolean", None))
                else:
                    rows.append((subj, pred, resolve((kind, value)),
                                 False, None, None, None))
                kind, value = tokens[i]
                if (kind, value) == ("punct", ","):
                    i += 1
                    continue
                break
            if (kind, value) == ("punct", ";"):
                i += 1
                # tolerate trailing ';' before '.'
                if tokens[i] == ("punct", "."):
                    i += 1
                    break
                continue
            if (kind, value) == ("punct", "."):
                i += 1
                break
            raise ValueError("turtle: expected ; , or . got %r" % ((kind, value),))
    return rows


def parse_turtle_file(path: str) -> list[tuple]:
    with open(path, encoding="utf-8") as fp:
        return parse_turtle(fp.read())


def precision_recall(produced: list[tuple], golden: list[tuple]):
    """Set precision/recall over normalized triple rows.

    Returns ``(precision, recall, missing, extra)``; the reference's own
    gate is containment (recall == 1.0, test_process_examples.py:45-46),
    BASELINE.md demands ≥0.95 on both.
    """
    produced_set = set(produced)
    golden_set = set(golden)
    if not produced_set and not golden_set:
        return 1.0, 1.0, set(), set()
    tp = len(produced_set & golden_set)
    precision = tp / len(produced_set) if produced_set else 1.0
    recall = tp / len(golden_set) if golden_set else 1.0
    return precision, recall, golden_set - produced_set, produced_set - golden_set
