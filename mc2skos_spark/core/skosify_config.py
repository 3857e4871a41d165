"""Skosify configuration-file parser (Spark-free).

The reference's ``--skosify`` takes a *config path*
(/root/reference/mc2skos/mc2skos.py:244-245,198-201: ``config =
skosify.config(path)``; ``skosify.skosify(graph, **config)``) in
skosify's INI format — sections ``[options] [namespaces] [types]
[literals] [relations]``, with ``[options]`` keys like the reference's
own example (/root/reference/examples/skosify.cfg:1-5: ``narrower=True``
/ ``transitive=True``).

This module maps that file format onto the engine's oracle-verified
post-pass operators:

========================  =====================================================
``narrower``              hierarchical inverse edges (broader <-> narrower),
                          ``operators/expand.py:expand_hierarchical``
``transitive``            ``skos:broaderTransitive`` materialization,
                          ``operators/closure.py:broader_transitive``
``break_cycles``          hierarchy-cycle detection feeding the warning
                          side-channel, ``operators/closure.py:cycle_members``
                          (reported, never silently repaired — a distributed
                          pipeline must not drop edges nondeterministically)
``preflabel_policy``      multiple-prefLabel-per-language detection,
                          ``operators/validate.py:duplicate_preflabels``
                          (reported; the policy value is recorded in stats)
(always, like skosify's     altLabel/prefLabel overlap check + the automatic
check pass)                 repair, ``operators/validate.py``
========================  =====================================================

Keys outside that set are collected in ``unsupported`` so the caller can
warn-and-continue (the engine's P7/P8 policy) instead of failing a
reference invocation outright.
"""

from __future__ import annotations

import configparser

#: [options] keys the engine maps onto operators, with skosify's
#: defaults for the ones the reference example exercises.
OPTION_DEFAULTS: dict[str, object] = {
    "narrower": True,
    "transitive": False,
    "break_cycles": False,
    "preflabel_policy": "shortest",
}

_BOOL_KEYS = {k for k, v in OPTION_DEFAULTS.items()
              if isinstance(v, bool)}


def parse_skosify_config(path: str) -> dict:
    """Parse a skosify INI config into engine toggles.

    Returns ``{**OPTION_DEFAULTS-overridden, "unsupported": [...]}``.
    Booleans accept the INI spellings (``True/false/yes/no/1/0``);
    unknown ``[options]`` keys and any non-empty extension section
    entries land in ``unsupported`` rather than raising.
    """
    cp = configparser.ConfigParser()
    with open(path, encoding="utf-8") as fp:
        try:
            cp.read_file(fp)
        except configparser.Error as exc:
            raise ValueError(
                "--skosify expects a skosify INI config file; %r is "
                "not one (%s)" % (path, exc)) from exc

    out: dict = dict(OPTION_DEFAULTS)
    unsupported: list[str] = []
    if cp.has_section("options"):
        for key in cp.options("options"):
            if key in _BOOL_KEYS:
                out[key] = cp.getboolean("options", key)
            elif key in OPTION_DEFAULTS:
                out[key] = cp.get("options", key)
            else:
                unsupported.append("options.%s" % key)
    for section in cp.sections():
        if section == "options":
            continue
        for key in cp.options(section):
            unsupported.append("%s.%s" % (section, key))
    out["unsupported"] = unsupported
    return out
