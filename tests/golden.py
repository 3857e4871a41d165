"""Shared golden-fixture enumeration for the example-based tests.

Mirrors the per-family conversion flags of
/root/reference/test/test_process_examples.py:49-117:
ddc → webdewey; bk/asb/rvk → altlabels; authority families → altlabels,
with gnd additionally pinning the default scheme (issue #56).
"""

from __future__ import annotations

import glob
import os
import re

EXAMPLES_DIR = os.environ.get("MC2SKOS_EXAMPLES_DIR",
                              "/root/reference/examples")

_FAMILIES = [
    (r"ddc\d{2}[a-z]+-.*", {"include_webdewey": True}, None),
    (r"(bk|asb)-.*", {"include_altlabels": True}, None),
    (r"rvk(-.*)?", {"include_altlabels": True}, None),
    (r"(lcgft|lcsh|noubomn|noubojur|humord|nalt)-.*",
     {"include_altlabels": True}, None),
    (r"gnd-.*", {"include_altlabels": True}, "gnd"),
]


def golden_cases():
    """Yield (name, xml_path, ttl_path, options, default_scheme)."""
    cases = []
    for xml_path in sorted(glob.glob(os.path.join(EXAMPLES_DIR, "*.xml"))):
        stem = os.path.splitext(os.path.basename(xml_path))[0]
        ttl_path = os.path.splitext(xml_path)[0] + ".ttl"
        if not os.path.isfile(ttl_path):
            continue
        for pattern, options, default_scheme in _FAMILIES:
            if re.fullmatch(pattern, stem):
                cases.append((stem, xml_path, ttl_path, dict(options),
                              default_scheme))
                break
    return cases
