"""Fast fixed-format date parsing for the extraction hot path.

``datetime.strptime`` spends most of its time in locale/regex machinery;
the two formats the reference uses (005 ``%Y%m%d%H%M%S.%f`` —
record.py:153; 008 ``%y%m%d`` — record.py:444,632) are fixed-width
numeric, so direct slicing + the datetime constructor is ~10x faster
with identical accept/reject behavior (ValueError on anything invalid;
the %y pivot is Python's documented 69 → 19xx / 68 → 20xx rule).
"""

from __future__ import annotations

from datetime import datetime


def _ascii_digits(s: str) -> bool:
    """strptime's numeric fields are hard-coded ``[0-9]``; plain
    ``str.isdigit()``/``int()`` also accept Unicode digits (e.g.
    fullwidth ``５``), so the fast paths must gate on ASCII or they
    would ACCEPT what strptime rejects."""
    return s.isascii() and s.isdigit()


def parse_005(value: str) -> datetime:
    """``%Y%m%d%H%M%S.%f`` with a fast path for the canonical 14-digit
    form.

    strptime matches *flexible-width* numeric fields with regex
    backtracking (a real 005 like ``201709121656.1`` parses as
    minute=5, second=6), so anything non-canonical falls back to
    strptime for bit-exact compatibility.
    """
    if len(value) >= 16 and value[14] == "." and _ascii_digits(value[:14]):
        frac = value[15:]
        if _ascii_digits(frac) and len(frac) <= 6:
            micro = int(frac) * 10 ** (6 - len(frac))
            return datetime(int(value[0:4]), int(value[4:6]),
                            int(value[6:8]), int(value[8:10]),
                            int(value[10:12]), int(value[12:14]), micro)
    return datetime.strptime(value, "%Y%m%d%H%M%S.%f")


def parse_yymmdd(value: str) -> datetime:
    """``%y%m%d`` with the strptime two-digit-year pivot; canonical
    6-digit fast path, strptime fallback for short/odd inputs (strptime
    accepts 1-2 digit fields, e.g. ``0912`` → 2009-01-02)."""
    if len(value) == 6 and _ascii_digits(value):
        yy = int(value[0:2])
        year = 2000 + yy if yy <= 68 else 1900 + yy
        return datetime(year, int(value[2:4]), int(value[4:6]))
    return datetime.strptime(value, "%y%m%d")
