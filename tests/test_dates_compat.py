"""Fast date parsers must be bit-compatible with strptime, including
the flexible-width backtracking cases (real 005 values like
``201709121656.1`` parse as minute=5, second=6)."""

import random
from datetime import datetime

from mc2skos_spark.core.dates import parse_005, parse_yymmdd


def both(fast, fmt, s):
    try:
        want = datetime.strptime(s, fmt)
    except ValueError:
        want = "ERR"
    try:
        got = fast(s)
    except ValueError:
        got = "ERR"
    assert got == want, (s, got, want)


def test_known_noncanonical_005():
    both(parse_005, "%Y%m%d%H%M%S.%f", "201709121656.1")
    both(parse_005, "%Y%m%d%H%M%S.%f", "20150910004647.0")
    both(parse_005, "%Y%m%d%H%M%S.%f", "20170814095021.0")
    both(parse_005, "%Y%m%d%H%M%S.%f", "garbage")


def test_fuzz_compat():
    rng = random.Random(7)
    for _ in range(2000):
        s = "".join(rng.choice("0123456789")
                    for _ in range(rng.randint(0, 18)))
        if rng.random() < 0.8:
            s += "." + "".join(rng.choice("0123456789")
                               for _ in range(rng.randint(0, 7)))
        both(parse_005, "%Y%m%d%H%M%S.%f", s)
    for _ in range(2000):
        s = "".join(rng.choice("0123456789x")
                    for _ in range(rng.randint(0, 8)))
        both(parse_yymmdd, "%y%m%d", s)
