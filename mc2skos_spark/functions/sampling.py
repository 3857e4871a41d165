"""Deterministic sampling operators for training-data pipelines.

Corpus mixing is a first-class pre-training step: downsample
low-quality strata, upsample scarce languages, hold out eval slices —
and it must be DETERMINISTIC (re-runs and resumed jobs must pick the
same rows; ``df.sample`` is partition-layout-dependent and not
reproducible across repartitions).

The decision here is a pure function of the row id: a Knuth-style
multiplicative hash mapped to [0, 1) and compared to the stratum's
rate.  All arithmetic stays within exact int64 range (ANSI mode
throws on overflow) and is plain-SQL-mirrorable, so the driver oracle
verifies the exact row selection.  Production pipelines with opaque
string keys would use ``xxhash64`` instead — same shape, same
determinism, minus the cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# mix constants: classic LCG multiplier/increment reduced by primes
# small enough that (id % _P1) * _MUL + _INC stays far below 2^63
_P1 = 1000003
_MUL = 69069
_INC = 12345
_P2 = 999983


def hash_fraction(id_col) -> Column:
    """Deterministic pseudo-uniform [0, 1) from an integer id.
    Partition-layout-independent: depends on the id value only."""
    mixed = F.pmod(F.pmod(id_col, F.lit(_P1)) * _MUL + _INC, F.lit(_P2))
    return mixed / F.lit(float(_P2))


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], default_rate: float = 1.0,
                      id_col: str = "doc_id") -> DataFrame:
    """Keep each row with its stratum's probability, decided by the
    row's deterministic hash fraction.  One codegen filter on the scan
    — no shuffle, no RNG state, stable under retries/resume.

    ``rates`` maps stratum value → keep rate in [0, 1]; unlisted
    strata use ``default_rate``.
    """
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))) \
                .otherwise(rate)
    return df.filter(hash_fraction(F.col(id_col)) < rate)
