"""Deterministic sampling operators for training-data pipelines.

Corpus mixing is a first-class pre-training step: downsample
low-quality strata, upsample scarce languages, hold out eval slices —
and it must be DETERMINISTIC (re-runs and resumed jobs must pick the
same rows; ``df.sample`` is partition-layout-dependent and not
reproducible across repartitions).

The decision here is a pure function of the row id: two rounds of
multiply-mod-2³¹ + xorshift (a splitmix-style finalizer) mapped to
[0, 1) and compared to the stratum's rate.  A single affine map
(LCG-style) is NOT enough — it is linear in the id, so decisions
repeat at the modulus lag and arithmetic-progression ids get strongly
serially-correlated fractions; the xorshift rounds break the
linearity.  All arithmetic stays within exact int64 range (ANSI mode
throws on overflow) and is plain-SQL-mirrorable (%, *, +, integer
div, xor), so the driver oracle verifies the exact row selection.
Production pipelines with opaque string keys would use ``xxhash64``
instead — same shape, same determinism, minus the cross-engine
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_M31 = 1 << 31            # working modulus: products stay below 2^63
_MUL1 = 2654435761        # Knuth multiplicative constants
_INC1 = 1013904223
_MUL2 = 1540483477


def hash_fraction(id_col) -> Column:
    """Deterministic pseudo-uniform [0, 1) from an integer id.
    Partition-layout-independent: depends on the id value only.

    Precondition: ids must be NON-NEGATIVE (the documents-table
    contract).  For negative ids Spark's ``pmod``/``shiftrightunsigned``
    and ANSI-SQL's sign-preserving ``%`` / floor ``//`` diverge, so the
    cross-engine oracle guarantee would not hold."""
    x = F.pmod(F.pmod(id_col, F.lit(_M31)) * _MUL1 + _INC1, F.lit(_M31))
    x = x.bitwiseXOR(F.shiftrightunsigned(x, 16))
    x = F.pmod(x * _MUL2, F.lit(_M31))
    x = x.bitwiseXOR(F.shiftrightunsigned(x, 16))
    return x / F.lit(float(_M31))


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
