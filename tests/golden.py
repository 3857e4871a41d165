"""Shared golden-fixture enumeration for the example-based tests.

The family→flags mapping now lives in the package
(:mod:`mc2skos_spark.sources.examples`) because the driver-oracle query
``kg_golden_triples`` consumes it too; this module stays as the test-
suite import point.
"""

from __future__ import annotations

from mc2skos_spark.sources.examples import (EXAMPLES_DIR, FAMILIES,  # noqa
                                            golden_cases)
