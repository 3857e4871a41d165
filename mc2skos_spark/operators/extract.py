"""Stage 1 — Arrow-batch extraction: record XML → triple + quarantine rows.

The semantic work happens in the pure core (:mod:`..core.extract` /
:mod:`..core.triples`); this module is the thin Spark wrapper:

* ONE ``mapInPandas`` pass per record emits every output row kind
  (SURVEY.md §4: "eager single-pass parse … instead of 30 xpath
  re-scans").  Triples and quarantine rows share a tagged union schema
  (:data:`...plans.schemas.EXTRACTED`) and are split by a cheap filter —
  the parse is never repeated;
* errors NEVER throw on the executor: every failed record becomes a
  quarantine row (reference behavior /root/reference/mc2skos/
  mc2skos.py:184-190 re-expressed as a side-output);
* before the UDF we ``repartition`` by a hash of record_id: Arrow
  batches get size-balanced partitions regardless of how skewed the
  upstream conversations were (north_rule: salted, size-balanced
  partitions before Arrow UDFs);
* rdflib's Graph-set semantics (G1) are the ``dropDuplicates`` in
  :func:`triples_from_extracted` — a hash aggregate with partial
  (map-side) combine from Catalyst.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core.errors import InvalidRecordError
from ..core.extract import extract_concept
from ..core.marcxml import parse_record_xml
from ..core.triples import concept_to_triples
from ..core.vocab import Vocabularies
from ..plans import schemas

_EXTRACTED_COLS = [f.name for f in schemas.EXTRACTED.fields]


def _extract_batches(options: dict, default_scheme: str | None):
    """Build the mapInPandas function; everything it closes over is
    picklable plain data (the Vocabularies registry is rebuilt per
    executor — it is a few KB, the broadcast-dim analog)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocabularies = Vocabularies()
        if default_scheme:
            vocabularies.set_default_scheme(scheme=default_scheme)
        for batch in batches:
            rows = []
            for record_id, xml in zip(batch["record_id"],
                                      batch["record_xml"]):
                try:
                    bag = extract_concept(parse_record_xml(xml),
                                          vocabularies, options)
                except InvalidRecordError as exc:
                    rows.append(("quarantine", None, None, None, None,
                                 None, None, None, record_id, str(exc)))
                    continue
                except Exception as exc:  # malformed XML etc.
                    rows.append(("quarantine", None, None, None, None,
                                 None, None, None, record_id,
                                 "%s: %s" % (type(exc).__name__, exc)))
                    continue
                if bag is None or not bag["is_public"]:
                    continue
                for (subj, pred, obj, is_lit, lang, dtype,
                     pos) in concept_to_triples(bag, options):
                    rows.append(("triple", subj, pred, obj, is_lit, lang,
                                 dtype, pos, record_id, None))
            yield pd.DataFrame(rows, columns=_EXTRACTED_COLS)

    return fn


def extract_triples(records: DataFrame, options: dict | None = None,
                    default_scheme: str | None = None,
                    partitions: int | None = None) -> DataFrame:
    """MARC_RECORDS → EXTRACTED (tagged union of triples + quarantine)."""
    options = dict(options or {})
    if partitions is None:
        partitions = records.sparkSession.conf.get(
            "spark.sql.shuffle.partitions")
    # Size-balance the Arrow batches: hash-repartition decouples UDF
    # parallelism from upstream (possibly skewed) partitioning.
    balanced = records.repartition(int(partitions), F.xxhash64("record_id"))
    return balanced.mapInPandas(_extract_batches(options, default_scheme),
                                schema=schemas.EXTRACTED)


def triples_from_extracted(extracted: DataFrame) -> DataFrame:
    """EXTRACTED → TRIPLES with Graph-set dedup (G1).

    lineage column record_id is retained; the dedup key is the triple
    value itself (subj,pred,obj,lang,datatype,pos) matching rdflib set
    semantics (SURVEY.md §1c).
    """
    return (extracted.filter(F.col("row_kind") == "triple")
            .drop("row_kind", "reason")
            .dropDuplicates(["subj", "pred", "obj", "obj_lang",
                             "obj_datatype", "component_pos"]))


def quarantine_from_extracted(extracted: DataFrame) -> DataFrame:
    """EXTRACTED → QUARANTINE (P7) with duplicate-warning dedup (P8)."""
    return (extracted.filter(F.col("row_kind") == "quarantine")
            .select("record_id", "reason")
            .dropDuplicates(["record_id", "reason"]))
