"""S3 — RDF include source: preload extra RDF files into the graph.

The reference's ``--include`` flag parses Turtle/JSON-LD files into the
output graph before conversion (/root/reference/mc2skos/mc2skos.py:
283-288), typically to define concept schemes.  Spark-first this is a
``unionByName`` of a small triples DataFrame read on the driver with the
same embedded Turtle reader the golden oracle uses (rdflib is not
available offline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..core.turtle import parse_turtle_file
from ..plans import schemas


def read_turtle_triples(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Parse Turtle files into a TRIPLES DataFrame (record_id = path)."""
    rows = []
    for path in paths:
        for (subj, pred, obj, is_lit, lang, dtype,
             pos) in parse_turtle_file(path):
            rows.append((subj, pred, obj, is_lit, lang, dtype, pos, path))
    return spark.createDataFrame(rows, schema=schemas.TRIPLES)


def include_triples(triples: DataFrame, spark: SparkSession,
                    include_paths: list[str]) -> DataFrame:
    """Union preloaded RDF into the pipeline output, with set-dedup."""
    if not include_paths:
        return triples
    extra = read_turtle_triples(spark, include_paths)
    return (triples.unionByName(extra)
            .dropDuplicates(["subj", "pred", "obj", "obj_lang",
                             "obj_datatype", "component_pos"]))
