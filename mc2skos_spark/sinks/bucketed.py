"""Bucketed triple store: shuffle-free co-located joins at read time.

At 100 TB the dominant downstream access pattern on the triples table is
subject-keyed (entity assembly, graph traversal, join with entity dims).
Writing the table bucketed by ``subj`` means every later self-join or
subject-keyed join is co-partitioned — Catalyst elides the Exchange
entirely (verified in the test by asserting no shuffle in the joined
plan).  Uses the session catalog's ``bucketBy`` + ``saveAsTable`` (no
Hive dependency; drop-in `writeTo(...).partitionedBy(bucket(...))` on a
real Iceberg catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_triples(triples: DataFrame, table_name: str,
                           num_buckets: int = 16,
                           path: str | None = None) -> None:
    writer = (triples.write.mode("overwrite")
              .bucketBy(num_buckets, "subj")
              .sortBy("subj")
              .format("parquet"))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def subject_join(spark: SparkSession, table_name: str,
                 preds_left: list[str], preds_right: list[str]) -> DataFrame:
    """Subject-keyed self-join over the bucketed table — co-located, so
    the physical plan contains no Exchange on either side."""
    from pyspark.sql import functions as F
    t = spark.table(table_name)
    left = t.filter(t.pred.isin(preds_left)).alias("l")
    right = t.filter(t.pred.isin(preds_right)).alias("r")
    return left.join(right, "subj").select(
        "subj",
        F.col("l.pred").alias("pred_l"), F.col("l.obj").alias("obj_l"),
        F.col("r.pred").alias("pred_r"), F.col("r.obj").alias("obj_r"))
