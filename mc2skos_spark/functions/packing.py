"""Sequence packing for pre-training pipelines.

The step between a cleaned document corpus and a trainer: concatenate
documents in a stable order and cut the token stream into fixed-
capacity training sequences.  Each document's placement is decided by
the EXCLUSIVE prefix sum of token counts in id order — `seq_id =
start_offset div capacity` is the sequence in which the document's
first token lands.

A bare ``sum() OVER (ORDER BY id)`` collapses the corpus into ONE
window partition (single task at scale), so the prefix sum uses the
same scalable shape as ``operators/rank.py:global_rank``:
range-partition on the id, per-partition running sums, plus
per-partition token-total base offsets from one metadata-scale
aggregate (#partitions rows to the driver, never the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(docs: DataFrame, capacity: int,
                   id_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   num_partitions: int | None = None) -> DataFrame:
    """Append ``start_offset`` (exclusive prefix sum of ``tokens_col``
    in ``id_col`` order — must be a unique key) and ``seq_id``
    (``start_offset div capacity``, integer arithmetic end-to-end: a
    double division would lose exactness past 2^53 total tokens).
    """
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions"))
    parted = (docs.repartitionByRange(num_partitions, id_col)
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint())
    totals = {r["__pid"]: r["tot"]
              for r in (parted.groupBy("__pid")
                        .agg(F.sum(tokens_col).cast("long").alias("tot"))
                        .collect())}
    if not totals:
        # empty input: an empty literal map types as map<void,void> and
        # fails analysis on the lookup — emit the (empty) typed result
        return (parted.drop("__pid")
                .withColumn("start_offset", F.lit(0).cast("long"))
                .withColumn("seq_id", F.lit(0).cast("long")))
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off_map = F.create_map(*[F.lit(x) for pid in sorted(offsets)
                             for x in (pid, offsets[pid])])
    w = (Window.partitionBy("__pid").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    start = (off_map[F.col("__pid")].cast("long")
             + F.coalesce(F.sum(tokens_col).over(w).cast("long"),
                          F.lit(0).cast("long")))
    return (parted
            .withColumn("start_offset", start)
            .withColumn("seq_id",
                        F.expr("start_offset div %d" % int(capacity)))
            .drop("__pid"))
