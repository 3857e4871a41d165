"""Declared StructTypes for every table the pipeline touches.

Fixed schemas (SURVEY.md §1) keep column pruning effective through the
Arrow UDF stages: ``mapInPandas`` declares exactly these shapes so
Catalyst can prune the parquet scans beneath them.
"""

from pyspark.sql import types as T

# BASELINE.json input_hint: the primary pipeline input.
TRANSCRIPTS = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

# Stage-0 output: one row per recovered MARCXML record.
MARC_RECORDS = T.StructType([
    T.StructField("record_id", T.StringType()),
    T.StructField("conv_id", T.StringType()),
    T.StructField("record_xml", T.StringType()),
])

# Stage-1 combined output (single parse pass, split downstream by
# row_kind: 'triple' | 'quarantine').
EXTRACTED = T.StructType([
    T.StructField("row_kind", T.StringType()),
    T.StructField("subj", T.StringType()),
    T.StructField("pred", T.StringType()),
    T.StructField("obj", T.StringType()),
    T.StructField("obj_is_literal", T.BooleanType()),
    T.StructField("obj_lang", T.StringType()),
    T.StructField("obj_datatype", T.StringType()),
    T.StructField("component_pos", T.IntegerType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("reason", T.StringType()),
])

TRIPLES = T.StructType([
    T.StructField("subj", T.StringType()),
    T.StructField("pred", T.StringType()),
    T.StructField("obj", T.StringType()),
    T.StructField("obj_is_literal", T.BooleanType()),
    T.StructField("obj_lang", T.StringType()),
    T.StructField("obj_datatype", T.StringType()),
    T.StructField("component_pos", T.IntegerType()),
    T.StructField("record_id", T.StringType()),
])

QUARANTINE = T.StructType([
    T.StructField("record_id", T.StringType()),
    T.StructField("reason", T.StringType()),
])

# Per-partition lineage rows written with every stage commit
# (north_rule: partition id, input span, counts, skew stats).
LINEAGE = T.StructType([
    T.StructField("stage", T.StringType()),
    T.StructField("part_id", T.IntegerType()),
    T.StructField("input_min", T.StringType()),
    T.StructField("input_max", T.StringType()),
    T.StructField("row_count", T.LongType()),
    T.StructField("bytes_approx", T.LongType()),
])
