"""Declared StructTypes per pipeline stage.

The reference's per-command Media structs are compile-time fixed
(/root/reference/src/commands/dupes.rs:51-57 etc.); we mirror that with
explicit schemas — never rely on inference for pipeline-internal tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The canonical input table (BASELINE.json input_hint).
DOCUMENTS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Golden truth companion (FIXTURES.md §2).
EXPECTED_CLUSTERS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("cluster_id", T.LongType(), True),
        T.StructField("family", T.StringType(), False),
        T.StructField("text_sha256", T.StringType(), False),
    ]
)

# Edges between document ids with a similarity weight and provenance.
EDGES = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("sim", T.DoubleType(), False),
        T.StructField("pass_name", T.StringType(), False),
    ]
)

# Final cluster assignment.
CLUSTERS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
        T.StructField("avg_sim", T.DoubleType(), True),
        T.StructField("cluster_size", T.IntegerType(), False),
    ]
)

# Per-stage metrics row (checkpoint.py).
METRICS = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("partitions", T.IntegerType(), False),
        T.StructField("wall_sec", T.DoubleType(), False),
        T.StructField("extra", T.StringType(), True),
    ]
)
