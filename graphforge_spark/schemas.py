"""Canonical schemas for the engine.

The data model mirrors the reference's quad store (N3.Store,
docs/scripts/graphProcessor.js:1) as a columnar triples table; the input is
the transcript shape mandated by BASELINE.json ``input_hint``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input: Iceberg/parquet table of multi-turn conversation / agent transcripts.
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# One RDF triple/quad. ``obj_is_literal`` is the reference's single type
# discriminator (objectValue.startsWith('http'), graphProcessor.js:222).
TRIPLE_SCHEMA = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("obj_is_literal", BooleanType(), False),
        StructField("graph", StringType(), True),
    ]
)

# Extraction output before provenance is attached (array element type of the
# vectorized extraction UDF).
TRIPLE_STRUCT = StructType(
    [
        StructField("subj", StringType(), True),
        StructField("pred", StringType(), True),
        StructField("obj", StringType(), True),
        StructField("obj_is_literal", BooleanType(), True),
    ]
)
TRIPLE_ARRAY = ArrayType(TRIPLE_STRUCT)

# Triples with provenance (which turn produced them) — kept through the
# pipeline so lineage/metrics and resume are per-partition exact.
PROVENANCED_TRIPLE_SCHEMA = StructType(
    list(TRIPLE_SCHEMA.fields)
    + [
        StructField("src_conv_id", StringType(), True),
        StructField("src_turn_idx", IntegerType(), True),
    ]
)

# Checkpoint/lineage/metrics rows (reference analog: the mtime freshness gate,
# graphProcessor.js:36-50 — ours is per-partition and idempotent).
CHECKPOINT_SCHEMA = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("part_id", IntegerType(), False),
        StructField("rows_in", LongType(), True),
        StructField("triples_out", LongType(), True),
        StructField("wall_ms", LongType(), True),
        StructField("run_id", StringType(), False),
        StructField("completed_at", TimestampType(), True),
    ]
)

# Entity-link candidate edges (mention surface → candidate entity, scored).
LINK_EDGE_SCHEMA = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("score", StringType(), True),
    ]
)
