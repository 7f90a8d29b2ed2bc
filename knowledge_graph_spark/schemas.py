"""Explicit StructType registry for every table in the pipeline.

The reference's knowledge model is pydantic-with-Optional-everything
(reference models/ — document.py, text_unit.py, entity.py, relationship.py,
covariate.py, community.py, community_report.py); here every table has an
explicit, partition-aware schema.  Output schemas mirror the reference's CSV
export contract (reference verbs/community_summarization/export.py:23-60).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input (BASELINE.json input_hint): Iceberg table of multi-turn transcripts.
# Partitioned by bucket(conv_id) at scale; ordering key is (conv_id, turn_idx).
# ---------------------------------------------------------------------------
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Broadcast entity-link dictionary (FIXTURES.md F2).
ALIAS_DICT = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("canonical_name", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# Per-conversation assembled document (reference: document → text unit input).
CONV_DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # sha2(conv_id)
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("n_turns", T.IntegerType(), False),
    ]
)

# Text units (reference models/text_unit.py; text_unit.csv contract).
TEXT_UNITS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),  # sha2(doc_id, chunk_idx)
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("chunk", T.StringType(), False),
        T.StructField("n_tokens", T.IntegerType(), False),
    ]
)

# Raw extraction records in the reference's delimiter format, one string per
# text unit (reference graph/extractors/graph_extractor.py:17-19 delimiters).
RAW_RECORDS = T.StructType(
    [
        T.StructField("text_unit_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("records", T.StringType(), False),
    ]
)

# Canonical nodes (reference node.csv / entity.csv contract, FIXTURES.md F3).
NODES = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("type", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("source_id", T.ArrayType(T.StringType()), True),
        T.StructField("degree", T.IntegerType(), True),
        T.StructField("human_readable_id", T.LongType(), True),
        T.StructField("community", T.StringType(), True),
        T.StructField("level", T.IntegerType(), True),
    ]
)

# Weighted deduplicated edges (reference relationship.csv contract).
EDGES = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("target", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("text_unit_ids", T.ArrayType(T.StringType()), True),
        T.StructField("human_readable_id", T.LongType(), True),
        T.StructField("source_degree", T.IntegerType(), True),
        T.StructField("target_degree", T.IntegerType(), True),
        T.StructField("rank", T.IntegerType(), True),
    ]
)

# Claims / covariates (reference verbs/covariates/typing.py:7-23).
CLAIMS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("covariate_type", T.StringType(), False),
        T.StructField("subject_id", T.StringType(), False),
        T.StructField("subject_type", T.StringType(), True),
        T.StructField("object_id", T.StringType(), True),
        T.StructField("object_type", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("start_date", T.StringType(), True),
        T.StructField("end_date", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("source_text", T.ArrayType(T.StringType()), True),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("human_readable_id", T.LongType(), True),
    ]
)

# Community membership (reference verbs/community_detection/typing.py:3).
COMMUNITIES = T.StructType(
    [
        T.StructField("level", T.IntegerType(), False),
        T.StructField("community", T.StringType(), False),
        T.StructField("title", T.StringType(), False),  # member node title
    ]
)

# Community reports (reference community_report.csv contract).
COMMUNITY_REPORTS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("community", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("summary", T.StringType(), True),
        T.StructField("full_content", T.StringType(), True),
        T.StructField("rank", T.DoubleType(), True),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("rank_explanation", T.StringType(), True),
        T.StructField(
            "findings",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("summary", T.StringType(), True),
                        T.StructField("explanation", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)
