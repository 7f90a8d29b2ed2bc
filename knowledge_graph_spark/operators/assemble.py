"""Stage 1 — stable-ordered per-conversation text assembly.

Reference analogue: document loading + the conversation-history fold
(reference verbs/documents/load_documents/run.py:24-60 and
query/system_prompt_builder/history/conversation_history.py:16-66).  A
conversation IS the document; its text is the role-prefixed concatenation of
turns in (turn_idx) order — the per-row invariant the driver verifies
("per-turn text equality under stable turn ordering").

Determinism note: ``collect_list`` observes shuffle order, which Spark does
not guarantee — so we collect ``struct(turn_idx, line)`` and ``array_sort``
before joining.  ``turn_idx`` is unique within a conversation (FIXTURES.md
F1), making the result bit-stable regardless of physical row order (the F5
ordering-invariance fixture).

Scale: one shuffle, keyed on conv_id (the table's natural bucket key — with
an Iceberg table bucketed by conv_id this aggregation is shuffle-free via
storage-partitioned join/agg).  Output rows are ~conversation-sized; callers
repartition by hash(conv_id) before the (wider) extraction stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURN_SEP = "\n"


def turn_line(role_col, text_col):
    """One rendered turn: ``role: text`` (reference conversation_history
    renders turns as ``{role}: {content}``)."""
    return F.concat(role_col, F.lit(": "), text_col)


def assemble_conversations(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, ...) → CONV_DOCS
    (doc_id, conv_id, text, n_turns), one row per conversation."""
    lines = transcripts.select(
        "conv_id",
        F.struct(F.col("turn_idx"), turn_line(F.col("role"), F.col("text")).alias("line")).alias(
            "t"
        ),
    )
    return (
        lines.groupBy("conv_id")
        .agg(
            F.concat_ws(
                TURN_SEP, F.transform(F.array_sort(F.collect_list("t")), lambda s: s["line"])
            ).alias("text"),
            F.count("*").cast("int").alias("n_turns"),
        )
        .select(
            F.sha2(F.col("conv_id"), 256).alias("doc_id"),
            "conv_id",
            "text",
            "n_turns",
        )
    )
