"""Agent-transcript trace analytics: tool-call transitions and
turn-latency profiles.

The reference operates on plain conversation text and never inspects the
``tool`` / ``ts`` columns beyond ordering (conversation assembly,
/root/reference/query/inputs/loaders/dfs.py reads documents only).  For
agent transcripts (the BASELINE.json input shape carries ``role``,
``tool`` and ``ts`` per turn) these two views are the standard trace
mining primitives a transcript corpus pipeline needs:

- ``tool_transitions``: the first-order Markov transition table over each
  conversation's ordered tool-call sequence (which tool follows which —
  agent-behaviour drift detection, tool-routing audits).  A synthetic
  ``^START`` state marks each conversation's first call so entry
  probabilities are recoverable from the same table.
- ``turn_latency``: per-conversation response-delay profile for one role
  (assistant by default) — wall-clock gap between a turn and the turn
  before it, in exact integer microseconds (epoch-us subtraction, no
  float durations, so the DuckDB oracle matches bit-for-bit).

Scale shape: both are ONE window pass partitioned by conv_id (the same
hash-shuffle key as conversation assembly — on a real cluster the
transcripts table is already bucketed/partitioned by conv_id hash, so
these fold into map-side window evaluation with no extra exchange)
followed by a map-side-combinable groupBy.  No Python, no per-row UDFs;
memory per task is one conversation's run length, streamed by Spark's
window operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START_MARKER = "^START"


def tool_transitions(
    transcripts: DataFrame,
    start_marker: str = START_MARKER,
) -> DataFrame:
    """Tool-call transition counts → (prev_tool, tool, n_transitions,
    n_convs).

    Tool calls are the turns with role='tool' and a non-empty ``tool``
    column, ordered by turn_idx within each conversation; ``prev_tool``
    is the previous call in the SAME conversation (``start_marker`` for
    the first).  ``n_convs`` counts distinct conversations exhibiting
    the transition — the support statistic that separates one runaway
    conversation from a corpus-wide pattern.
    """
    calls = transcripts.filter(
        (F.col("role") == "tool") & (F.col("tool") != "")
    ).select("conv_id", "turn_idx", "tool")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = calls.withColumn(
        "prev_tool", F.coalesce(F.lag("tool").over(w), F.lit(start_marker))
    )
    return seq.groupBy("prev_tool", "tool").agg(
        F.count("*").cast("bigint").alias("n_transitions"),
        F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
    )


def turn_latency(transcripts: DataFrame, role: str = "assistant") -> DataFrame:
    """Per-conversation response-latency profile for ``role`` →
    (conv_id, n_responses, total_wait_us, max_wait_us).

    For every turn with the given role, the wait is the epoch-microsecond
    gap to the immediately preceding turn (any role) in the same
    conversation; a role turn at turn_idx 0 has no predecessor and is
    excluded.  Turn order is the stable (conv_id, turn_idx) order, under
    which the synthesized ts is non-decreasing, so waits are >= 0.  All
    arithmetic is int64 — exact cross-engine.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    waits = (
        t.withColumn("prev_us", F.lag("ts_us").over(w))
        .filter((F.col("role") == role) & F.col("prev_us").isNotNull())
        .select("conv_id", (F.col("ts_us") - F.col("prev_us")).alias("wait_us"))
    )
    return waits.groupBy("conv_id").agg(
        F.count("*").cast("bigint").alias("n_responses"),
        F.sum("wait_us").cast("bigint").alias("total_wait_us"),
        F.max("wait_us").cast("bigint").alias("max_wait_us"),
    )


def tool_latency(transcripts: DataFrame) -> DataFrame:
    """Per-tool execution-latency profile → (tool, n_calls, n_timed,
    total_gap_us, max_gap_us).

    For each tool-call turn, the gap to the NEXT turn in the same
    conversation approximates the tool's execution time (the transcript
    records the next turn only after the tool returned).  A conversation's
    final turn has no successor and counts in ``n_calls`` but not
    ``n_timed``.  Exact int64 epoch-us arithmetic, same contract as
    turn_latency.

    Scale shape: one conv_id-keyed window (lead) + one combinable groupBy
    on tool — the tool key set is tiny, and partial aggregation collapses
    it map-side before the final shuffle.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).withColumn("next_us", F.lead("ts_us").over(w))
    calls = t.filter((F.col("role") == "tool") & (F.col("tool") != "")).select(
        "tool", (F.col("next_us") - F.col("ts_us")).alias("gap_us")
    )
    return calls.groupBy("tool").agg(
        F.count("*").cast("bigint").alias("n_calls"),
        F.count("gap_us").cast("bigint").alias("n_timed"),
        F.coalesce(F.sum("gap_us"), F.lit(0)).cast("bigint").alias("total_gap_us"),
        F.coalesce(F.max("gap_us"), F.lit(0)).cast("bigint").alias("max_gap_us"),
    )


def conversation_shapes(transcripts: DataFrame) -> DataFrame:
    """Per-conversation structural profile → (conv_id, n_turns, n_user,
    n_assistant, n_tool_calls, last_role, duration_us).

    The corpus-curation view of dialogue structure: role balance filters
    (assistant-only monologues, user walls), tool-usage stratification,
    and truncation detection (a conversation whose last_role is 'user'
    or 'tool' was cut off mid-exchange — a quality signal for training
    selection).  One combinable groupBy on conv_id; last_role via max_by
    on turn_idx (deterministic — turn_idx is unique per conversation).
    """
    return transcripts.groupBy("conv_id").agg(
        F.count("*").cast("bigint").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("bigint")).cast("bigint").alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("bigint"))
        .cast("bigint")
        .alias("n_assistant"),
        F.sum(((F.col("role") == "tool") & (F.col("tool") != "")).cast("bigint"))
        .cast("bigint")
        .alias("n_tool_calls"),
        F.max_by("role", "turn_idx").alias("last_role"),
        (
            F.max(F.unix_micros(F.col("ts").cast("timestamp")))
            - F.min(F.unix_micros(F.col("ts").cast("timestamp")))
        )
        .cast("bigint")
        .alias("duration_us"),
    )


def tool_ngrams(
    transcripts: DataFrame, n: int = 3, k_top: int = 32
) -> DataFrame:
    """Top-``k_top`` tool-call n-grams (default trigrams) across the
    corpus → (g1..gn, n_occurrences) — the sequence-mining upgrade of
    ``tool_transitions`` (which is this with n=2, un-topped): recurring
    multi-step tool routines (search→fetch→search loops, retry storms)
    show up as heavy n-grams.

    Windows never cross conversations (lag partitioned by conv_id); the
    first n−1 calls of a conversation carry no complete n-gram and are
    naturally excluded by the non-null filter.  The global top-k is
    orderBy().limit() — TakeOrderedAndProject — under the tie-free
    (count DESC, g1..gn ASC) total order.
    """
    calls = transcripts.filter(
        (F.col("role") == "tool") & (F.col("tool") != "")
    ).select("conv_id", "turn_idx", "tool")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cols = {}
    for i in range(n):
        lag_i = n - 1 - i  # g1 is the oldest call in the window
        cols[f"g{i + 1}"] = (
            F.lag("tool", lag_i).over(w) if lag_i > 0 else F.col("tool")
        )
    seq = calls.select(*[c.alias(name) for name, c in cols.items()])
    complete = seq.dropna(how="any", subset=list(cols))
    names = list(cols)
    return (
        complete.groupBy(*names)
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), *[F.asc(c) for c in names])
        .limit(k_top)
    )
