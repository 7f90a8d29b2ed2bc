"""Structured-Streaming maintenance of the tool-transition table.

``agent_trace.tool_transitions`` over an ever-growing transcript stream
would rescan the accumulated corpus per batch (O(stream²)); this fold
keeps the transition counts continuously current in O(batch) work.  The
wrinkle the sketch folds (sketch_stream.py) don't have: a transition can
SPAN a micro-batch boundary — the first tool call a conversation makes
in batch k+1 continues the last call it made in batch k, not ^START.
The fold therefore carries a tiny side table ``trace_last__v{k}``
(conv_id → tool of the highest turn_idx call seen so far): batch-local
transitions come from the usual lag window, each conversation's first
in-batch call takes its predecessor from the committed side table
(falling back to ^START for genuinely new conversations), and counts
merge by SUM.  With that stitch the folded table is IDENTICAL to the
batch operator over everything ingested (asserted in
tests/test_trace_stream.py) — for ``n_transitions``; the batch
operator's ``n_convs`` support column is a COUNT DISTINCT, which is not
SUM-mergeable, so the streamed table intentionally omits it (maintain an
HLL per transition if an approximate support is ever needed).

Exactness assumption (same contract as incremental.py's assembly fold,
and the natural log-ingestion shape): a conversation's turns arrive in
turn_idx order ACROSS batches — within a batch any order is fine (the
window sorts).  Out-of-order cross-batch arrival would need the full
per-conversation call log in state; this fold keeps state at one row
per OPEN conversation instead, which is what survives 10^12 turns.

Commit protocol mirrors sketch_stream.py: write ``trace_trans__v{k+1}``
+ ``trace_last__v{k+1}`` fresh (never overwriting the version read),
publish both with ONE marker write (lineage, epoch, version); crash
before the marker → replay redoes the fold from v{k}; replay of a
committed epoch is a no-op.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import TableIO
from ..operators.agent_trace import START_MARKER

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

TRACE_MARKER = "_stream/trace_commit.json"


def _state(io: TableIO) -> dict | None:
    text = io.read_text(TRACE_MARKER)
    return json.loads(text) if text is not None else None


def read_current_trace(io: TableIO, name: str = "trace_trans") -> DataFrame:
    """Committed version of 'trace_trans' (prev_tool, tool, n_transitions)
    or 'trace_last' (conv_id, last_tool)."""
    state = _state(io)
    if state is None:
        raise FileNotFoundError(f"no committed trace stream state under {io.base}")
    return io.read(f"{name}__v{state['version']}")


def fold_trace_batch(
    io: TableIO, batch_df: DataFrame, epoch_id: int, lineage: str = ""
) -> None:
    """One transcript micro-batch → stitch cross-batch predecessors from
    the committed per-conversation state, SUM-merge transition counts,
    publish both tables as a unit."""
    state = _state(io)
    if (
        state is not None
        and state.get("lineage") == lineage
        and int(epoch_id) <= int(state.get("epoch", -1))
    ):
        return  # replay of a fully-committed batch
    k = int(state["version"]) if state is not None else -1

    calls = batch_df.filter(
        (F.col("role") == "tool") & (F.col("tool") != "")
    ).select("conv_id", "turn_idx", "tool")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = calls.withColumn("__prev_in_batch", F.lag("tool").over(w))

    if k >= 0:
        last = io.read(f"trace_last__v{k}")
    else:
        last = calls.sparkSession.createDataFrame(
            [], "conv_id string, last_tool string"
        )

    seq = seq.join(last, "conv_id", "left").withColumn(
        "prev_tool",
        F.coalesce("__prev_in_batch", "last_tool", F.lit(START_MARKER)),
    )
    trans_b = seq.groupBy("prev_tool", "tool").agg(
        F.count("*").cast("bigint").alias("n_transitions")
    )
    if k >= 0:
        trans_b = (
            io.read(f"trace_trans__v{k}")
            .unionByName(trans_b)
            .groupBy("prev_tool", "tool")
            .agg(F.sum("n_transitions").cast("bigint").alias("n_transitions"))
        )

    # new per-conversation tail: the batch's highest-turn_idx call wins;
    # conversations silent this batch keep their committed tail
    batch_last = calls.groupBy("conv_id").agg(
        F.max_by("tool", "turn_idx").alias("last_tool")
    )
    merged_last = (
        last.join(batch_last.select("conv_id"), "conv_id", "left_anti")
        .unionByName(batch_last)
    )

    io.write(trans_b, f"trace_trans__v{k + 1}")
    io.write(merged_last, f"trace_last__v{k + 1}")
    io.write_text(
        TRACE_MARKER,
        json.dumps({"lineage": lineage, "epoch": int(epoch_id), "version": k + 1}),
    )
    if k >= 1:  # GC a superseded version; correctness never depends on it
        for name in (f"trace_trans__v{k - 1}", f"trace_last__v{k - 1}"):
            try:
                io.delete(name)
            except Exception:
                pass


def run_trace_stream(
    spark: SparkSession,
    input_dir: str,
    io: TableIO,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 64,
):
    """Start (and with available_now=True, drain) the transition fold."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    fold = lambda df, epoch: fold_trace_batch(  # noqa: E731
        io, df, epoch, lineage=checkpoint_dir
    )
    writer = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
