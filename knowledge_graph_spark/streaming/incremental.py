"""Structured-Streaming incremental KG construction.

The reference is batch-only with file checkpoints (SURVEY.md §2.9); its
incremental story is the extract-stage graph union G5 (reference
utils/graph.py:68-115).  Here the same union runs inside a Structured
Streaming ``foreachBatch`` sink, so new transcript partitions landing in
the input location are folded into the materialized node/edge tables
continuously:

    readStream(transcripts) → foreachBatch:
        build_graph(micro-batch) → incremental_union_{nodes,edges}(old, new)
        → TableIO overwrite

Exactly-once: the streaming checkpoint (offset log) deduplicates input
files across restarts, and the union write is an idempotent overwrite —
re-processing an already-folded batch changes nothing because G5's
framed-description merge is applied to the same (old, new) pair only
once per committed batch.

Assumption (documented contract): conversations arrive atomically — all
turns of a conv_id land in one micro-batch (one file/partition per
conversation chunk).  Cross-batch conversation stitching would need a
session-window + watermark aggregation (``turn_counts`` shows the
watermark pattern) and is out of scope for the reference's semantics.

Scale: each micro-batch is an independent bounded pipeline (same code as
batch); state lives in the tables, not in streaming state store — so
state size is O(graph), not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import TableIO
from ..operators.merge import incremental_union_edges, incremental_union_nodes
from ..pipeline import PipelineConfig, build_graph

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def fold_batch(io: TableIO, batch_df: DataFrame, cfg: PipelineConfig) -> None:
    """One micro-batch → graph union into the materialized tables."""
    stages = build_graph(batch_df, cfg)
    new_nodes = stages["nodes"].persist()
    new_edges = stages["edges"].persist()
    if io.exists("nodes"):
        merged_nodes = incremental_union_nodes(io.read("nodes"), new_nodes)
        merged_edges = incremental_union_edges(io.read("edges"), new_edges)
    else:
        merged_nodes, merged_edges = new_nodes, new_edges
    # read-then-overwrite: localCheckpoint cuts the plan's dependency on
    # the files being overwritten (Spark cannot overwrite its own input)
    io.write(merged_nodes.localCheckpoint(eager=True), "nodes")
    io.write(merged_edges.localCheckpoint(eager=True), "edges")
    new_nodes.unpersist()
    new_edges.unpersist()


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    io: TableIO,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) the incremental fold."""
    cfg = cfg or PipelineConfig(chunk_size=128, chunk_overlap=16, tokenizer="ws")
    stream = stream_transcripts(spark, input_dir)
    writer = (
        stream.writeStream.foreachBatch(lambda df, _epoch: fold_batch(io, df, cfg))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        if available_now
        else stream.writeStream.foreachBatch(lambda df, _epoch: fold_batch(io, df, cfg)).option(
            "checkpointLocation", checkpoint_dir
        )
    )
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q


def turn_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked per-conversation turn counts by event-time window —
    the late-data-tolerant streaming aggregate pattern (role mix per
    window; append-mode compatible)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("n_tool_turns"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "conv_id",
            "n_turns",
            "n_tool_turns",
        )
    )
