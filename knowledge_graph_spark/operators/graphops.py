"""Graph finishing operators: degree, edge rank, stable ids, LCC.

Reference analogues:
- degree: ``graph.degree`` stamped on nodes (reference
  verbs/community_detection/cluster_graph.py:56-57) — here an explode +
  two-phase count over the edge list.
- edge combined degree "rank" = source_degree + target_degree (reference
  verbs/community_summarization/prepare_report/compute_edge_degree.py:11-54)
  — two broadcast joins of the (small) degree table onto edges.
- human_readable_id: enumerate in stable name order (reference
  cluster_graph.py:60-68 uses enumerate + a seeded uuid; we use
  row_number over an explicit orderBy + content-hash ids — deterministic
  and resume-safe, see SURVEY.md G8).
- largest connected component (reference utils/graph.py:15-20,
  graspologic largest_connected_component) — via connected_components in
  operators/community.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def node_degrees(edges: DataFrame) -> DataFrame:
    """(title, degree) from the canonical edge list.  Self-loops count once
    per endpoint appearance (nx.Graph counts a self-loop as degree 2; the
    reference pipeline never produces self-loops because co-occurrence
    pairs are i<j, so both conventions coincide here)."""
    return (
        edges.select(F.explode(F.array("source", "target")).alias("title"))
        .groupBy("title")
        .agg(F.count("*").cast("int").alias("degree"))
    )


def with_edge_rank(edges: DataFrame, degrees: DataFrame) -> DataFrame:
    """Attach source_degree / target_degree / rank (their sum) to edges.

    The degree table is tiny relative to edges (|V| << |E| at scale), so
    both joins are explicitly broadcast — no shuffle of the edge list.
    """
    deg = F.broadcast(degrees)
    src = deg.select(F.col("title").alias("source"), F.col("degree").alias("source_degree"))
    tgt = deg.select(F.col("title").alias("target"), F.col("degree").alias("target_degree"))
    return (
        edges.join(src, "source", "left")
        .join(tgt, "target", "left")
        .withColumn("source_degree", F.coalesce("source_degree", F.lit(0)))
        .withColumn("target_degree", F.coalesce("target_degree", F.lit(0)))
        .withColumn("rank", (F.col("source_degree") + F.col("target_degree")).cast("int"))
    )


def with_global_index(
    df: DataFrame, order_cols: list, out_col: str = "human_readable_id"
) -> DataFrame:
    """0-based dense global index in (order_cols) order WITHOUT a
    single-partition window — the two-phase pattern:

    1. range-partition on the order key, local ``row_number`` per
       partition (parallel);
    2. per-partition counts → cumulative offsets (a window over
       #partitions rows — trivially small) broadcast back.

    global_index = offset(partition) + local_rank − 1.  The result is
    identical to ``row_number() over (order by …)`` for any unique order
    key, independent of where the range boundaries fall, so the output is
    hash-stable across runs and cluster sizes — but no stage funnels the
    whole table through one task (asserted in test_physical_plans.py).

    The ranked frame is persisted: the offsets subtree re-reads it, and
    WITHOUT pinning, each subtree would re-evaluate repartitionByRange
    with an independently-sampled partitioner — partition ids then
    disagree between rank and offset computation and the inner join
    silently DROPS rows (observed at sf0.1: 19 nodes → 3).  The persist
    is bounded by the table being indexed (nodes/claims/reports —
    ~|entities|, not |turns|).
    """
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    local = ranged.withColumn(
        "__local", F.row_number().over(w_local).cast("long")
    ).persist()
    counts = local.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long")
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__local") - 1)
        .drop("__pid", "__local", "__off")
    )


def with_node_ids(nodes: DataFrame) -> DataFrame:
    """Deterministic id = sha2(title); human_readable_id = rank in stable
    name order (reference G8 enumerate-after-stable-sort semantics) via
    the two-phase global index — no single-partition Exchange even when
    |V| reaches the hundreds of millions."""
    return with_global_index(
        nodes.withColumn("id", F.sha2(F.col("title"), 256)), ["title"]
    )


def with_edge_ids(edges: DataFrame) -> DataFrame:
    return with_global_index(
        edges.withColumn("id", F.sha2(F.concat_ws("->", "source", "target"), 256)),
        ["source", "target"],
    )


def stabilize_nodes(nodes: DataFrame) -> DataFrame:
    """Stable output ordering (reference utils/graph.py:33-44 sorts nodes by
    name for deterministic serialization)."""
    return nodes.orderBy("title")


def stabilize_edges(edges: DataFrame) -> DataFrame:
    """Canonical (min,max) endpoints then sort (reference utils/graph.py:45-56)."""
    return edges.orderBy("source", "target")
