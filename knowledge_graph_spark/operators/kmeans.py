"""Integer-exact Lloyd k-means over embedding columns.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) clusters the corpus
embedding space with k-means before within-cluster pruning; the
reference repo has no vector clustering at all (its vector side is
LanceDB search — /root/reference/query/inputs/retrieval/entities.py),
so this is a pipeline-completing addition for training-data curation,
not a port.

Determinism strategy (same family as ``graphops.pagerank_int`` and the
unrolled-LPA oracles): embeddings are quantized to an integer grid
(``floor(x * 10**6)`` per dimension — exact for |x| ≤ ~37 at 64 dims,
the synthetic corpus spans ±0.53), all distances are exact int64 sums
whose order of accumulation cannot matter, centroid updates floor the
per-dimension mean (``floor(sum/count)`` via one IEEE double division of
two exact int64s — a single correctly-rounded op, identical on every
engine), and argmin ties break on the lower centroid id.  Every Lloyd
round is then a pure function of the input, so a fixed-round unrolled
SQL oracle reproduces the assignment bit-for-bit — no seed, no float
accumulation drift, no "close enough" tolerance.

Scale shape (100 TB): the points table is never collected; per round the
assignment is a broadcast join against the k-row centroid table (k·d
ints — broadcastable for any practical k) followed by a map-side-partial
argmin groupBy on vec_id, and the centroid update is one posexplode →
groupBy (cid, pos) whose shuffle collapses to k·d rows per input
partition map-side.  ``localCheckpoint`` truncates the lineage each
round so round r's plan does not replay rounds 1..r-1 (the pagerank_int
lesson).  Empty clusters keep their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q_SCALE = 10**6


def quantize(corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, q: array<bigint>) — the integer grid points."""
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * F.lit(float(Q_SCALE))).cast("bigint"),
        ).alias("q"),
    )


def _d2(q, c):
    """Exact integer squared L2 distance between two int arrays."""
    return F.aggregate(
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def init_centroids(pts: DataFrame, k: int) -> DataFrame:
    """Deterministic init: the k lowest-id points, cid = 0..k-1 in id
    order.  (k rows — the single-partition window is bounded by k.)"""
    from pyspark.sql import Window

    head = pts.orderBy("vec_id").limit(k)
    w = Window.orderBy("vec_id")
    return head.select(
        (F.row_number().over(w) - 1).cast("int").alias("cid"),
        F.col("q").alias("c"),
    )


def assign(pts: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, q, cid, d2): each point's nearest centroid, ties to the
    lower cid.  Broadcast join + map-side-partial argmin — the only
    shuffle carries one row per point."""
    scored = pts.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "q", "cid", _d2(F.col("q"), F.col("c")).alias("d2")
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cid")).alias("best"),
        # q is identical on every row of the group (it rides the join)
        F.first("q").alias("q"),
    )
    return best.select(
        "vec_id", "q", F.col("best.cid").alias("cid"), F.col("best.d2").alias("d2")
    )


def update_centroids(assigned: DataFrame, prev: DataFrame) -> DataFrame:
    """Per-dimension floored mean of each cluster's members; empty
    clusters keep the previous centroid.  floor(sum/count) is one double
    division of exact int64s — deterministic and engine-identical."""
    means = (
        assigned.select("cid", F.posexplode("q").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(
            F.floor(
                F.sum("val").cast("double") / F.count("*").cast("double")
            )
            .cast("bigint")
            .alias("m")
        )
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("c_new")
        )
    )
    return prev.join(means, "cid", "left").select(
        "cid", F.coalesce("c_new", "c").alias("c")
    )


def kmeans_assignments(
    corpus: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-round Lloyd k-means → (vec_id, cluster, d2) with d2 the
    exact integer squared distance to the final centroid.

    ``iterations`` update rounds, then one final assignment against the
    round-``iterations`` centroids (so the output is consistent with the
    returned model state).  The gate's SQL oracle unrolls the identical
    rounds as chained MATERIALIZED CTEs.
    """
    pts = quantize(corpus, id_col, vec_col).persist()
    centroids = init_centroids(pts, k).localCheckpoint(eager=True)
    for _ in range(iterations):
        assigned = assign(pts, centroids)
        centroids = update_centroids(assigned, centroids).localCheckpoint(eager=True)
    out = assign(pts, centroids).select(
        "vec_id", F.col("cid").alias("cluster"), "d2"
    )
    pts.unpersist()
    return out
