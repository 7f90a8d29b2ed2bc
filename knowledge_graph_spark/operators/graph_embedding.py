"""K5 — graph embeddings (node2vec replacement, reference
graph/embedding/embedding.py:15-37 runs gensim node2vec over the
NetworkX graph).

Neither gensim nor a trained skip-gram fits the north rule's
deterministic, Spark-native constraints, so the substitute keeps
node2vec's STRUCTURE and replaces the two stochastic parts with the
SQL-expressible hash family (functions/hashing.py):

1. **Walks**: ``num_walks`` walks of length ``walk_length`` from every
   node; the step from node u picks neighbor index
   ``perm_hash(walk_seed, step) mod degree(u)`` over u's sorted
   neighbor list — hash-driven instead of RNG-driven, same walk
   distribution shape, fully reproducible.  Each step is one equi-join
   against the indexed adjacency (walk_length−1 joins, no UDF).
2. **Embedding**: instead of SGD skip-gram, windowed co-occurrence
   counts from the walks are FEATURE-HASHED into ``dim`` buckets
   (v[poly_hash(ctx) % dim] += count) and L2-normalized — the standard
   count-based stand-in (DeepWalk co-occurrence + hashing trick); nodes
   sharing walk neighborhoods land close in cosine space, which is the
   property downstream ANN (operators/similarity.py) consumes.

Output: long form (title, dim_idx, value_micro) — integer-stable for
cross-engine value-hash checks — plus ``as_vectors`` to assemble
array<float> rows for the ANN operators / vector sink.

Scale: adjacency and walks are (node, step)-keyed joins; co-occurrence
is one self-join of walk positions bounded by |walks|·L·window; the
embedding is a groupBy over at most |V|·dim cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import FP_BASE, FP_MOD, perm_col

DEFAULT_DIM = 32

# Adjacency row bound under which the walk-step join broadcasts the
# (persisted) adjacency instead of shuffling it: each of the L−1 step
# joins then becomes a narrow map stage.  Physical-plan choice only —
# above the bound the shuffle path runs with identical semantics.
BROADCAST_ADJ_LIMIT = 2_000_000


def _poly_col(c) -> F.Column:
    """Native-Column mirror of hashing.poly_hash (sequential char fold)."""
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD,
    )


# the shared column-salt permutation hash (functions/hashing.perm_col);
# inputs here are non-negative fingerprints, so pmod == the original %
_perm_col = perm_col


def indexed_adjacency(edges: DataFrame) -> DataFrame:
    """(node, neighbor, neighbor_idx, degree) over the symmetrized edge
    list, neighbors sorted — the walk step's lookup table."""
    sym = edges.select(
        F.col("source").alias("node"), F.col("target").alias("neighbor")
    ).unionByName(
        edges.select(F.col("target").alias("node"), F.col("source").alias("neighbor"))
    ).distinct()
    w = Window.partitionBy("node").orderBy("neighbor")
    return (
        sym.withColumn("neighbor_idx", F.row_number().over(w).cast("long") - 1)
        .withColumn("degree", F.count("*").over(Window.partitionBy("node")))
    )


def walks(
    nodes: DataFrame,
    edges: DataFrame,
    walk_length: int = 8,
    num_walks: int = 4,
    node_col: str = "title",
) -> DataFrame:
    """(title, walk_id, step, node): hash-driven walks from every node."""
    # adjacency is probed once per step and each step feeds BOTH the
    # output union and the next step — persist both so the L-step chain
    # stays O(L) instead of O(L²) plan replays (frames are |V|-bounded)
    adj = indexed_adjacency(edges).persist()
    small = adj.limit(BROADCAST_ADJ_LIMIT + 1).count() <= BROADCAST_ADJ_LIMIT
    adj_j = F.broadcast(adj) if small else adj
    starts = nodes.select(F.col(node_col).alias("title")).crossJoin(
        F.broadcast(
            nodes.sparkSession.range(num_walks).select(F.col("id").cast("int").alias("walk_id"))
        )
    )
    cur = starts.withColumn("step", F.lit(0)).withColumn("node", F.col("title"))
    out = cur
    # walk seed: hash of (start title, walk id) — fixed along the walk
    seed = _poly_col(F.concat_ws("#", F.col("title"), F.col("walk_id").cast("string")))
    for step in range(1, walk_length):
        nxt = (
            cur.withColumn("__seed", seed)
            .join(adj_j, "node")
            .filter(
                F.col("neighbor_idx")
                == F.pmod(_perm_col(F.col("__seed"), F.lit(step)), F.col("degree"))
            )
            .select(
                "title",
                "walk_id",
                (F.col("step") + 1).alias("step"),
                F.col("neighbor").alias("node"),
            )
        )
        nxt = nxt.persist()
        out = out.unionByName(nxt)
        cur = nxt
    return out


def node2vec_embeddings(
    nodes: DataFrame,
    edges: DataFrame,
    dim: int = DEFAULT_DIM,
    walk_length: int = 8,
    num_walks: int = 4,
    window: int = 2,
    node_col: str = "title",
) -> DataFrame:
    """(title, dim_idx, value_micro): L2-normalized feature-hashed
    co-occurrence embedding, values floored at 1e-6 for integer-stable
    cross-engine comparison."""
    wk = walks(nodes, edges, walk_length=walk_length, num_walks=num_walks, node_col=node_col)
    a = wk.select("title", "walk_id", F.col("step").alias("sa"), F.col("node").alias("na"))
    b = wk.select("title", "walk_id", F.col("step").alias("sb"), F.col("node").alias("nb"))
    # |walks| = |V|·num_walks·walk_length rows; broadcast the context side
    # of the co-occurrence self-join for small graphs (physical only)
    small = edges.limit(BROADCAST_ADJ_LIMIT + 1).count() <= BROADCAST_ADJ_LIMIT
    cooc = (
        a.join(F.broadcast(b) if small else b, ["title", "walk_id"])
        .filter(
            (F.abs(F.col("sa") - F.col("sb")) <= window)
            & (F.col("sa") != F.col("sb"))
            & (F.col("na") != F.col("nb"))
        )
        .groupBy(F.col("na").alias("node"), F.col("nb").alias("ctx"))
        .agg(F.count("*").cast("long").alias("cnt"))
        # consumed by cells AND the dims domain — compute once; eager
        # localCheckpoint (not persist) because the walk lineage below is
        # L persisted step-joins deep and Catalyst re-analyzes the whole
        # tree per downstream action (measured 22s per action on a toy
        # graph, 0.2s once truncated)
    ).localCheckpoint(eager=True)
    cells = cooc.groupBy(
        "node", F.pmod(_poly_col(F.col("ctx")), F.lit(dim)).alias("dim_idx")
    ).agg(F.sum("cnt").cast("double").alias("v"))
    # exact-integer sum of squares → norm identical on every engine
    norms = cells.groupBy("node").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    dims = cooc.select("node").distinct().crossJoin(
        F.broadcast(
            nodes.sparkSession.range(dim).select(F.col("id").cast("int").alias("dim_idx"))
        )
    )
    return (
        dims.join(cells, ["node", "dim_idx"], "left")
        .join(norms, "node")
        .select(
            F.col("node").alias("title"),
            "dim_idx",
            F.floor(F.coalesce(F.col("v"), F.lit(0.0)) / F.col("nrm") * 1_000_000)
            .cast("bigint")
            .alias("value_micro"),
        )
    )


def as_vectors(embedding_long: DataFrame) -> DataFrame:
    """(title, embedding array<float>) for the ANN operators / S10 sink."""
    return embedding_long.groupBy("title").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim_idx", "value_micro"))),
            lambda s: (s["value_micro"] / 1_000_000).cast("float"),
        ).alias("embedding")
    )
