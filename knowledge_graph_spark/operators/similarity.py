"""Similarity search over an embedding column (array<float>).

Three operators over ``embeddings(vec_id, embedding, label)``:

- **brute-force cosine top-k** — the exactness baseline: broadcast the
  (small) query set against the corpus, dot product via native
  ``F.zip_with`` + ``F.aggregate`` (JVM-side, sequential fold → bit-stable
  across engines), per-query top-k via a window over (sim desc, id).
  Scale shape: corpus-partition-parallel scan, no corpus shuffle; the
  only shuffle is the per-query top-k (tiny: k × |queries| rows after
  partial aggregation).
- **IVF-style bucketed ANN** — the scale path: a coarse quantizer
  (sign bits of the first ``ivf_bits`` dimensions → 2^bits cells, a
  deterministic stand-in for trained k-means centroids) assigns every
  vector to a cell; queries probe only their own cell.  Deterministic and
  closed-form → fully SQL-expressible for the oracle.  At 100 TB this is
  the pattern that matters: cell assignment is a narrow map, the probe is
  an equi-join on cell id instead of a cross join.
- **near-dup pairs** — all pairs with cosine ≥ τ: exact variant
  (self-join, oracle-checkable) and an LSH variant (random-hyperplane
  signatures, bucket-join) for corpus-scale near-dup sweeps.

Similarities are truncated to 6 decimals (floor) on BOTH engines so the
value-hash comparison is immune to last-ulp float-sum drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIM_SCALE = 1_000_000  # floor(sim * SIM_SCALE) — shared with the SQL oracle


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity of two double arrays, sequential-fold order."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, sim_micro,
    rk).  Ties broken by neighbor id ascending; self-matches excluded."""
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.floor(cosine_sim(F.col("qvec"), F.col("cvec")) * SIM_SCALE)
        .cast("bigint")
        .alias("sim_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_micro"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


def ivf_cell(vec: F.Column, bits: int = 8) -> F.Column:
    """Coarse-quantizer cell id: bit i set iff dimension i > 0.  Unrolled
    sum of literal powers of two (codegen-friendly, no UDF)."""
    cell = F.lit(0).cast("bigint")
    for i in range(bits):
        cell = cell + F.when(F.element_at(vec, i + 1) > 0, F.lit(1 << i)).otherwise(0).cast(
            "bigint"
        )
    return cell


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed ANN: probe only the query's own cell.  Same output
    shape as cosine_topk (plus the cell id); recall < 1 by construction —
    the exactness/throughput trade the caller opts into."""
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        ivf_cell(F.col(vec_col), bits).alias("cell"),
    )
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        ivf_cell(F.col(vec_col), bits).alias("cell"),
    )
    scored = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        "cell",
        F.floor(cosine_sim(F.col("qvec"), F.col("cvec")) * SIM_SCALE)
        .cast("bigint")
        .alias("sim_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_micro"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("int")).filter(F.col("rk") <= k)


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact near-dup pairs (id_a < id_b, cosine ≥ threshold).  O(n²) —
    the correctness baseline; use the LSH variant at corpus scale."""
    c = _as_double(corpus, vec_col)
    a = c.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = c.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.floor(cosine_sim(F.col("va"), F.col("vb")) * SIM_SCALE)
            .cast("bigint")
            .alias("sim_micro"),
        )
        .filter(F.col("sim_micro") >= int(threshold * SIM_SCALE))
    )


def make_hyperplane_udf(dim: int, n_planes: int, seed: int):
    """Random-hyperplane signature (SimHash for vectors): bit j = sign of
    <v, r_j>.  One numpy matmul per Arrow batch."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, n_planes)

    @F.pandas_udf(T.LongType())
    def sig_udf(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())
        bits = (m @ planes) > 0
        weights = (1 << np.arange(n_planes, dtype=np.uint64))
        return pd.Series((bits.astype(np.uint64) @ weights).astype(np.int64))

    return sig_udf


def lsh_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hyperplane-LSH near-dup: candidates share one band of the
    signature; exact cosine verifies.  Probabilistic recall → rows-only at
    the gate, pytest-verified against the exact variant."""
    rows_per_band = n_planes // bands
    sig = make_hyperplane_udf(dim, n_planes, seed)
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec"), sig(F.col(vec_col)).alias("sig")
    )
    mask = (1 << rows_per_band) - 1
    banded = c.select(
        "doc_id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("band"),
                        F.shiftright("sig", i * rows_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "vec", "bb.band", "bb.key")
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.floor(cosine_sim(F.col("va"), F.col("vb")) * SIM_SCALE).cast("bigint").alias("sim_micro"),
    ).filter(F.col("sim_micro") >= int(threshold * SIM_SCALE))
