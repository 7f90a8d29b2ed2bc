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


def ivf_probe_cells(vec: F.Column, bits: int = 8, nprobe: int = 1) -> F.Column:
    """Multi-probe cell list for a query vector: the home cell plus the
    cells reached by flipping the ``nprobe - 1`` LEAST-CONFIDENT sign
    bits — the dimensions with the smallest |value| among the first
    ``bits``, ties broken by dimension index.  This is the standard
    multi-probe LSH recall lever (probe the buckets the vector almost
    landed in) with a deterministic, closed-form perturbation order, so
    a SQL oracle can enumerate the identical probe set.  All probes are
    distinct by construction (each flips a different bit)."""
    cell = ivf_cell(vec, bits)
    if nprobe <= 1:
        return F.array(cell)
    pow2 = F.array(*[F.lit(1 << i).cast("bigint") for i in range(bits)])
    flip_dims = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bits - 1)),
                    lambda i: F.struct(
                        F.abs(F.element_at(vec, i + 1).cast("double")).alias("a"),
                        i.cast("int").alias("i"),
                    ),
                )
            ),
            1,
            nprobe - 1,
        ),
        lambda s: s["i"],
    )
    return F.concat(
        F.array(cell),
        F.transform(flip_dims, lambda i: cell.bitwiseXOR(F.element_at(pow2, i + 1))),
    )


def ivf_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN probing ``nprobe`` cells per query (home cell + least-
    confident bit flips).  Same output shape as ivf_topk; recall rises
    toward exact as nprobe grows while the scan stays an equi-join on
    cell id — probe cost is nprobe/2^bits of the corpus per query, vs
    the full corpus for cosine_topk.  nprobe=1 is exactly ivf_topk."""
    c = _with_unit(_as_double(corpus, vec_col), vec_col, "u").select(
        F.col(id_col).alias("neighbor_id"),
        F.col("u").alias("cvec"),
        ivf_cell(F.col(vec_col), bits).alias("cell"),
    )
    q = _with_unit(_as_double(queries, vec_col), vec_col, "u").select(
        F.col(id_col).alias("query_id"),
        F.col("u").alias("qvec"),
        F.explode(ivf_probe_cells(F.col(vec_col), bits, nprobe)).alias("cell"),
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
# Numpy fast paths — the 100 TB execution shape: distributed block-matmul.
#
# No driver collect anywhere: rows are hashed to fixed-size blocks, each
# (block_i, block_j) cell of the pair grid is shuffled to ONE task via a
# cogrouped applyInPandas, and the task runs a single BLAS sgemm over the
# two blocks.  Executor memory per task is bounded by 2×rows_per_block
# vectors regardless of corpus size; the O(n²) flops (inherent to exact
# all-pairs) are spread across B(B+1)/2 independent tasks.
# ---------------------------------------------------------------------------


def _num_blocks(df: DataFrame, rows_per_block: int, fill_cluster: bool = False) -> int:
    """Block count from the corpus cardinality.  The count is one narrow
    scan of the id column; on a real deployment this comes free from table
    metadata (Iceberg snapshot row count).

    ``fill_cluster``: raise B so the B(B+1)/2 pair-grid cells cover the
    cluster's task slots even on small corpora — otherwise a 2-block
    corpus yields a 3-task stage that idles the rest of the executors."""
    n = df.count()
    b = max(1, -(-n // rows_per_block))
    if fill_cluster:
        par = df.sparkSession.sparkContext.defaultParallelism
        b_fill = int((2 * par) ** 0.5) + 1
        b = max(b, min(b_fill, n))  # never more blocks than rows
    return b


def _to_matrix(pdf, vec_col: str):
    m = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
    # zero-norm guard: eps floor instead of silent NaN rows
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return m


def neardup_pairs_fast(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_block: int = 4096,
) -> DataFrame:
    """Near-dup pairs via distributed blocked BLAS.

    Plan shape: hash rows to B blocks; explode each row to the block-pair
    grid cells it participates in (row in block b → left side of cells
    (b, j≥b), right side of cells (i≤b, b)); cogroup on (bi, bj); one
    sgemm per cell inside applyInPandas.  Replication factor is ~B per
    side — the unavoidable data-movement cost of exact all-pairs, but
    every task is bounded-memory and the grid parallelizes across the
    cluster.  At corpus scale prefer lsh_neardup_pairs (candidate
    generation) and use this on the candidate-restricted corpus.

    Sum order is BLAS pairwise, so use the exact fold variant when
    bit-parity with a sequential oracle matters."""
    B = _num_blocks(corpus, rows_per_block, fill_cluster=True)
    tau = threshold
    c = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("blk", F.pmod(F.xxhash64(F.col("vid")), F.lit(B)).cast("int"))
    left = c.select(
        F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), F.lit(B - 1))).alias("bj"),
        "vid",
        "vec",
    )
    # right-side columns get DISTINCT names: with identical attribute
    # lineage on both cogroup sides, Spark's attribute dedup prunes the
    # right group frame down to the grouping key (observed on 4.1)
    right = c.select(
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
        F.col("blk").alias("bj"),
        F.col("vid").alias("vid_r"),
        F.col("vec").alias("vec_r"),
    )

    def cell(key, lpdf, rpdf):
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim_micro": []}).astype(
                {"id_a": "int64", "id_b": "int64", "sim_micro": "int64"}
            )
        lm, rm = _to_matrix(lpdf, "vec"), _to_matrix(rpdf, "vec_r")
        lid, rid = lpdf["vid"].to_numpy(), rpdf["vid_r"].to_numpy()
        sims = lm @ rm.T
        ii, jj = np.nonzero(sims >= tau)
        a, b = lid[ii], rid[jj]
        if key[0] == key[1]:
            # diagonal cell: every pair appears in BOTH orientations —
            # a<b both dedups and orients
            keep = a < b
            a, b, s = a[keep], b[keep], sims[ii, jj][keep]
        else:
            # off-diagonal: each cross-block pair appears exactly once,
            # in arbitrary id order — orient, never filter (filtering
            # here silently dropped pairs whose id order opposed the
            # block order)
            s = sims[ii, jj]
            a, b = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {
                "id_a": a.astype("int64"),
                "id_b": b.astype("int64"),
                "sim_micro": np.floor(s * SIM_SCALE).astype("int64"),
            }
        )

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(cell, schema="id_a bigint, id_b bigint, sim_micro bigint")
    )


def cosine_topk_fast(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_block: int = 4096,
) -> DataFrame:
    """Top-k via distributed block-matmul: queries hashed to QB blocks,
    corpus rows exploded across the QB query blocks, one sgemm per
    (query-block × corpus-partition-batch) group emitting a per-group
    top-k (≤ k rows per query per corpus block), then the same global
    (sim desc, id asc) window as the exact variant.  No driver collect;
    per-task memory bounded by one query block + one corpus block."""
    QB = _num_blocks(queries, rows_per_block)
    CB = _num_blocks(corpus, rows_per_block, fill_cluster=True)
    q = queries.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("qb", F.pmod(F.xxhash64(F.col("vid")), F.lit(QB)).cast("int"))
    qx = q.select(
        "qb",
        F.explode(F.sequence(F.lit(0), F.lit(CB - 1))).alias("cb"),
        "vid",
        "vec",
    )
    # distinct corpus-side names: same attribute-dedup hazard as in
    # neardup_pairs_fast when queries and corpus share a lineage
    c = corpus.select(
        F.col(id_col).alias("vid_c"), F.col(vec_col).alias("vec_c")
    ).withColumn("cb", F.pmod(F.xxhash64(F.col("vid_c")), F.lit(CB)).cast("int"))
    cx = c.select(
        F.explode(F.sequence(F.lit(0), F.lit(QB - 1))).alias("qb"), "cb", "vid_c", "vec_c"
    )

    def cell(key, qpdf, cpdf):
        empty = pd.DataFrame({"query_id": [], "neighbor_id": [], "sim_micro": []}).astype(
            {"query_id": "int64", "neighbor_id": "int64", "sim_micro": "int64"}
        )
        if len(qpdf) == 0 or len(cpdf) == 0:
            return empty
        qm, cm = _to_matrix(qpdf, "vec"), _to_matrix(cpdf, "vec_c")
        qid, cid = qpdf["vid"].to_numpy(), cpdf["vid_c"].to_numpy()
        sims = qm @ cm.T
        sims_mi = np.floor(sims * SIM_SCALE).astype("int64")
        frames = []
        for i in range(len(qid)):
            row = sims_mi[i]
            mask = cid != qid[i]
            nbr, sv = cid[mask], row[mask]
            if len(nbr) == 0:
                continue
            # local top-k (sim desc, id asc) — shrinks shuffle to ≤k/query/cell
            order = np.lexsort((nbr, -sv))[:k]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(order), qid[i], dtype="int64"),
                        "neighbor_id": nbr[order].astype("int64"),
                        "sim_micro": sv[order],
                    }
                )
            )
        return pd.concat(frames) if frames else empty

    scored = (
        qx.groupBy("qb", "cb")
        .cogroup(cx.groupBy("qb", "cb"))
        .applyInPandas(cell, schema="query_id bigint, neighbor_id bigint, sim_micro bigint")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_micro"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("int")).filter(F.col("rk") <= k)


QUANT_LEVELS = 127  # int8 symmetric quantization


def with_int8(df: DataFrame, vec_col: str = "embedding", out_col: str = "q") -> DataFrame:
    """Adds a per-vector symmetrically quantized int copy of the vector:
    ``q_i = floor(v_i * 127 / max_j |v_j|)``.  At corpus scale the int8
    codes are what sits in memory/storage for the first ANN pass — a 4×
    cut vs fp32 (8× vs fp64) — while the float vectors are only touched
    for the candidate rerank.  floor (not round-half-even) keeps the code
    closed-form and bit-identical on every engine; the ≤½-level bias is
    irrelevant to a candidate-generation pass."""
    mx = F.aggregate(
        F.col(vec_col), F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v))
    )
    return (
        df.withColumn("__mx", F.greatest(mx, F.lit(1e-12)))
        .withColumn(
            out_col,
            F.transform(
                F.col(vec_col),
                lambda v: F.floor(v * QUANT_LEVELS / F.col("__mx")).cast("long"),
            ),
        )
        .drop("__mx")
    )


def _int_dot(a: F.Column, b: F.Column) -> F.Column:
    # exact int64 arithmetic: |q| <= 127, so d <= 16129·dim « 2^62
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-pass ANN: int8 dot product selects ``k * oversample``
    candidates per query, exact unit-vector cosine reranks to the final
    top-k.  Same output shape as cosine_topk; recall < 1 only where the
    quantized ordering flips a pair that the oversample margin misses.
    The approx pass is integer-only (SIMD-friendly, bit-stable across
    engines); the rerank uses the same sequential fold as the exact
    operator, so the emitted sim_micro values hash-match the oracle."""
    c = with_int8(_with_unit(_as_double(corpus, vec_col), vec_col, "u"), vec_col, "q").select(
        F.col(id_col).alias("neighbor_id"), F.col("u").alias("cvec"), F.col("q").alias("cq")
    )
    q = with_int8(_with_unit(_as_double(queries, vec_col), vec_col, "u"), vec_col, "q").select(
        F.col(id_col).alias("query_id"), F.col("u").alias("qvec"), F.col("q").alias("qq")
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        "cvec",
        "qvec",
        _int_dot(F.col("qq"), F.col("cq")).alias("qdot"),
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    cand = scored.withColumn("crk", F.row_number().over(w1)).filter(
        F.col("crk") <= k * oversample
    )
    rer = cand.select(
        "query_id",
        "neighbor_id",
        F.floor(_dot(F.col("qvec"), F.col("cvec")) * SIM_SCALE)
        .cast("bigint")
        .alias("sim_micro"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim_micro"), F.asc("neighbor_id"))
    return rer.withColumn("rk", F.row_number().over(w2).cast("int")).filter(F.col("rk") <= k)


def hyperplane_sig_bit(vec: F.Column, dim: int, n_planes: int, j: int) -> F.Column:
    """Bit j of the Rademacher-hyperplane signature: sign of the
    SEQUENTIAL fold of sum_d vec[d] * s(d, j) with s ∈ {±1} derived from
    the deterministic hash family (functions/hashing.py) — no RNG, no
    BLAS sum-order ambiguity, so a SQL oracle evaluating the same fold
    gets the identical bit even when the projection is near zero."""
    from ..functions.hashing import sign_plane

    plane = F.array(*[F.lit(float(sign_plane(d, j, n_planes))) for d in range(dim)])
    proj = F.aggregate(
        F.zip_with(vec, plane, lambda x, s: x * s), F.lit(0.0), lambda acc, v: acc + v
    )
    return (proj > 0).cast("int")


def lsh_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hyperplane-LSH near-dup: candidates share one band of the
    signature; exact cosine verifies.  Signature bits come from native
    sequential folds of deterministic ±1 planes, so the whole operator —
    blocking included — is SQL-expressible and hash-checked against the
    DuckDB oracle (``seed`` retained for API compatibility)."""
    rows_per_band = n_planes // bands
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec")
    )
    band_keys = [
        sum(
            (
                hyperplane_sig_bit(F.col("vec"), dim, n_planes, b * rows_per_band + r)
                * F.lit(1 << r)
                for r in range(rows_per_band)
            ),
            start=F.lit(0),
        )
        for b in range(bands)
    ]
    banded = c.select(
        "doc_id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("band"),
                        band_keys[i].cast("int").alias("key"),
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


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.8,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the embedding space into coarse clusters,
    then prune documents whose cosine similarity to a LOWER-ID member of
    the same cluster exceeds ``threshold``.

    Clustering here is the deterministic sign-bit coarse quantizer
    (`ivf_cell`) rather than k-means — same blocking role, zero training
    state, and the SQL oracle reproduces it exactly.  Pair scan is a
    WITHIN-CELL self equi-join: each cell's pair block is independent, so
    the O(n²) term is bounded per cell, never global.  (At 100 TB raise
    ``bits`` so cells stay small; skewed cells show up in the Spark UI as
    stragglers and are the signal to add bits — same knob as IVF.)

    Output: (vec_id, cell, canonical_id, is_pruned) — one row per corpus
    vector; pruned rows point at their smallest same-cell near-duplicate,
    keepers at themselves.
    """
    c = _with_unit(_as_double(corpus, vec_col), vec_col, "u").select(
        F.col(id_col).alias("vec_id"),
        ivf_cell(F.col(vec_col), bits).alias("cell"),
        F.col("u"),
    )
    a = c.select(F.col("vec_id").alias("id_a"), F.col("cell"), F.col("u").alias("va"))
    b = c.select(F.col("vec_id").alias("id_b"), F.col("cell"), F.col("u").alias("vb"))
    pairs = (
        a.join(b, ["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cell",
            "id_a",
            "id_b",
            F.floor(_dot(F.col("va"), F.col("vb")) * SIM_SCALE)
            .cast("bigint")
            .alias("sim_micro"),
        )
        .filter(F.col("sim_micro") >= int(threshold * SIM_SCALE))
    )
    nearest = pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
        F.min("id_a").alias("dup_of")
    )
    return (
        c.select("vec_id", "cell")
        .join(nearest, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce("dup_of", "vec_id").alias("canonical_id"),
            F.col("dup_of").isNotNull().alias("is_pruned"),
        )
    )


def semantic_dedup_kmeans(
    corpus: DataFrame,
    threshold: float = 0.8,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup with the paper's actual blocking: k-means clusters
    (Abbas et al. 2023 §3 cluster the corpus with k-means before the
    within-cluster cosine prune; `semantic_dedup` above substitutes the
    sign-bit quantizer).  Clustering is the integer-exact fixed-round
    Lloyd of ``operators/kmeans.py``, so the full composition — train,
    assign, prune — still has a bit-exact unrolled SQL oracle.

    Same pair-scan shape as `semantic_dedup`: within-cluster self
    equi-join, O(n²) bounded per cluster.  At 100 TB ``k`` scales with
    the corpus (k ≈ n/⟨cluster size⟩); the per-round cost stays one
    broadcast join + two map-side-collapsed shuffles.

    Output: (vec_id, cluster, canonical_id, is_pruned).
    """
    from .kmeans import kmeans_assignments

    cells = kmeans_assignments(
        corpus, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    ).select("vec_id", "cluster")
    c = (
        _with_unit(_as_double(corpus, vec_col), vec_col, "u")
        .select(F.col(id_col).alias("vec_id"), F.col("u"))
        .join(cells, "vec_id")
    )
    a = c.select(F.col("vec_id").alias("id_a"), "cluster", F.col("u").alias("va"))
    b = c.select(F.col("vec_id").alias("id_b"), "cluster", F.col("u").alias("vb"))
    pairs = (
        a.join(b, ["cluster"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.floor(_dot(F.col("va"), F.col("vb")) * SIM_SCALE)
            .cast("bigint")
            .alias("sim_micro"),
        )
        .filter(F.col("sim_micro") >= int(threshold * SIM_SCALE))
    )
    nearest = pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
        F.min("id_a").alias("dup_of")
    )
    return (
        c.select("vec_id", "cluster")
        .join(nearest, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce("dup_of", "vec_id").alias("canonical_id"),
            F.col("dup_of").isNotNull().alias("is_pruned"),
        )
    )


def topk_recall(
    exact: DataFrame,
    approx: DataFrame,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
) -> DataFrame:
    """ANN index quality audit: per-query recall@k of an approximate
    top-k result against the exact scan → (query_id, n_exact, n_hit,
    recall_micro).

    The measurement you run before trusting an IVF/LSH index at corpus
    scale (recall@k is THE standard ANN quality metric).  recall_micro =
    floor(1e6 · |approx ∩ exact| / |exact|) — one double division of
    exact small ints, bit-stable cross-engine.

    Scale shape: one equi-join on (query, neighbor) + two combinable
    groupBys on query_id — all shuffles keyed by query, no skew pivot
    (every query contributes exactly k rows).  Works on any pair of
    result tables sharing the (query, id) shape, so the same audit
    covers IVF, multi-probe, quantized, and LSH variants.
    """
    e = exact.select(query_col, id_col)
    a = approx.select(query_col, id_col)
    hits = (
        e.join(a, [query_col, id_col])
        .groupBy(query_col)
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    tot = e.groupBy(query_col).agg(F.count("*").cast("bigint").alias("n_exact"))
    n_hit = F.coalesce("n_hit", F.lit(0)).cast("bigint")
    return tot.join(hits, query_col, "left").select(
        query_col,
        "n_exact",
        n_hit.alias("n_hit"),
        F.floor(n_hit * F.lit(1_000_000) / F.col("n_exact"))
        .cast("bigint")
        .alias("recall_micro"),
    )


def contrastive_pairs(
    corpus: DataFrame,
    pos_threshold: float = 0.35,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mine (anchor, positive, hard negative) training triples for
    contrastive embedding training (the SimCLR/DPR data-prep step): for
    every vector, the most similar SAME-CELL neighbor at or above
    ``pos_threshold`` is its positive, and the most similar same-cell
    neighbor strictly below it is its HARD negative (near misses teach
    the margin; random negatives are too easy).  Anchors lacking either
    side emit nothing — a triple needs both.

    Determinism: per anchor both picks use the tie-free order
    (sim DESC, id ASC) via a partitioned row_number — one window keyed
    by anchor, never global.

    Scale shape: candidate generation is the same within-cell self
    equi-join as semantic_dedup (coarse sign-bit cells bound the O(n²)
    term per cell; raise ``bits`` at larger corpora).  Returns
    (anchor_id, pos_id, pos_sim_micro, neg_id, neg_sim_micro).
    """
    from pyspark.sql import Window

    c = _with_unit(_as_double(corpus, vec_col), vec_col, "u").select(
        F.col(id_col).alias("vec_id"),
        ivf_cell(F.col(vec_col), bits).alias("cell"),
        F.col("u"),
    )
    a = c.select(F.col("vec_id").alias("id_a"), "cell", F.col("u").alias("va"))
    b = c.select(F.col("vec_id").alias("id_b"), "cell", F.col("u").alias("vb"))
    # half feeds both union directions, each of which feeds both the
    # positive and negative picks — persist so the within-cell pair join
    # runs once, not four times (the ngram_dedup multi-consumer pattern)
    half = (
        a.join(b, ["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.floor(_dot(F.col("va"), F.col("vb")) * SIM_SCALE)
            .cast("bigint")
            .alias("sim_micro"),
        )
        .persist()
    )
    sym = half.select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("other_id"),
        "sim_micro",
    ).unionByName(
        half.select(
            F.col("id_b").alias("anchor_id"),
            F.col("id_a").alias("other_id"),
            "sim_micro",
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("sim_micro"), F.asc("other_id")
    )
    tau = int(pos_threshold * SIM_SCALE)

    def best(df, lo_ok):
        filtered = df.filter(
            F.col("sim_micro") >= tau if lo_ok else F.col("sim_micro") < tau
        )
        return (
            filtered.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    pos = best(sym, True).select(
        "anchor_id",
        F.col("other_id").alias("pos_id"),
        F.col("sim_micro").alias("pos_sim_micro"),
    )
    neg = best(sym, False).select(
        "anchor_id",
        F.col("other_id").alias("neg_id"),
        F.col("sim_micro").alias("neg_sim_micro"),
    )
    return pos.join(neg, "anchor_id")
