"""Product quantization (PQ) ANN — integer-exact codebooks, encoding,
and asymmetric-distance top-k.

PQ (Jégou, Douze & Schmid 2011, "Product Quantization for Nearest
Neighbor Search") is the standard way to hold a billion-vector index in
memory: split each d-dim vector into m subvectors, k-means each subspace
into k codes, store each vector as m small code ids (m·log2(k) bits
instead of d floats), and answer queries by Asymmetric Distance
Computation — the query precomputes its exact distance to every centroid
per subspace (an m×k table), and a database vector's approximate
distance is the sum of m table lookups.  The reference repo's vector
side is LanceDB search (/root/reference/query/inputs/retrieval/
entities.py); IVF/LSH/int8 variants live in similarity.py — PQ completes
the standard index family.

Determinism: every subspace runs the integer-exact Lloyd kernel of
``kmeans.py`` (quantized grid, int64 distances, floored means, argmin
ties to the lower code id), so codebooks, codes, and every ADC distance
are pure int64 — the unrolled SQL oracle reproduces the top-k
bit-for-bit.  Top-k ties break on neighbor id.

Scale shape (the whole point of PQ):
- Training/encoding per subspace is the kmeans plan: broadcast k-row
  codebook joins + map-side-partial argmin — never a point-point join.
- The query side builds an m·k-row distance table per query (tiny) and
  joins it to the codes on (subspace, code id) — an equi-join whose
  build side is broadcastable for any realistic query batch, so scoring
  the full corpus is one map-side lookup join + a groupBy sum, shuffling
  one row per (query, candidate) only into the per-query top-k heap
  (TakeOrdered within window partitions).
- Codes are m small ints per vector: the 100 TB corpus's index fits a
  fraction of the raw footprint, which is what makes the scan feasible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kmeans import _d2, assign, init_centroids, quantize, update_centroids


def _sub_slice(qfull: DataFrame, lo: int, length: int) -> DataFrame:
    """Subspace slice of an already-quantized (vec_id, q) frame.  floor is
    per-dimension, so slice∘quantize == quantize∘slice — this lets the
    m subspaces share ONE persisted scan+quantize of the corpus instead
    of re-reading the parquet per subspace (was m scans; plan-audited)."""
    return qfull.select("vec_id", F.slice(F.col("q"), lo, length).alias("q"))


def train_codebook(pts: DataFrame, k: int, iterations: int) -> DataFrame:
    """Fixed-round Lloyd on one subspace → (cid, c) codebook (k rows)."""
    centroids = init_centroids(pts, k).localCheckpoint(eager=True)
    for _ in range(iterations):
        centroids = update_centroids(assign(pts, centroids), centroids).localCheckpoint(
            eager=True
        )
    return centroids


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    k_codes: int = 8,
    iterations: int = 2,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-``k_top`` neighbors per query → (query_id, neighbor_id,
    adc_d2, rk).  ``dim`` must be divisible by ``m``; queries are scored
    against the PQ codes (the query's own grid-quantized subvectors vs
    the corpus's centroid codes — the asymmetric convention: query-side
    vectors are never PQ-encoded, only the database side pays the
    compression).  Self-matches are excluded.
    """
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    sub = dim // m
    qfull = quantize(corpus, id_col, vec_col).persist()
    qqueries = quantize(queries, id_col, vec_col).persist()
    contribs = []
    for s in range(m):
        pts = _sub_slice(qfull, s * sub + 1, sub)
        codebook = train_codebook(pts, k_codes, iterations)
        codes = assign(pts, codebook).select("vec_id", "cid")
        qpts = _sub_slice(qqueries, s * sub + 1, sub)
        # the per-query m×k distance table (tiny: |queries|·k rows)
        dist_table = qpts.crossJoin(F.broadcast(codebook)).select(
            F.col("vec_id").alias("query_id"),
            "cid",
            _d2(F.col("q"), F.col("c")).alias("qd2"),
        )
        contribs.append(
            codes.join(F.broadcast(dist_table), "cid").select(
                "query_id", F.col("vec_id").alias("neighbor_id"), F.col("qd2")
            )
        )
    union = contribs[0]
    for c in contribs[1:]:
        union = union.unionByName(c)
    total = (
        union.filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qd2").cast("bigint").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("neighbor_id"))
    return (
        total.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k_top)
    )


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 top-k on the integer grid → (query_id,
    neighbor_id, d2, rk) — the ground truth the PQ recall audit measures
    against (same metric, same quantization, zero codebook loss).

    Plan: broadcast the (small) query batch against one corpus scan —
    every candidate is scored map-side, and only the per-query top-k
    survives the window.  The documented O(|corpus|·|queries|) exact
    baseline, like similarity.cosine_topk.
    """
    pts = quantize(corpus, id_col, vec_col)
    qp = quantize(queries, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    scored = (
        pts.join(F.broadcast(qp), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _d2(F.col("qq"), F.col("q")).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k_top)
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    k_codes: int = 8,
    iterations: int = 2,
    bits: int = 8,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: coarse-cell candidate pruning + PQ-ADC ranking →
    (query_id, neighbor_id, cell, adc_d2, rk) — the composition every
    production billion-vector index runs (Jégou et al. 2011 §V; FAISS
    IndexIVFPQ).

    The IVF stage (sign-bit cells, similarity.ivf_cell) cuts candidates
    to the query's own cell — the fraction of the corpus actually scored
    — and the PQ stage ranks those candidates from m code lookups
    instead of a d-dim scan.  At 100 TB this is the only shape that
    works: the exhaustive ADC scan still touches every vector's codes,
    whereas IVF-PQ touches |cell| of them.

    Plan: the candidate set is one equi-join on cell (query side
    broadcast), then each subspace adds one broadcast lookup join; the
    only wide shuffle carries candidate rows into the per-query top-k
    window.  Both stages are the already-gated primitives, so the oracle
    composes their SQL verbatim.
    """
    from .similarity import ivf_cell

    ccells = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        ivf_cell(F.col(vec_col).cast("array<double>"), bits).alias("cell"),
    )
    qcells = queries.select(
        F.col(id_col).alias("query_id"),
        ivf_cell(F.col(vec_col).cast("array<double>"), bits).alias("cell"),
    )
    cand = (
        ccells.join(F.broadcast(qcells), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "cell")
    )

    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    sub = dim // m
    qfull = quantize(corpus, id_col, vec_col).persist()
    qqueries = quantize(queries, id_col, vec_col).persist()
    contribs = []
    for s in range(m):
        pts = _sub_slice(qfull, s * sub + 1, sub)
        codebook = train_codebook(pts, k_codes, iterations)
        codes = assign(pts, codebook).select(
            F.col("vec_id").alias("neighbor_id"), "cid"
        )
        qpts = _sub_slice(qqueries, s * sub + 1, sub)
        dist_table = qpts.crossJoin(F.broadcast(codebook)).select(
            F.col("vec_id").alias("query_id"),
            "cid",
            _d2(F.col("q"), F.col("c")).alias("qd2"),
        )
        contribs.append(
            cand.join(codes, "neighbor_id")
            .join(F.broadcast(dist_table), ["query_id", "cid"])
            .select("query_id", "neighbor_id", "cell", "qd2")
        )
    union = contribs[0]
    for c in contribs[1:]:
        union = union.unionByName(c)
    total = union.groupBy("query_id", "neighbor_id", "cell").agg(
        F.sum("qd2").cast("bigint").alias("adc_d2")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("neighbor_id"))
    return (
        total.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k_top)
    )
