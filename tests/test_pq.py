"""Product quantization (operators/pq.py).

Two exactness anchors:
- l2_topk matches a numpy integer replay bit-for-bit;
- pq_topk with k_codes = |corpus| is DEGENERATE-EXACT: every point
  becomes its own centroid (the deterministic init seeds all points,
  singleton clusters keep their member as the floored mean), so ADC
  distance equals the exact grid distance and the PQ top-k must equal
  l2_topk exactly — a full-pipeline identity that exercises training,
  encoding, and ADC in one assertion.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.operators.kmeans import Q_SCALE
from knowledge_graph_spark.operators.pq import l2_topk, pq_topk

N, DIM, K_TOP = 20, 8, 3


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    data = (rng.rand(N, DIM) - 0.5).round(4)
    rows = [(i, [float(x) for x in data[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, data


def _replay_l2(data, n_queries, k_top):
    q = np.floor(data * Q_SCALE).astype(np.int64)
    out = {}
    for qi in range(n_queries):
        d2 = ((q - q[qi]) ** 2).sum(axis=1)
        order = sorted((int(d2[j]), j) for j in range(len(q)) if j != qi)
        out[qi] = [(j, d) for d, j in order[:k_top]]
    return out

def test_l2_topk_matches_numpy(spark, vecs):
    df, data = vecs
    queries = df.filter(F.col("vec_id") < 4)
    got = {}
    for r in l2_topk(df, queries, k_top=K_TOP).collect():
        got.setdefault(r.query_id, []).append((r.rk, r.neighbor_id, r.d2))
    want = _replay_l2(data, 4, K_TOP)
    for qi, lst in want.items():
        got_sorted = [ (n, d) for _, n, d in sorted(got[qi]) ]
        assert got_sorted == lst


def test_pq_with_one_code_per_point_is_exact(spark, vecs):
    df, _ = vecs
    queries = df.filter(F.col("vec_id") < 4)
    exact = {
        (r.query_id, r.rk): (r.neighbor_id, r.d2)
        for r in l2_topk(df, queries, k_top=K_TOP).collect()
    }
    pq = {
        (r.query_id, r.rk): (r.neighbor_id, r.adc_d2)
        for r in pq_topk(
            df, queries, dim=DIM, m=2, k_codes=N, iterations=1, k_top=K_TOP
        ).collect()
    }
    assert pq == exact


def test_pq_coarse_codebook_is_lossy_but_wellformed(spark, vecs):
    df, _ = vecs
    queries = df.filter(F.col("vec_id") < 4)
    rows = pq_topk(
        df, queries, dim=DIM, m=2, k_codes=3, iterations=2, k_top=K_TOP
    ).collect()
    by_q = {}
    for r in rows:
        assert r.query_id != r.neighbor_id and r.adc_d2 >= 0
        by_q.setdefault(r.query_id, []).append(r.rk)
    assert set(by_q) == {0, 1, 2, 3}
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())


def test_ivfpq_subset_of_pq_within_cells(spark, vecs):
    """IVF-PQ results must be exactly the PQ-ADC ranking restricted to
    same-cell candidates: every returned neighbor shares the query's
    cell, and its adc_d2 equals the unrestricted PQ distance."""
    from knowledge_graph_spark.operators.pq import ivfpq_topk
    from knowledge_graph_spark.operators.similarity import ivf_cell

    df, _ = vecs
    queries = df.filter(F.col("vec_id") < 4)
    cells = {
        r.vec_id: r.cell
        for r in df.select(
            "vec_id", ivf_cell(F.col("embedding").cast("array<double>"), 4).alias("cell")
        ).collect()
    }
    full = {
        (r.query_id, r.neighbor_id): r.adc_d2
        for r in pq_topk(
            df, queries, dim=DIM, m=2, k_codes=N, iterations=1, k_top=N
        ).collect()
    }
    got = ivfpq_topk(
        df, queries, dim=DIM, m=2, k_codes=N, iterations=1, bits=4, k_top=K_TOP
    ).collect()
    assert got, "ivfpq returned nothing — cells too fine for the fixture"
    for r in got:
        assert cells[r.query_id] == r.cell == cells[r.neighbor_id]
        assert full[(r.query_id, r.neighbor_id)] == r.adc_d2
