"""Integer-exact Lloyd k-means (operators/kmeans.py).

The local mirror below re-implements the identical integer recurrence in
numpy; the distributed result must match it EXACTLY (same quantization,
same floored means, same tie-breaks) — the same proof obligation the
unrolled SQL oracle discharges at the gate.
"""

import numpy as np
import pytest

from knowledge_graph_spark.operators import kmeans as km
from knowledge_graph_spark.operators.similarity import semantic_dedup_kmeans

SEED = 20260817


def _toy(n=60, d=8, centers=4, spread=0.05):
    rng = np.random.default_rng(SEED)
    cent = rng.normal(0, 0.4, size=(centers, d))
    pts = cent[np.arange(n) % centers] + rng.normal(0, spread, size=(n, d))
    return pts.astype(np.float32)


def _local_kmeans(vecs: np.ndarray, k: int, iterations: int):
    """Bit-exact local mirror of kmeans_assignments."""
    q = np.floor(vecs.astype(np.float64) * km.Q_SCALE).astype(np.int64)
    cent = q[:k].copy()  # rows are vec_id-ordered already

    def assign(c):
        # exact integer distances; argmin ties -> lower cid
        d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cid = d2.argmin(axis=1)  # numpy argmin takes first (lowest) index
        return cid, d2[np.arange(len(q)), cid]

    for _ in range(iterations):
        cid, _ = assign(cent)
        for j in range(len(cent)):
            members = q[cid == j]
            if len(members):
                cent[j] = np.floor(
                    members.sum(axis=0).astype(np.float64) / float(len(members))
                ).astype(np.int64)
    cid, d2 = assign(cent)
    return cid, d2


@pytest.fixture(scope="module")
def corpus(spark):
    vecs = _toy()
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    return df, vecs


def test_matches_local_mirror_exactly(spark, corpus):
    df, vecs = corpus
    out = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in km.kmeans_assignments(df, k=4, iterations=3).collect()
    }
    cid, d2 = _local_kmeans(vecs, k=4, iterations=3)
    assert len(out) == len(vecs)
    for i in range(len(vecs)):
        assert out[i] == (cid[i], d2[i]), f"vec {i}"


def test_recovers_planted_clusters(spark, corpus):
    df, vecs = corpus
    out = km.kmeans_assignments(df, k=4, iterations=3).collect()
    # planted structure: vec_id % 4 is the true center; the assignment
    # must be a relabeling of it (tight spread, well-separated centers)
    label = {}
    for r in out:
        true = r["vec_id"] % 4
        label.setdefault(true, r["cluster"])
        assert label[true] == r["cluster"]
    assert len(set(label.values())) == 4


def test_k_exceeds_points_and_empty_clusters(spark):
    rows = [(i, [float(i), 0.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = km.kmeans_assignments(df, k=8, iterations=2).collect()
    assert len(out) == 3
    assert all(0 <= r["cluster"] < 3 for r in out)
    # each point sits exactly on an initial centroid -> d2 == 0
    assert all(r["d2"] == 0 for r in out)


def test_inertia_not_increased_by_training(spark, corpus):
    df, vecs = corpus
    untrained = km.kmeans_assignments(df, k=4, iterations=0)
    trained = km.kmeans_assignments(df, k=4, iterations=3)
    i0 = untrained.agg({"d2": "sum"}).collect()[0][0]
    i3 = trained.agg({"d2": "sum"}).collect()[0][0]
    assert i3 <= i0


def test_semantic_dedup_kmeans_prunes_planted_dups(spark):
    rng = np.random.default_rng(SEED + 1)
    base = rng.normal(0, 0.3, size=(20, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # plant near-exact duplicates of vec 0 and vec 7
    rows += [(100, [float(x) for x in base[0] * 1.0001])]
    rows += [(101, [float(x) for x in base[7] * 0.9999])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = {r["vec_id"]: r for r in semantic_dedup_kmeans(df, threshold=0.95, k=3, iterations=2).collect()}
    assert len(out) == 22
    assert out[100]["is_pruned"] and out[100]["canonical_id"] == 0
    assert out[101]["is_pruned"] and out[101]["canonical_id"] == 7
    assert not out[0]["is_pruned"] and not out[7]["is_pruned"]
    # pruned rows share their canonical's k-means cluster by construction
    assert out[100]["cluster"] == out[0]["cluster"]
