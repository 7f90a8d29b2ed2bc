"""Bloom filter (operators/bloom.py): no false negatives, bounded FPR,
OR-mergeability, decontam-plan equivalence, and physical-plan shape.
"""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.functions.hashing import HASH_A, HASH_B, HASH_C, HASH_M31, poly_hash
from knowledge_graph_spark.operators import bloom as bl


def _local_positions(s: str, bits=bl.BLOOM_BITS, k=bl.BLOOM_K):
    x = poly_hash(s)
    out = []
    for i in range(k):
        a = (HASH_A * (i + 1)) % HASH_M31
        b = (HASH_B * (i + 1) + HASH_C) % HASH_M31
        out.append(((a * x + b) % HASH_M31) % bits)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"token_{i % 11} shared words appear here plus doc specific tail {i} "
            f"filler_{i % 3} filler_{i % 5} more body text {i * 7}")
        for i in range(40)
    ] + [(40, "")]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def keyed(spark):
    keys = spark.createDataFrame([(f"key_{i}",) for i in range(2000)], "gram: string")
    return keys, bl.bloom_build(keys)


def test_build_matches_local_mirror(spark):
    rows = ["alpha", "beta", "gamma"]
    keys = spark.createDataFrame([(s,) for s in rows], "gram: string")
    got = {r["word_idx"]: r["word"] for r in bl.bloom_build(keys).collect()}
    want = {}
    for s in rows:
        for pos in _local_positions(s):
            w, b = pos // 32, pos % 32
            want[w] = want.get(w, 0) | (1 << b)
    assert got == want


def test_no_false_negatives_bounded_fpr(spark, keyed):
    keys, bloom = keyed
    probe = spark.createDataFrame(
        [(f"key_{i}",) for i in range(1000, 4000)], "gram: string"
    )
    got = {r["gram"]: r["bloom_maybe"] for r in bl.bloom_probe(probe, "gram", bloom).collect()}
    members = [g for g in got if int(g.split("_")[1]) < 2000]
    non = [g for g in got if int(g.split("_")[1]) >= 2000]
    assert all(got[g] for g in members)  # NEVER a false negative
    fpr = sum(got[g] for g in non) / len(non)
    # theory: (1-exp(-k*n/m))^k ≈ 2e-7 at n=2000, m=2^18, k=5; allow slack
    assert fpr < 0.01


def test_bitmaps_merge_by_or(spark, keyed):
    keys, full = keyed
    half_a = keys.filter(F.col("gram") < "key_5")
    half_b = keys.filter(F.col("gram") >= "key_5")
    wa = {r["word_idx"]: r["word"] for r in bl.bloom_build(half_a).collect()}
    wb = {r["word_idx"]: r["word"] for r in bl.bloom_build(half_b).collect()}
    merged = {w: wa.get(w, 0) | wb.get(w, 0) for w in set(wa) | set(wb)}
    assert merged == {r["word_idx"]: r["word"] for r in full.collect()}


def test_bloom_decontam_equals_plain(spark, docs):
    from knowledge_graph_spark.operators import decontam

    ev = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    plain = decontam.contamination_profile(docs, ev, n=5, threshold=0.05)
    pruned = decontam.contamination_profile_bloom(docs, ev, n=5, threshold=0.05)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, pruned.collect()))
    assert a == b


def test_probe_plan_is_broadcast_no_python_no_shuffle(spark):
    """The probe must be k BROADCAST joins fused map-side: no Exchange of
    the probed side, no Python."""
    df = spark.createDataFrame([(f"g{i}",) for i in range(100)], "gram: string")
    bloom = bl.bloom_build(spark.createDataFrame([("x",)], "gram: string"))
    p = (
        bl.bloom_probe(df, "gram", bloom)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in p
    assert "PythonUDF" not in p and "ArrowEval" not in p
    # only the bloom build side may exchange (its tiny groupBy);
    # the probe side must not reshuffle: no SortMergeJoin anywhere
    assert "SortMergeJoin" not in p
