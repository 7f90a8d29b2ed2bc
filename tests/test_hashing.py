"""The affine permutation family has ONE definition used in three call
shapes (numpy vectors, Python-int round coefficients, Spark Column) and
one SQL macro — these tests pin the three Python forms to each other so
a coefficient tweak can never desynchronize them silently (the SQL
macro is pinned transitively by every gate that uses perm hashes)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledge_graph_spark.functions.hashing import (
    HASH_M31,
    perm_ab,
    perm_coeffs,
)


@given(st.integers(min_value=0, max_value=63))
def test_perm_coeffs_equals_perm_ab(i):
    a_vec, b_vec = perm_ab(64)
    assert (int(a_vec[i]), int(b_vec[i])) == perm_coeffs(i)


@settings(max_examples=25)
@given(
    st.integers(min_value=0, max_value=(1 << 30) - 1),
    st.integers(min_value=0, max_value=15),
)
def test_perm_coeffs_int64_safe(x, i):
    a, b = perm_coeffs(i)
    v = a * x + b
    assert 0 <= v < (1 << 62)  # fits int64 on every engine
    assert 0 <= v % HASH_M31 < HASH_M31


def test_perm_col_matches_perm_coeffs(spark):
    from pyspark.sql import functions as F

    from knowledge_graph_spark.functions.hashing import perm_col

    rows = [(x, i) for x in (0, 1, 7, (1 << 30) - 1) for i in (0, 3, 15)]
    df = spark.createDataFrame(rows, "x long, i long")
    got = {
        (r.x, r.i): r.p
        for r in df.select("x", "i", perm_col(F.col("x"), F.col("i")).alias("p")).collect()
    }
    for (x, i), p in got.items():
        a, b = perm_coeffs(i)
        assert p == (a * x + b) % HASH_M31
