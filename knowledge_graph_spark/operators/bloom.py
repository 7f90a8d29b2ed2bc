"""Bloom filter on the SQL-expressible hash family: OR-mergeable bitmap
build + map-side membership probe (the classic big-big semi-join pruner).

Decontamination/dedup against a reference key set has two regimes.  When
the key set is small (benchmarks: MBs), broadcast the exact gram index —
`decontam.contamination_profile` does that.  When it is itself huge (a
multi-billion-gram blocklist, a previous corpus snapshot's fingerprints),
the exact index neither broadcasts nor belongs on the build side of a
map-side join — but its *Bloom bitmap* still fits in a broadcast: at
1e9 keys, ~1.2 GB gives 1% FPR, and the probe prunes the 100-TB side
BEFORE the verify join's shuffle.  That is Spark's own AQE runtime-filter
idea, reimplemented on the deterministic hash family so the bitmap —
every 32-bit word of it — is reproduced bit-for-bit by the DuckDB oracle
(engine-private hashing is exactly what `approx_count_distinct` and the
built-in bloom filter join can't offer for cross-engine checks).

Layout: ``bits`` bit positions packed 32 per 64-bit word (positions stay
< 2^31 and masks < 2^32, so every shift/OR/AND is int64-safe on both
engines).  Build is one explode(k)+groupBy(bit_or) — SUM-free,
OR-mergeable across shards and streaming micro-batches.  Probe is k
broadcast equi-joins on word_idx (no explode, no groupBy: row cardinality
is preserved, everything fuses into the scan stage).

No false negatives by construction (same family, same bits/k on both
sides), so a bloom prune followed by an exact verify join returns
EXACTLY the unfiltered answer — the gate checks that literally, reusing
the plain decontamination oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import perm_col, poly_hash_col

BLOOM_BITS = 1 << 18  # 256 Kbit = 8192 words — sized for the gate's eval set
BLOOM_K = 5
_WORD = 32  # bits packed per (int64-held) word


def _positions(col: F.Column, bits: int, k: int) -> list[F.Column]:
    """The k bit positions of a key — perm_i over the shared poly hash."""
    x = poly_hash_col(col)
    return [perm_col(x, i) % F.lit(bits) for i in range(k)]


def bloom_build(
    keys: DataFrame, col: str = "gram", bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """(word_idx, word) bitmap table of the keys' Bloom filter.

    bit_or partial-aggregates map-side, and two filters over disjoint key
    shards merge by the same bit_or — the streaming/mergeable property
    that lets a 1000-executor build produce one small table with a single
    bits/32-row shuffle."""
    pos = F.explode(F.array(*_positions(F.col(col), bits, k))).alias("pos")
    exploded = keys.select(pos)
    # pos < bits ≤ 2^30: the double division is exact, floor == integer div
    return (
        exploded.select(
            F.floor(F.col("pos") / _WORD).cast("int").alias("word_idx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD} AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").cast("bigint").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """``df`` + boolean ``out_col``: could ``col`` be in the filter?

    k broadcast hash joins on word_idx — map-side, row-preserving, fused
    into the scan stage; a missing word means those bits were never set
    (coalesce 0).  False ⇒ definitely absent; True ⇒ verify if exactness
    is needed."""
    out = df
    hit = F.lit(True)
    for i, pos in enumerate(_positions(F.col(col), bits, k)):
        w, bit, m, wd = f"_bw{i}", f"_bb{i}", f"_bm{i}", f"_wd{i}"
        out = (
            out.withColumn(w, F.floor(pos / _WORD).cast("int"))
            .withColumn(bit, (pos % _WORD).cast("int"))
            .withColumn(m, F.expr(f"shiftleft(CAST(1 AS BIGINT), {bit})"))
        )
        b = F.broadcast(
            bloom.select(F.col("word_idx").alias(w), F.col("word").alias(wd))
        )
        out = out.join(b, w, "left")
        hit = hit & (F.coalesce(F.col(wd), F.lit(0)).bitwiseAND(F.col(m)) != 0)
    drop = [
        c for i in range(k) for c in (f"_bw{i}", f"_bb{i}", f"_bm{i}", f"_wd{i}")
    ]
    return out.withColumn(out_col, hit).drop(*drop)
