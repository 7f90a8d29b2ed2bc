"""SQL-expressible deterministic hash family shared by the MinHash /
SimHash / hyperplane-LSH kernels AND their DuckDB oracles.

Design constraints (why not crc32 / np.random):
- every value must be reproducible from pure integer arithmetic that any
  SQL engine evaluates identically — no library CRC tables, no RNG state;
- every intermediate must fit in signed 64-bit WITHOUT overflow, so the
  result never depends on an engine's wrap/error overflow behavior.

Base string hash: polynomial fold ``h -> (h*FP_BASE + ord(ch)) % FP_MOD``
(the same family as functions/textqc.rolling_fingerprint, FP_MOD ≈ 2^30).
Permutation family over a base hash x:

    perm_i(x) = (a_i * x + b_i) % HASH_M31
    a_i = (HASH_A * (i+1)) % HASH_M31      (non-zero: M31 prime, factors < M31)
    b_i = (HASH_B * (i+1) + HASH_C) % HASH_M31

a_i < 2^31 and x < 2^30 → a_i*x + b_i < 2^62: safe in int64 everywhere.
"""

from __future__ import annotations

import numpy as np

from .textqc import FP_BASE, FP_MOD

HASH_M31 = (1 << 31) - 1  # Mersenne prime 2^31-1
HASH_A = 1103515245
HASH_B = 12345
HASH_C = 1013904223


def poly_hash(s: str) -> int:
    """Sequential polynomial hash of a string (codepoint stream)."""
    h = 0
    for ch in s:
        h = (h * FP_BASE + ord(ch)) % FP_MOD
    return h


def poly_hash_kgrams(s: str, k: int) -> np.ndarray:
    """Poly hashes of ALL k-grams of ``s`` in one vectorized pass —
    h(s[i:i+k]) for every window i, identical to poly_hash per window."""
    ords = np.frompyfunc(ord, 1, 1)(np.array(list(s))).astype(np.int64) if s else np.empty(
        0, dtype=np.int64
    )
    n = len(ords) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    powers = np.array([pow(FP_BASE, k - 1 - j, FP_MOD) for j in range(k)], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(ords, k)
    # ord < 2^21, power < 2^30 → product < 2^51; k ≤ 16 terms → < 2^55
    return (win * powers).sum(axis=1) % FP_MOD


def perm_ab(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) coefficient vectors for n permutation hashes."""
    i = np.arange(1, n + 1, dtype=np.int64)
    return (HASH_A * i) % HASH_M31, (HASH_B * i + HASH_C) % HASH_M31


def perm_coeffs(i: int) -> tuple[int, int]:
    """(a_i, b_i) of perm_i as plain Python ints — the round-loop form
    used by the fixed-round graph kernels (luby_mis, jp_coloring,
    maximal_matching), where the salt is a per-round constant rather
    than a column.  Identical to perm_ab(n)[.][i] and the SQL oracles'
    inline coefficient arithmetic: one definition, three call shapes."""
    return (HASH_A * (i + 1)) % HASH_M31, (HASH_B * (i + 1) + HASH_C) % HASH_M31


def perm_col(x, i):
    """perm_i(x) = (a_i·x + b_i) mod M31 as a native Spark Column, with
    the salt ``i`` itself a Column (or int) — the column-salt form used
    when every row carries its own permutation index (negative_samples'
    sample_idx, node2vec's walk index).  All arithmetic in BIGINT;
    ``x`` must be non-negative and < 2^31 (pmod a fingerprint first) so
    a_i·x + b_i < 2^62 stays int64-exact on every engine."""
    from pyspark.sql import functions as F

    i_col = i if hasattr(i, "cast") else F.lit(i)
    one = F.lit(1).cast("long")
    a = (F.lit(HASH_A).cast("long") * (i_col.cast("long") + one)) % F.lit(HASH_M31)
    b = (
        F.lit(HASH_B).cast("long") * (i_col.cast("long") + one)
        + F.lit(HASH_C).cast("long")
    ) % F.lit(HASH_M31)
    return F.pmod(a * x.cast("long") + b, F.lit(HASH_M31))


def sign_plane(d: int, j: int, n_planes: int) -> int:
    """Deterministic Rademacher (±1) hyperplane component for dimension d,
    plane j — parity of a perm hash of the flattened index."""
    v = (HASH_A * (d * n_planes + j + 1) + HASH_C) % HASH_M31
    return 1 if v % 2 == 1 else -1
