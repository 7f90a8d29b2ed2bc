"""Parallelism guards for CPU-heavy narrow stages.

At 100 TB a parquet scan arrives in thousands of splits and every core
has work.  At the small end — one 5 MB file → ONE partition — a
CPU-heavy narrow transform (n-gram explode, per-window fingerprinting)
runs on a single core while 31 idle, and no Spark config can split it
further (parquet splits at row-group granularity).  `widen` repartitions
ONLY when the input is narrower than the requested parallelism, so the
big-data path never pays an extra shuffle and the small-file path stops
serializing the whole scan onto one core.

Values are row-identical either way (round-robin repartition reorders
rows only); callers must therefore be order-insensitive — true for every
aggregate/join consumer in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` iff its current partitioning is narrower than
    ``min_partitions`` (default: the cluster's default parallelism).
    Checking the partition count inspects the physical plan without
    running a job."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
