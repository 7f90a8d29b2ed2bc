"""Checkpointed stage runner with per-partition lineage manifests.

North-rule requirement: "canonical nodes and deduplicated weighted edges
are materialized as partitioned tables with per-partition lineage
manifests and checkpointed stage boundaries so any stage resumes
idempotently at 10^12-turn scale".  Reference analogue: the ad-hoc file
checkpoints S2/S5-S8 (SURVEY.md §2.1), replaced by a uniform protocol:

For each stage ``name``:
1. if ``{base}/_manifests/{name}.json`` exists and the output table
   exists → SKIP, return ``io.read(name)`` (resume path);
2. else compute the DataFrame, write it via TableIO, then write the
   manifest LAST — the manifest is the commit marker, so a crash between
   table write and manifest write re-runs the stage (write-then-commit,
   idempotent because stage outputs are deterministic overwrites).

The manifest records lineage (input stage names + their manifest
fingerprints), row count, per-partition row counts (skew diagnosable
post-hoc), stage wall-clock and materialized files/bytes (per-stage cost
accounting), and an order-insensitive content fingerprint (xor of row
xxhash64) — cheap (one pass, map-side combinable) and stable across
shuffle order, so downstream runs can verify an upstream table hasn't
drifted without re-reading it.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .io import TableIO


def content_fingerprint(df: DataFrame) -> int:
    """Order-insensitive fingerprint: XOR of per-row xxhash64 over all
    columns (cast to string for type stability).  One narrow pass +
    map-side partial agg; XOR commutes, never overflows (ANSI-safe)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in df.columns]
    row = df.select(F.xxhash64(*cols).alias("h"))
    out = row.agg(F.expr("bit_xor(h)").alias("fp")).collect()[0].fp
    return int(out or 0)


def partition_profile(df: DataFrame) -> list[int]:
    """Rows per physical partition at write time (skew diagnostics)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [int(r["count"]) for r in rows]


class StageRunner:
    """Sequential checkpointed execution of named pipeline stages."""

    def __init__(self, io: TableIO, fingerprint: bool = True):
        self.io = io
        self.fingerprint = fingerprint
        self.computed: list[str] = []
        self.skipped: list[str] = []

    def _manifest_rel(self, name: str) -> str:
        # through the table Hadoop FS, so manifests live next to the data
        # on any scheme (file://, hdfs://, s3a://) — pathlib would mangle
        # URIs and strand them on the driver's local disk
        return f"_manifests/{name}.json"

    def manifest(self, name: str) -> dict | None:
        text = self.io.read_text(self._manifest_rel(name))
        return json.loads(text) if text is not None else None

    def is_done(self, name: str, inputs: list[str] | None = None) -> bool:
        """Manifest + table present AND recorded input fingerprints still
        match the current upstream manifests — so recomputing an upstream
        stage (changed input, selective --force) invalidates downstream
        checkpoints instead of silently serving stale outputs."""
        m = self.manifest(name)
        if m is None or not self.io.exists(name):
            return False
        stored = m.get("inputs", {})
        for i in inputs or []:
            cur = (self.manifest(i) or {}).get("fingerprint")
            if stored.get(i) != cur:
                return False
        return True

    def run(
        self,
        name: str,
        make: "callable[[], DataFrame]",
        inputs: list[str] | None = None,
        partition_by: list[str] | None = None,
        bucket_by: list[str] | None = None,
        n_buckets: int = 64,
    ) -> DataFrame:
        t0 = time.time()
        if self.is_done(name, inputs):
            self.skipped.append(name)
            m = self.manifest(name) or {}
            if m.get("bucket_by"):
                # fresh-session resume: re-register the bucket spec so
                # downstream equi-joins on the bucket key stay
                # exchange-free (the in-memory catalog forgot it)
                self.io.ensure_bucketed(
                    name, m["schema_json"], m["bucket_by"], m["n_buckets"]
                )
                return self.io.read_bucketed(name)
            return self.io.read(name)
        df = make()
        if bucket_by:
            self.io.write_bucketed(df, name, bucket_by, n_buckets=n_buckets)
            out = self.io.read_bucketed(name)
        else:
            self.io.write(df, name, partition_by=partition_by)
            out = self.io.read(name)
        manifest = {
            "stage": name,
            "rows": out.count(),
            "partition_rows": partition_profile(out),
            "inputs": {
                i: (self.manifest(i) or {}).get("fingerprint") for i in (inputs or [])
            },
            "fingerprint": content_fingerprint(out) if self.fingerprint else None,
            "schema": out.schema.simpleString(),
            "schema_json": out.schema.json(),
            "bucket_by": bucket_by,
            "n_buckets": n_buckets if bucket_by else None,
            # stage metrics: compute+write+count wall clock and the
            # materialized footprint (skew + cost accounting per stage)
            "wall_s": round(time.time() - t0, 3),
            **self.io.table_stats(name),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self.io.write_text(self._manifest_rel(name), json.dumps(manifest, indent=1))
        self.computed.append(name)
        return out
