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
post-hoc), and an order-insensitive content fingerprint (sum of row
xxhash64) — cheap (one pass, map-side combinable) and stable across
shuffle order, so downstream runs can verify an upstream table hasn't
drifted without re-reading it.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

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
        self._manifest_dir = Path(io.base) / "_manifests"
        self._manifest_dir.mkdir(parents=True, exist_ok=True)
        self.computed: list[str] = []
        self.skipped: list[str] = []

    def _manifest_path(self, name: str) -> Path:
        return self._manifest_dir / f"{name}.json"

    def manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        return json.loads(p.read_text()) if p.exists() else None

    def is_done(self, name: str) -> bool:
        return self._manifest_path(name).exists() and self.io.exists(name)

    def run(
        self,
        name: str,
        make: "callable[[], DataFrame]",
        inputs: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        if self.is_done(name):
            self.skipped.append(name)
            return self.io.read(name)
        df = make()
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
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._manifest_path(name).write_text(json.dumps(manifest, indent=1))
        self.computed.append(name)
        return out
