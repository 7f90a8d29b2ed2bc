"""Table IO seam: Iceberg on a real cluster, parquet in the sandbox.

The reference checkpoints to loose files (GraphML/CSV/JSON — SURVEY.md
§2.1 S5-S8); here every stage boundary is a table.  ``TableIO`` hides the
format so the pipeline code is identical in both environments:

- **Iceberg** (``catalog`` set): ``df.writeTo(catalog.db.name)
  .createOrReplace()`` — snapshots give time travel and MERGE gives the
  incremental-union semantics (reference utils/graph.py:68-177) for free.
  The runtime jars are not in this sandbox, so this path is exercised on
  clusters via spark-submit --conf (see jobs/run_pipeline.py docstring).
- **Parquet directory** (default): ``{base}/{name}`` with
  overwrite-by-rewrite; partition columns preserved.

Writes are atomic-by-rename at the directory level (Spark's committer),
and `checkpoint.py` layers marker files + lineage manifests on top.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class TableIO:
    spark: SparkSession
    base: str
    catalog: str | None = None  # e.g. "local.kg" → Iceberg identifiers
    db: str = "kg"

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.db}.{name}"

    def path(self, name: str) -> str:
        return f"{self.base}/{name}"

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        if self.catalog:
            w = df.writeTo(self._ident(name)).using("iceberg")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.format("iceberg").load(self._ident(name))
        return self.spark.read.parquet(self.path(name))

    def exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(self._ident(name))
        # cheap filesystem probe via the JVM's hadoop FS (works for any
        # supported scheme: file://, hdfs://, s3a://)
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(self.path(name))
        return p.getFileSystem(conf).exists(p)
