"""Per-stage checkpointing and resume.

The reference resumes work at document granularity via job-status rows
(documents.status, jobs/document_processing.py:113-118, 269-310).  The
Spark build checkpoints at STAGE granularity: each stage's output is
written to a table; on resume, stages whose outputs already exist and
are complete are read back instead of recomputed.  Deterministic IDs
(kgnorm.graph) make a resumed run byte-identical to a fresh one.

Storage: Iceberg when a catalog is configured (production —
``writeTo(...).createOrReplace()`` gives atomic commits + snapshots);
otherwise plain parquet directories where completeness = Spark's
``_SUCCESS`` marker.  The sandbox has no Iceberg runtime jar, so parquet
is the tested path; the Iceberg branch is the same two calls via the
table catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class StageStore:
    """Directory-backed stage table store with existence-based resume."""

    def __init__(self, base_dir: str, catalog: str | None = None) -> None:
        self.base_dir = base_dir
        self.catalog = catalog  # e.g. "kg" → Iceberg tables kg.<stage>

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def exists(self, name: str) -> bool:
        if self.catalog:
            spark = SparkSession.getActiveSession()
            return spark is not None and spark.catalog.tableExists(f"{self.catalog}.{name}")
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        if self.catalog:
            writer = df.writeTo(f"{self.catalog}.{name}").using("iceberg")
            if partition_by:
                from pyspark.sql.functions import col
                writer = writer.partitionedBy(*[col(c) for c in partition_by])
            writer.createOrReplace()
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if self.catalog:
            return spark.read.table(f"{self.catalog}.{name}")
        return spark.read.parquet(self._path(name))

    def get_or_compute(
        self,
        spark: SparkSession,
        name: str,
        compute,
        resume: bool = True,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Return the checkpointed stage, computing+writing it if missing.

        ``compute`` is a zero-arg callable returning the stage DataFrame.
        With ``resume=False`` the stage always recomputes (overwrite).
        """
        if resume and self.exists(name):
            return self.read(spark, name)
        df = compute()
        self.write(df, name, partition_by=partition_by)
        return self.read(spark, name)
