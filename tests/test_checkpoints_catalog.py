"""StageStore catalog backend — the same writeTo/tableExists/read.table
code path production Iceberg uses, exercised through the V2 session
catalog (parquet CTAS), plus a true-Iceberg test that runs whenever the
runtime jar is on the classpath (absent in this sandbox → skipped)."""

import pytest
from pyspark.sql import functions as F

from kgnorm import job, synth
from kgnorm.checkpoints import StageStore


def _has_iceberg(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


@pytest.fixture()
def catalog_store(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS kgtest")
    yield StageStore(str(tmp_path / "unused"), catalog="spark_catalog.kgtest",
                     table_format="parquet")
    for t in spark.catalog.listTables("kgtest"):
        spark.sql(f"DROP TABLE IF EXISTS kgtest.{t.name}")
    spark.sql("DROP DATABASE IF EXISTS kgtest")


class TestCatalogStageStore:
    def test_roundtrip_and_exists(self, spark, catalog_store):
        df = spark.range(10).select(
            F.col("id"), (F.col("id") % 3).alias("k"))
        assert not catalog_store.exists("stage_a")
        catalog_store.write(df, "stage_a", partition_by=["k"])
        assert catalog_store.exists("stage_a")
        back = catalog_store.read(spark, "stage_a")
        assert sorted(r.id for r in back.collect()) == list(range(10))

    def test_get_or_compute_resumes(self, spark, catalog_store):
        calls = []

        def compute():
            calls.append(1)
            return spark.range(4).select(F.col("id"))

        a = catalog_store.get_or_compute(spark, "stage_b", compute)
        assert a.count() == 4 and len(calls) == 1
        b = catalog_store.get_or_compute(spark, "stage_b", compute)
        assert b.count() == 4 and len(calls) == 1  # read back, not recomputed
        c = catalog_store.get_or_compute(spark, "stage_b", compute, resume=False)
        assert c.count() == 4 and len(calls) == 2  # forced recompute

    def test_pipeline_resume_identical_on_catalog_backend(self, spark, catalog_store):
        transcripts = synth.golden_transcripts(spark)
        out1 = job.run_pipeline(spark, transcripts, store=catalog_store, resume=False)
        t1 = sorted((t.subj, t.pred, t.obj, t.assertion)
                    for t in out1["triples"].collect())
        out2 = job.run_pipeline(spark, transcripts, store=catalog_store, resume=True)
        t2 = sorted((t.subj, t.pred, t.obj, t.assertion)
                    for t in out2["triples"].collect())
        assert t1 == t2 and len(t1) > 0


def test_iceberg_backend_roundtrip(spark, tmp_path):
    """Runs only when the Iceberg runtime jar is present (production
    classpath); documents the exact production configuration."""
    if not _has_iceberg(spark):
        pytest.skip("no Iceberg runtime jar on the classpath in this sandbox")
    spark.conf.set("spark.sql.catalog.kgice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.kgice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.kgice.warehouse", str(tmp_path / "ice"))
    store = StageStore(str(tmp_path / "unused"), catalog="kgice.db")
    df = spark.range(10).select(F.col("id"), (F.col("id") % 3).alias("k"))
    store.write(df, "stage_ice", partition_by=["k"])
    assert store.exists("stage_ice")
    assert store.read(spark, "stage_ice").count() == 10
