"""Table-format layer: parquet fallback is layout-identical, the Iceberg
path is gated with a clear error when the runtime jar is absent."""

import os

import pytest
from pyspark.sql import functions as F

from data_prepper_spark import tables
from data_prepper_spark.index.build import build_oneshot_text
from data_prepper_spark.index.config import IndexConfig

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built_index(spark, workdir):
    d = os.path.join(workdir, "tbl_idx")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    build_oneshot_text(spark, docs, d, IndexConfig(range_bits=1, block_size=64, n_buckets=4))
    return d


def test_probe_and_resolve(spark):
    # this container ships no iceberg jar
    assert tables.iceberg_available(spark) is False
    assert tables.resolve_format(spark, "auto") == "parquet"
    assert tables.resolve_format(spark, "parquet") == "parquet"
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        tables.resolve_format(spark, "iceberg")
    with pytest.raises(ValueError):
        tables.resolve_format(spark, "delta")


def test_publish_parquet_layout(spark, workdir, built_index):
    dest = os.path.join(workdir, "published")
    out = tables.publish_index(spark, built_index, dest, fmt="auto")
    assert set(out) == set(tables.INDEX_TABLES)
    # partition layout preserved: hive dirs on term_bucket
    assert any(
        e.startswith("term_bucket=") for e in os.listdir(os.path.join(dest, "postings"))
    )
    # published postings identical to source (same rows per bucket)
    src = spark.read.parquet(os.path.join(built_index, "postings"))
    pub = spark.read.parquet(os.path.join(dest, "postings"))
    a = {r["term_bucket"]: r["n"] for r in src.groupBy("term_bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    b = {r["term_bucket"]: r["n"] for r in pub.groupBy("term_bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert a == b
    # partition pruning still works on the published table
    plan = pub.filter(F.col("term_bucket") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "term_bucket" in plan


def test_iceberg_builder_config():
    from pyspark.sql import SparkSession

    b = tables.iceberg_builder_config(SparkSession.builder, "dps", "/tmp/wh")
    opts = b._options
    assert opts["spark.sql.catalog.dps"] == "org.apache.iceberg.spark.SparkCatalog"
    assert opts["spark.sql.catalog.dps.warehouse"] == "/tmp/wh"
