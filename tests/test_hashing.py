import pytest
from pyspark.sql import functions as F

from data_prepper_spark.hashing import pmod, xxh64, xxh64_signed


def test_public_vectors():
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999


def test_matches_spark_xxhash64(spark):
    vals = [
        "", "a", "abc", "hello world",
        "https://site7.example/news/1234",
        "x" * 31, "y" * 32, "z" * 100, "w" * 33,
        "üñïçødé ✓", "the", "zanzibar",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", F.xxhash64("s").alias("h"), F.pmod(F.xxhash64("s"), F.lit(16)).alias("b")
    )
    for r in df.collect():
        assert xxh64_signed(r["s"]) == r["h"], r["s"]
        assert pmod(xxh64_signed(r["s"]), 16) == r["b"], r["s"]
