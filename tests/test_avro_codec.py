"""Avro container codec tests (avro-codecs/.../AvroInputCodec.java:38,
AvroOutputCodec.java:34) — pure-python format layer + the distributed
read/write paths."""

import os

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.sources.avro_codec import (
    avro_to_spark_schema,
    read_avro_bytes,
    read_avro_py,
    spark_to_avro_schema,
    write_avro,
    write_avro_bytes,
    write_avro_file,
)

SCHEMA = {
    "type": "record",
    "name": "ev",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "raw", "type": ["null", "bytes"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "kind",
         "type": {"type": "enum", "name": "k", "symbols": ["A", "B"]}},
        {"name": "nested", "type": ["null", {
            "type": "record", "name": "sub", "fields": [
                {"name": "x", "type": "int"},
                {"name": "y", "type": ["null", "float"]}]}]},
    ],
}

RECS = [
    {"id": 1, "name": "alpha", "score": 1.5, "flag": True,
     "raw": b"\x00\xff", "tags": ["a", "b"], "attrs": {"k1": 7},
     "kind": "A", "nested": {"x": 3, "y": 2.25}},
    {"id": -(2 ** 62), "name": None, "score": -0.0, "flag": False,
     "raw": None, "tags": [], "attrs": {}, "kind": "B", "nested": None},
    {"id": 0, "name": "πλ", "score": 3.14, "flag": True,
     "raw": b"", "tags": ["x"] * 5, "attrs": {"a": 1, "b": -2},
     "kind": "A", "nested": {"x": -1, "y": None}},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    buf = write_avro_bytes(RECS, SCHEMA, codec=codec, block_records=2)
    schema, back = read_avro_bytes(buf)
    assert schema == SCHEMA
    assert back == RECS


def test_deterministic_bytes():
    assert write_avro_bytes(RECS, SCHEMA) == write_avro_bytes(RECS, SCHEMA)


def test_bad_magic_and_corrupt_sync():
    with pytest.raises(ValueError, match="magic"):
        read_avro_bytes(b"PAR1" + b"\x00" * 64)
    buf = bytearray(write_avro_bytes(RECS, SCHEMA))
    buf[-1] ^= 0xFF  # flip a trailing sync byte
    with pytest.raises(ValueError, match="sync"):
        read_avro_bytes(bytes(buf))


def test_schema_mapping_both_ways(spark):
    st = avro_to_spark_schema(SCHEMA)
    assert st["id"].dataType.simpleString() == "bigint"
    assert st["tags"].dataType.simpleString() == "array<string>"
    assert st["nested"].dataType.simpleString() == "struct<x:int,y:float>"
    df = spark.range(1).select(
        F.col("id"),
        F.lit("s").alias("name"),
        F.array(F.lit(1.0)).alias("arr"),
    )
    avro = spark_to_avro_schema(df.schema)
    types = {f["name"]: f["type"] for f in avro["fields"]}
    assert types["id"] == ["null", "long"]
    assert types["arr"] == ["null", {"type": "array", "items": "double"}]


def test_distributed_roundtrip(spark, workdir):
    src = spark.range(0, 500).select(
        F.col("id"),
        F.when(F.col("id") % 5 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("n"), F.col("id")))
        .alias("name"),
        (F.col("id") * 1.5).alias("score"),
        F.array(F.lit("t"), F.col("id").cast("string")).alias("tags"),
    ).repartition(4)
    d = os.path.join(workdir, "avro_out")
    write_avro(src, d, codec="deflate")
    parts = [f for f in os.listdir(d) if f.endswith(".avro")]
    assert len(parts) == 4  # one container file per partition
    back = read_avro_py(spark, d)
    assert back.count() == 500
    got = {r["id"]: r for r in back.collect()}
    assert got[10]["name"] is None
    assert got[7]["name"] == "n7"
    assert got[7]["score"] == 10.5
    assert list(got[7]["tags"]) == ["t", "7"]


def test_reader_file_fixture(spark, workdir):
    p = os.path.join(workdir, "one.avro")
    write_avro_file(RECS, SCHEMA, p, codec="deflate")
    df = read_avro_py(spark, p)
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == sorted(r["id"] for r in RECS)
    by_id = {r["id"]: r for r in rows}
    assert by_id[1]["nested"]["x"] == 3
    assert bytes(by_id[1]["raw"]) == b"\x00\xff"
    assert by_id[0]["attrs"]["b"] == -2


def test_overwrite_clears_stale_parts(spark, workdir):
    """mode='overwrite' contract: a re-run producing fewer partitions must
    not leave stale part-*.avro behind (ADVICE r4)."""
    d = os.path.join(workdir, "avro_over")
    write_avro(spark.range(0, 100).repartition(8), d)
    assert len([f for f in os.listdir(d) if f.endswith(".avro")]) == 8
    write_avro(spark.range(0, 10).repartition(2), d)
    assert len([f for f in os.listdir(d) if f.endswith(".avro")]) == 2
    assert read_avro_py(spark, d).count() == 10


def test_null_array_elements_and_map_values(spark, workdir):
    """Spark containsNull/valueContainsNull default True — schema derivation
    must emit nullable-union items so null elements encode (ADVICE r4)."""
    src = spark.range(0, 20).select(
        F.col("id"),
        F.array(
            F.lit("a"),
            F.when(F.col("id") % 2 == 0, F.lit(None)).otherwise(F.lit("b")),
        ).alias("tags"),
        F.create_map(
            F.lit("k"),
            F.when(F.col("id") % 3 == 0, F.lit(None)).otherwise(F.col("id")),
        ).alias("attrs"),
    ).repartition(2)
    av = spark_to_avro_schema(src.schema)
    tags_t = next(f for f in av["fields"] if f["name"] == "tags")["type"][1]
    assert tags_t["items"] == ["null", "string"]
    d = os.path.join(workdir, "avro_nulls")
    write_avro(src, d)
    got = {r["id"]: r for r in read_avro_py(spark, d).collect()}
    assert list(got[2]["tags"]) == ["a", None]
    assert list(got[1]["tags"]) == ["a", "b"]
    assert got[3]["attrs"]["k"] is None
    assert got[4]["attrs"]["k"] == 4
