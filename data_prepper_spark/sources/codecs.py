"""Input/output codecs (reference: §2.2).

| reference codec | here |
|---|---|
| newline (NewlineDelimitedInputCodec.java:27,56-80: skip_lines,
  header_destination) | read_newline |
| json array (JsonInputCodec.java:30) | read_json_array |
| ndjson (NdjsonOutputCodec.java:22) | read_ndjson / write_ndjson |
| csv in/out (CsvInputCodec.java:37) | read_csv |
| parquet (ParquetInputCodec.java:36) | read_parquet / write_parquet |
| avro (AvroInputCodec.java:38, AvroOutputCodec.java:34) | read_avro /
  write_avro — spark-avro when the package is on the classpath, else a
  pure-python container-format codec (avro_codec.py) |
| compression auto-detect (S3ObjectWorker.java:89-96) | built into
  Spark's readers (.gz etc. by extension) |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def read_newline(
    spark: SparkSession,
    path: str,
    skip_lines: int = 0,
    header_destination: str | None = None,
) -> DataFrame:
    """newline codec: each line → {message}; optional skip of leading
    lines and capture of each file's first post-skip line as a header
    column.

    The reference's skip/header semantics are PER OBJECT
    (NewlineDelimitedInputCodec.java:27,56-80 parses one S3 object's
    stream), so line numbering here is per input FILE: window partitioned
    by input_file_name() — each file sorts independently (bounded by the
    largest single file), never a global single-partition sort.  The
    header is joined back per file (tiny broadcast side: one row per
    file).  Caveat: in-file line order relies on the file fitting one
    split (spark.sql.files.maxPartitionBytes); raise it for bigger files
    when using skip/header — the skip-less default path has no ordering
    dependency at all."""
    df = spark.read.text(path).withColumnRenamed("value", "message")
    if skip_lines == 0 and header_destination is None:
        return df
    df = (
        df.withColumn("_file", F.input_file_name())
        .withColumn("_ln", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("_file").orderBy("_ln")
    df = df.withColumn("_rn", F.row_number().over(w) - 1)
    if header_destination is not None:
        headers = (
            df.filter(F.col("_rn") == skip_lines)
            .select("_file", F.col("message").alias(header_destination))
        )
        df = df.filter(F.col("_rn") > skip_lines).join(headers, "_file", "left")
    else:
        df = df.filter(F.col("_rn") >= skip_lines)
    return df.drop("_file", "_ln", "_rn")


def read_json_array(spark: SparkSession, path: str) -> DataFrame:
    """json codec: file is a top-level JSON array → one row per element."""
    return spark.read.option("multiLine", "true").json(path)


def read_ndjson(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    quote: str = '"',
    column_names: list[str] | None = None,
) -> DataFrame:
    df = spark.read.csv(path, header=header, sep=delimiter, quote=quote)
    if column_names is not None:
        df = df.toDF(*column_names)
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """avro codec (AvroInputCodec.java:38): spark-avro when the package
    is on the classpath (fastest, splittable); otherwise the pure-python
    container-format decoder (sources/avro_codec.py) over a binaryFile
    scan — one task per file, no jar dependency."""
    try:
        return spark.read.format("avro").load(path)
    except Exception:  # AnalysisException: Failed to find data source
        from . import avro_codec

        return avro_codec.read_avro_py(spark, path)


def write_avro(df: DataFrame, path: str, codec: str = "null") -> None:
    """avro output codec (AvroOutputCodec.java:34): schema derived from
    the frame exactly as the reference derives it from the event map
    (AvroOutputCodec.java:86 — every field a nullable union); one
    container file per partition."""
    from . import avro_codec

    avro_codec.write_avro(df, path, codec=codec)


def write_ndjson(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """ndjson out; optional codec (gzip/bzip2/...) — the s3 sink's
    compression option (S3SinkConfig buffer_type/compression); readers
    auto-detect by extension (S3ObjectWorker.java:89-96)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    delimiter: str = ",",
    quote: str = '"',
    compression: str | None = None,
) -> None:
    """csv out (csv-processor CsvOutputCodec.java:27): header row per
    file part, configurable delimiter/quote, optional compression —
    Spark's distributed csv writer, one file per partition (the sink's
    threshold-split analog)."""
    w = (
        df.write.mode(mode)
        .option("header", header)
        .option("sep", delimiter)
        .option("quote", quote)
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """parquet out with the s3-sink's threshold analog: file size control
    via maxRecordsPerFile (ThresholdCheck.java:14 event_count)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)
