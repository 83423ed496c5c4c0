"""`date` processor equivalent (reference: date-processor).

DateProcessor.java:31,61-84 tries each configured pattern in order until
one parses, then formats to ISO-8601 `yyyy-MM-dd'T'HH:mm:ss.SSSXXX`
(DateProcessor.java:34) at `destination` (default `@timestamp`).
Spark-side: coalesce over to_timestamp candidates — codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def parse_multi(col: Column, patterns: list[str]) -> Column:
    """First-match-wins multi-pattern timestamp parse (try_to_timestamp
    keeps failures null instead of erroring, matching the reference's
    tags_on_failure flow)."""
    cands = [F.try_to_timestamp(col, F.lit(p)) for p in patterns]
    return F.coalesce(*cands) if len(cands) > 1 else cands[0]


def date_processor(
    df: DataFrame,
    match_key: str,
    patterns: list[str],
    destination: str = "@timestamp",
    to_origination_metadata: bool = False,
    source_timezone: str | None = None,
) -> DataFrame:
    """Parse `match_key` with candidate `patterns` → ISO string at
    `destination`; unparseable rows get null (the reference tags them).
    `source_timezone` (DateProcessor.java:93-110 zoneId): timestamps with
    no zone in the pattern are interpreted in that zone and normalized
    to UTC (to_utc_timestamp) before formatting."""
    ts = parse_multi(F.col(match_key), patterns)
    if source_timezone is not None:
        ts = F.to_utc_timestamp(ts, source_timezone)
    out = df.withColumn(destination, F.date_format(ts, ISO_FMT))
    if to_origination_metadata:
        out = out.withColumn("_origination_ts", ts)
    return out


def from_time_received(df: DataFrame, destination: str = "@timestamp") -> DataFrame:
    """`from_time_received` mode — our `_ingest_ts` column is the
    EventMetadata.timeReceived equivalent (SURVEY.md §1.1)."""
    return df.withColumn(destination, F.date_format(F.col("_ingest_ts"), ISO_FMT))
