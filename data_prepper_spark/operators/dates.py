"""`date` processor equivalent (reference: date-processor).

DateProcessor.java:31,61-84 tries each configured pattern in order until
one parses, then formats to ISO-8601 `yyyy-MM-dd'T'HH:mm:ss.SSSXXX`
(DateProcessor.java:34) at `destination` (default `@timestamp`).
Spark-side: coalesce over to_timestamp candidates — codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def _pattern_has_zone(pattern: str) -> bool:
    """True if the datetime pattern carries zone/offset directives
    (X x Z z O V) outside quoted literal sections."""
    in_quote = False
    for ch in pattern:
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote and ch in "XxZzOV":
            return True
    return False


def parse_multi(
    col: Column, patterns: list[str], source_timezone: str | None = None
) -> Column:
    """First-match-wins multi-pattern timestamp parse (try_to_timestamp
    keeps failures null instead of erroring, matching the reference's
    tags_on_failure flow).  `source_timezone` applies ONLY to candidates
    whose pattern has no zone directive (DateProcessor.java:93-110 builds
    the formatter with zoneId only when the pattern lacks zone info) —
    zone-carrying patterns already normalize themselves."""
    cands = []
    for p in patterns:
        c = F.try_to_timestamp(col, F.lit(p))
        if source_timezone is not None and not _pattern_has_zone(p):
            c = F.to_utc_timestamp(c, source_timezone)
        cands.append(c)
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
    `source_timezone` (DateProcessor.java:93-110 zoneId): candidates
    whose pattern has no zone directive are interpreted in that zone and
    normalized to UTC; zone-carrying patterns are left alone (no double
    shift)."""
    ts = parse_multi(F.col(match_key), patterns, source_timezone)
    out = df.withColumn(destination, F.date_format(ts, ISO_FMT))
    if to_origination_metadata:
        out = out.withColumn("_origination_ts", ts)
    return out


def from_time_received(df: DataFrame, destination: str = "@timestamp") -> DataFrame:
    """`from_time_received` mode — our `_ingest_ts` column is the
    EventMetadata.timeReceived equivalent (SURVEY.md §1.1)."""
    return df.withColumn(destination, F.date_format(F.col("_ingest_ts"), ISO_FMT))
