"""Enrichment processors: user_agent, geoip, trace-group fill.

These are the reference's dimension-lookup family (SURVEY.md §2.5/§2.7):
broadcast joins or pure column expressions — never a per-row service call.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ------------------------------------------------------------- user_agent
#
# uap-core-semantics engine in operators/uap.py (the reference wraps
# uap-java's CachingParser over the public ua-parser/uap-core database —
# UserAgentProcessor.java:29,43-60).  Re-exported here as the processor
# entry point.

from .uap import parse_user_agent  # noqa: E402


def user_agent(
    df: DataFrame,
    source: str,
    target: str = "user_agent",
    exclude_original: bool = False,
    dedupe: bool = True,
) -> DataFrame:
    """`user_agent` processor: uap-core rule semantics compiled to a
    Catalyst CASE-WHEN chain → the reference's output struct
    {name, version, os{name, version, full}, device{name}[, original]}
    (UserAgentProcessor.getParsedUserAgent :85-118).

    ``dedupe=True`` is the Spark recast of the reference's
    CachingParser (:40 — memoize repeated UA strings): the ~50-regex
    rule chain runs once per DISTINCT UA string, and the results join
    back null-safely.  Real-world UA cardinality is tiny relative to row
    count, so AQE converts the join to a broadcast at runtime — per-row
    cost collapses from ~50 regex evaluations to one hash probe.  Set
    False to evaluate the chain per row (no shuffle at all)."""
    if not dedupe:
        return parse_user_agent(df, source, target, exclude_original=exclude_original)
    uas = df.select(F.col(source)).distinct()
    parsed = parse_user_agent(
        uas, source, target, exclude_original=exclude_original
    ).withColumnRenamed(source, "_ua_key")
    out = df.join(
        parsed, F.col(source).eqNullSafe(F.col("_ua_key")), "left"
    ).drop("_ua_key")
    return out


# ----------------------------------------------------------------- geoip

def geoip(
    df: DataFrame,
    source: str,
    target: str = "geo",
    mmdb_path: str | None = None,
) -> DataFrame:
    """`geoip` (GeoIPProcessor.java:34,71-92) — MaxMind lookup.

    Real mode (mmdb_path=...): the db bytes ship in the task closure
    (GeoLite2-City is ~60 MB — broadcast-sized, the reference holds one
    open Reader per worker the same way) and every batch resolves
    through the pure-python MMDB reader (sources/mmdb.py — the file
    format is public; no geoip2 dependency), Arrow-batched via
    mapInPandas.  Emits a `target` struct with the processor's standard
    fields: country_iso_code, country_name, city_name, latitude,
    longitude, time_zone (NULLs for unresolved IPs).

    Offline mode (mmdb_path=None) attaches a deterministic
    RFC-1918/class-based fake so pipelines are testable end-to-end
    without any database file."""
    if mmdb_path is not None:
        from typing import Iterator

        import pandas as pd
        from pyspark.sql.types import (
            DoubleType, StringType, StructField, StructType,
        )

        from ..sources.mmdb import MMDBReader

        with open(mmdb_path, "rb") as f:
            db_bytes = f.read()
        geo_fields = [
            StructField("country_iso_code", StringType()),
            StructField("country_name", StringType()),
            StructField("city_name", StringType()),
            StructField("latitude", DoubleType()),
            StructField("longitude", DoubleType()),
            StructField("time_zone", StringType()),
        ]
        # fresh StructType — .add() would mutate the frame's cached schema
        out_schema = StructType(
            list(df.schema.fields)
            + [StructField(target, StructType(geo_fields))]
        )

        def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            reader = MMDBReader(db_bytes)  # one reader per task
            cache: dict[str, tuple] = {}

            def one(ip):
                if ip is None:
                    return (None,) * 6
                hit = cache.get(ip)
                if hit is None:
                    try:
                        rec = reader.lookup(ip) or {}
                    except ValueError:
                        rec = {}
                    loc = rec.get("location", {})
                    hit = (
                        rec.get("country", {}).get("iso_code"),
                        rec.get("country", {}).get("names", {}).get("en"),
                        rec.get("city", {}).get("names", {}).get("en"),
                        loc.get("latitude"),
                        loc.get("longitude"),
                        loc.get("time_zone"),
                    )
                    cache[ip] = hit
                return hit

            for pdf in batches:
                # assign the tuple list directly: preserves None (no
                # NaN coercion through a mixed-dtype frame) and works on
                # empty batches, where DataFrame.apply would return a
                # DataFrame and the column assignment would raise.
                pdf[target] = pd.Series(
                    [one(ip) for ip in pdf[source]],
                    index=pdf.index, dtype=object,
                )
                yield pdf

        return df.mapInPandas(enrich, schema=out_schema)
    ip = F.col(source)
    first = F.split(ip, r"\.").getItem(0).cast("int")
    country = (
        F.when(ip.rlike(r"^10\.|^192\.168\.|^172\.(1[6-9]|2\d|3[01])\."), "private")
        .when(first < 64, "US")
        .when(first < 128, "EU")
        .when(first < 192, "APAC")
        .otherwise("other")
    )
    return df.withColumn(
        target,
        F.struct(country.alias("country"), first.alias("octet0")),
    )


# ------------------------------------------------------- trace-group fill

def trace_group_fill(
    spans: DataFrame,
    trace_col: str = "traceId",
    parent_col: str = "parentSpanId",
    name_col: str = "name",
    group_col: str = "traceGroup",
) -> DataFrame:
    """`otel_traces` traceGroup semantics (OTelTraceRawProcessor.java:
    126-144): every span inherits the trace's ROOT span name as its
    traceGroup.  The reference parks late children in a Guava cache and
    flushes on a timer; batch Spark is a broadcast-or-shuffled self-join
    of roots onto the trace (roots are ~1/trace — tiny side, broadcast)."""
    roots = spans.filter(F.col(parent_col).isNull()).select(
        F.col(trace_col).alias("_tg_trace"), F.col(name_col).alias("_tg_name")
    )
    out = spans.join(
        F.broadcast(roots), spans[trace_col] == F.col("_tg_trace"), "left"
    )
    return out.withColumn(group_col, F.col("_tg_name")).drop("_tg_trace", "_tg_name")
