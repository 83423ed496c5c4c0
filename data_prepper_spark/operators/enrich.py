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

    Real mode needs the geoip2 library + an .mmdb file (absent in this
    container): the production wiring is `SparkFiles.get(mmdb)` broadcast
    + a pandas UDF holding one open Reader per executor.  Offline mode
    (mmdb_path=None) attaches a deterministic RFC-1918/class-based fake
    so pipelines are testable end-to-end."""
    if mmdb_path is not None:
        try:
            import geoip2.database  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "geoip real mode requires the geoip2 package (absent); "
                "use mmdb_path=None for the deterministic offline stub"
            ) from e
        raise NotImplementedError("mmdb wiring pending library availability")
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
