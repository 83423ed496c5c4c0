"""Enrichment processors: user_agent, geoip, trace-group fill.

These are the reference's dimension-lookup family (SURVEY.md §2.5/§2.7):
broadcast joins or pure column expressions — never a per-row service call.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ------------------------------------------------------------- user_agent
#
# The reference wraps uap-java's CachingParser
# (user-agent-processor/.../UserAgentProcessor.java:29,43-60) → struct
# {name, version, os, device}.  The full uap regex database isn't in this
# container; this is a deterministic regex-lite parser covering the major
# families, implemented as pure Catalyst expressions (codegen, no UDF).
# A production deployment would swap the pattern table for uap-core's —
# the extraction topology (ordered rlike→extract chain) is the same.

_UA_BROWSERS = [
    # crawlers first — their UAs often embed browser tokens (smartphone
    # Googlebot carries "Chrome/")
    ("Googlebot/([\\d.]+)", "Googlebot"),
    ("bingbot/([\\d.]+)", "bingbot"),
    ("DuckDuckBot[-/]([\\d.]+)", "DuckDuckBot"),
    ("YandexBot/([\\d.]+)", "YandexBot"),
    # branded chromium shells before Chrome (their UAs carry "Chrome/")
    ("Edg[A]?/([\\d.]+)", "Edge"),
    ("OPR/([\\d.]+)", "Opera"),
    ("SamsungBrowser/([\\d.]+)", "Samsung Internet"),
    ("YaBrowser/([\\d.]+)", "Yandex Browser"),
    ("UCBrowser/([\\d.]+)", "UC Browser"),
    ("Vivaldi/([\\d.]+)", "Vivaldi"),
    ("Brave/([\\d.]+)", "Brave"),
    ("Chrome/([\\d.]+)", "Chrome"),
    ("Firefox/([\\d.]+)", "Firefox"),
    ("FxiOS/([\\d.]+)", "Firefox iOS"),
    ("CriOS/([\\d.]+)", "Chrome iOS"),
    ("Version/([\\d.]+).*Safari", "Safari"),
    ("MSIE ([\\d.]+)", "IE"),
    ("Trident/.*rv:([\\d.]+)", "IE"),
    ("curl/([\\d.]+)", "curl"),
    ("[Ww]get/([\\d.]+)", "wget"),
    ("python-requests/([\\d.]+)", "python-requests"),
    ("okhttp/([\\d.]+)", "okhttp"),
]
_UA_OS = [
    ("Windows NT 10", "Windows 10"),
    ("Windows NT 6\\.3", "Windows 8.1"),
    ("Windows NT 6\\.2", "Windows 8"),
    ("Windows NT 6\\.1", "Windows 7"),
    ("Windows NT", "Windows"),
    ("CrOS", "Chrome OS"),
    ("Android", "Android"),
    ("iPhone OS|iOS|iPad", "iOS"),
    ("Mac OS X", "Mac OS X"),
    ("FreeBSD", "FreeBSD"),
    ("Linux", "Linux"),
]
_UA_DEVICE = [
    ("[Bb]ot|[Cc]rawler|[Ss]pider", "Spider"),
    ("iPhone", "iPhone"),
    ("iPad", "iPad"),
    ("Android.*Mobile", "Android Phone"),
    ("Android", "Android Tablet"),
    ("Windows|Macintosh|CrOS|Linux", "Desktop"),
]


def _chain(src: Column, table: list[tuple[str, str]], default: str) -> Column:
    c = None
    for pat, name in table:
        cond = src.rlike(pat)
        c = F.when(cond, name) if c is None else c.when(cond, name)
    return c.otherwise(default) if c is not None else F.lit(default)


def user_agent(df: DataFrame, source: str, target: str = "user_agent") -> DataFrame:
    """Parse a UA string column into a struct {name, version, os, device}.
    First-match-wins ordered pattern chains (Edge before Chrome, etc.),
    all inside whole-stage codegen."""
    src = F.col(source)
    version = None
    for pat, _ in _UA_BROWSERS:
        e = F.regexp_extract(src, pat, 1)
        cond = src.rlike(pat)
        version = F.when(cond, e) if version is None else version.when(cond, e)
    version = version.otherwise(F.lit(""))
    struct = F.struct(
        _chain(src, _UA_BROWSERS, "Other").alias("name"),
        version.alias("version"),
        _chain(src, _UA_OS, "Other").alias("os"),
        _chain(src, _UA_DEVICE, "Other").alias("device"),
    )
    return df.withColumn(target, struct)


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
