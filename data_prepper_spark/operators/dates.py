"""`date` processor equivalent (reference: date-processor).

DateProcessor.java:31,61-84 tries each configured pattern in order until
one parses, then formats to ISO-8601 `yyyy-MM-dd'T'HH:mm:ss.SSSXXX`
(DateProcessor.java:34) at `destination` (default `@timestamp`).
Spark-side: coalesce over to_timestamp candidates — codegen, no UDF.
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import Column, DataFrame, functions as F

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"

# Month-name vocabulary for `source_locale` (DateProcessor.java:113 builds
# the formatter with getSourceLocale()).  Spark's to_timestamp has no
# locale knob, so localized month names are translated to the English
# forms JVM-side (regexp_replace chain, compiled once) before parsing.
# Names are the standard public CLDR month names/abbreviations — shared
# vocabulary, same move as the grok pattern library.
_MONTHS_FULL: dict[str, list[str]] = {
    "fr": ["janvier", "février", "mars", "avril", "mai", "juin", "juillet",
           "août", "septembre", "octobre", "novembre", "décembre"],
    "de": ["Januar", "Februar", "März", "April", "Mai", "Juni", "Juli",
           "August", "September", "Oktober", "November", "Dezember"],
    "es": ["enero", "febrero", "marzo", "abril", "mayo", "junio", "julio",
           "agosto", "septiembre", "octubre", "noviembre", "diciembre"],
    "it": ["gennaio", "febbraio", "marzo", "aprile", "maggio", "giugno",
           "luglio", "agosto", "settembre", "ottobre", "novembre", "dicembre"],
    "pt": ["janeiro", "fevereiro", "março", "abril", "maio", "junho", "julho",
           "agosto", "setembro", "outubro", "novembro", "dezembro"],
    "nl": ["januari", "februari", "maart", "april", "mei", "juni", "juli",
           "augustus", "september", "oktober", "november", "december"],
}
_MONTHS_ABBR: dict[str, list[str]] = {
    "fr": ["janv.", "févr.", "mars", "avr.", "mai", "juin", "juil.",
           "août", "sept.", "oct.", "nov.", "déc."],
    "de": ["Jan.", "Feb.", "März", "Apr.", "Mai", "Juni", "Juli",
           "Aug.", "Sept.", "Okt.", "Nov.", "Dez."],
    "es": ["ene.", "feb.", "mar.", "abr.", "may.", "jun.", "jul.",
           "ago.", "sept.", "oct.", "nov.", "dic."],
    "it": ["gen.", "feb.", "mar.", "apr.", "mag.", "giu.", "lug.",
           "ago.", "set.", "ott.", "nov.", "dic."],
    "pt": ["jan.", "fev.", "mar.", "abr.", "mai.", "jun.", "jul.",
           "ago.", "set.", "out.", "nov.", "dez."],
    "nl": ["jan.", "feb.", "mrt.", "apr.", "mei", "jun.", "jul.",
           "aug.", "sep.", "okt.", "nov.", "dec."],
}
_MONTHS_EN_FULL = ["January", "February", "March", "April", "May", "June",
                   "July", "August", "September", "October", "November",
                   "December"]
_MONTHS_EN_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
                   "Sep", "Oct", "Nov", "Dec"]


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


def _pattern_fields(pattern: str) -> set[str]:
    """Pattern letters used outside quoted literal sections."""
    fields: set[str] = set()
    in_quote = False
    for ch in pattern:
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote and ch.isalpha():
            fields.add(ch)
    return fields


def _localize_to_english(col: Column, locale: str, want_full: bool) -> Column:
    """Translate a locale's CLDR month names/abbreviations to the English
    form the pattern expects (MMMM → full, MMM → abbreviated — strict
    java.time patterns reject the other form) — one regexp_replace chain,
    compiled at plan time, zero per-row Python.  Lookarounds keep a
    replacement from re-matching inside an already-produced English name."""
    lang = locale.split("-")[0].split("_")[0].lower()
    if lang in ("en", ""):
        return col
    if lang not in _MONTHS_FULL:
        raise ValueError(
            f"date: source_locale {locale!r} not in the built-in vocabulary "
            f"({sorted(_MONTHS_FULL)})"
        )
    targets = _MONTHS_EN_FULL if want_full else _MONTHS_EN_ABBR
    pairs = [(n, targets[i]) for i, n in enumerate(_MONTHS_FULL[lang])]
    pairs += [(n, targets[i]) for i, n in enumerate(_MONTHS_ABBR[lang])]
    # longest localized form first so 'janvier' wins over 'janv.'
    seen = set()
    for name, target in sorted(pairs, key=lambda p: -len(p[0])):
        if name in seen:
            continue
        seen.add(name)
        body = re.escape(name.rstrip("."))
        opt_dot = r"\.?" if name.endswith(".") else ""
        pat = r"(?iu)(?<!\p{L})" + body + opt_dot + r"(?!\p{L})"
        col = F.regexp_replace(col, pat, target)
    return col


def parse_multi(
    col: Column,
    patterns: list[str],
    source_timezone: str | None = None,
    source_locale: str | None = None,
    now: "dt.date | None" = None,
) -> Column:
    """First-match-wins multi-pattern timestamp parse (try_to_timestamp
    keeps failures null instead of erroring, matching the reference's
    tags_on_failure flow).  `source_timezone` applies ONLY to candidates
    whose pattern has no zone directive (DateProcessor.java:93-110 builds
    the formatter with zoneId only when the pattern lacks zone info) —
    zone-carrying patterns already normalize themselves.

    `source_locale` translates localized month names to English before
    parsing (DateProcessor.java:113 toFormatter(sourceLocale)).  Missing
    calendar fields default per getSourceFormatter
    (DateProcessor.java:99-110): year/month/day absent from the pattern
    default to *today's* values (``now``, driver-evaluated once at plan
    time — pass a fixed date for reproducible runs), time-of-day to 0
    (Spark's native default)."""
    if now is None:
        now = dt.date.today()
    cands = []
    for p in patterns:
        if source_locale is None:
            c = col
        else:
            c = _localize_to_english(col, source_locale, want_full="MMMM" in p)
        fields = _pattern_fields(p)
        prefix_pat, prefix_val = [], []
        if not fields & {"y", "u"}:
            prefix_pat.append("yyyy")
            prefix_val.append(f"{now.year:04d}")
        if not fields & {"M", "L"}:
            prefix_pat.append("MM")
            prefix_val.append(f"{now.month:02d}")
        if "d" not in fields:
            prefix_pat.append("dd")
            prefix_val.append(f"{now.day:02d}")
        pat = p
        if prefix_pat:
            pat = " ".join(prefix_pat) + " " + p
            c = F.concat(F.lit(" ".join(prefix_val) + " "), c)
        c = F.try_to_timestamp(c, F.lit(pat))
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
    source_locale: str | None = None,
    now: dt.date | None = None,
) -> DataFrame:
    """Parse `match_key` with candidate `patterns` → ISO string at
    `destination`; unparseable rows get null (the reference tags them).
    `source_timezone` (DateProcessor.java:93-110 zoneId): candidates
    whose pattern has no zone directive are interpreted in that zone and
    normalized to UTC; zone-carrying patterns are left alone (no double
    shift).  `source_locale`/`now`: locale month-name translation and
    missing-field defaulting per getSourceFormatter — see parse_multi."""
    ts = parse_multi(
        F.col(match_key), patterns, source_timezone, source_locale, now
    )
    out = df.withColumn(destination, F.date_format(ts, ISO_FMT))
    if to_origination_metadata:
        out = out.withColumn("_origination_ts", ts)
    return out


def from_time_received(df: DataFrame, destination: str = "@timestamp") -> DataFrame:
    """`from_time_received` mode — our `_ingest_ts` column is the
    EventMetadata.timeReceived equivalent (SURVEY.md §1.1)."""
    return df.withColumn(destination, F.date_format(F.col("_ingest_ts"), ISO_FMT))
