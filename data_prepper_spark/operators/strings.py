"""String / parse processor equivalents (reference: mutate-string-processors,
key-value-processor, csv-processor, grok-processor, obfuscate-processor).

Everything here compiles to builtin ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen.  Grok patterns are expanded to plain Java
regexes at *plan* time (the reference compiles them per processor instance
too, GrokProcessor.java:59; we just never pay a per-row Python cost).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from ..expression import TAGS_COL


def substitute_string(df: DataFrame, entries: list[dict]) -> DataFrame:
    """`substitute_string` (SubstituteStringProcessor.java:25,41-52):
    {source, from (regex), to} → regexp_replace in place."""
    for e in entries:
        df = df.withColumn(e["source"], F.regexp_replace(F.col(e["source"]), e["from"], e["to"]))
    return df


def split_string(df: DataFrame, entries: list[dict]) -> DataFrame:
    """`split_string` (SplitStringProcessor.java:20,43-44): {source,
    delimiter | delimiter_regex} → array in place."""
    for e in entries:
        delim = e.get("delimiter_regex") or re.escape(e["delimiter"])
        df = df.withColumn(e["source"], F.split(F.col(e["source"]), delim))
    return df


def uppercase_string(df: DataFrame, with_keys: list[str]) -> DataFrame:
    """`uppercase_string` (UppercaseStringProcessor.java:20)."""
    for k in with_keys:
        df = df.withColumn(k, F.upper(F.col(k)))
    return df


def lowercase_string(df: DataFrame, with_keys: list[str]) -> DataFrame:
    """`lowercase_string` (LowercaseStringProcessor.java:20)."""
    for k in with_keys:
        df = df.withColumn(k, F.lower(F.col(k)))
    return df


def trim_string(df: DataFrame, with_keys: list[str]) -> DataFrame:
    """`trim_string` (TrimStringProcessor.java:18)."""
    for k in with_keys:
        df = df.withColumn(k, F.trim(F.col(k)))
    return df


# Predefined obfuscation pattern library (CommonPattern.java:8-15) —
# referenced in configs as %{NAME}, resolved at plan time
# (ObfuscationProcessor.java:62-78; unknown names are config errors).
OBFUSCATE_COMMON_PATTERNS: dict[str, str] = {
    "EMAIL_ADDRESS": r"[A-Za-z0-9+_.-]+@([\w-]+\.)+[\w-]{2,4}",
    "IP_ADDRESS_V4": r"((25[0-5]|(2[0-4]|1\d|[1-9]|)\d)\.?\b){4}",
    "BASE_NUMBER": r"[0-9]*\.?[0-9]+",
    "CREDIT_CARD_NUMBER": r"(\d[ -]*?){13,16}",
    "US_PHONE_NUMBER": r"\+?\d?[\s-]?(\(\d{3}\)|\d{3})[\s-]?\d{3}[\s-]?\d{4}",
    "US_SSN_NUMBER": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def _resolve_obfuscate_patterns(patterns: list[str]) -> list[str]:
    out = []
    for raw in patterns:
        m = re.fullmatch(r"%\{([A-Z0-9_]+)\}", raw)
        if m:
            name = m.group(1)
            if name not in OBFUSCATE_COMMON_PATTERNS:
                raise ValueError(
                    f"obfuscate: no predefined pattern {raw!r} "
                    f"(have {sorted(OBFUSCATE_COMMON_PATTERNS)})"
                )
            out.append(OBFUSCATE_COMMON_PATTERNS[name])
        else:
            out.append(raw)
    return out


def obfuscate(
    df: DataFrame,
    source: str,
    patterns: list[str],
    target: str | None = None,
    mask: str = "***",
    action: str = "mask",
) -> DataFrame:
    """`obfuscate` (ObfuscationProcessor.java:31,92) with its pluggable
    action (MaskAction.java:24-35; the one-way-hash action) and the
    predefined %{NAME} pattern library (CommonPattern.java:8-15):

      action="mask" — every regex match → the mask string (pure Catalyst).
      action="hash" — every regex match → its sha256 hex digest.  With no
        patterns the WHOLE field is hashed JVM-side (F.sha2); with
        patterns, per-match replacement needs a callback, which regexes
        can't express in Catalyst → Arrow-batched pandas UDF (the one
        documented per-row-Python site outside media decode)."""
    patterns = _resolve_obfuscate_patterns(patterns)
    if action == "mask":
        c: Column = F.col(source)
        for p in patterns:
            c = F.regexp_replace(c, p, mask)
        return df.withColumn(target or source, c)
    if action != "hash":
        raise ValueError(f"unknown obfuscate action {action!r}")
    if not patterns:
        return df.withColumn(target or source, F.sha2(F.col(source), 256))
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rx_srcs = list(patterns)

    def hash_matches(s):
        rxs = [re.compile(p) for p in rx_srcs]

        def one(x):
            if x is None:
                return None
            for rx in rxs:
                x = rx.sub(
                    lambda m: hashlib.sha256(m.group(0).encode()).hexdigest(), x
                )
            return x

        return s.map(one)

    # real annotation objects (PEP-563 string hints defeat pyspark's
    # eval-type inference under `from __future__ import annotations`)
    hash_matches.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = pandas_udf(hash_matches, "string")
    return df.withColumn(target or source, udf(F.col(source)))


def key_value(
    df: DataFrame,
    source: str,
    destination: str = "parsed_message",
    field_split: str = "&",
    value_split: str = "=",
    transform_key: str | None = None,
    include_keys: list[str] | None = None,
    exclude_keys: list[str] | None = None,
    default_values: dict[str, str] | None = None,
    delete_key_regex: str | None = None,
    delete_value_regex: str | None = None,
    non_match_value: str | None = None,
) -> DataFrame:
    """`key_value` (KeyValueProcessor.java:30,180+; option surface
    KeyValueProcessorConfig.java:19-23): split into a map<string,string>,
    all options as JVM map-lambda expressions (codegen, no UDF).

    Option order mirrors the reference's per-pair flow: split →
    delete_key_regex / delete_value_regex (strip matches) → transform_key
    ∈ {lowercase, uppercase, capitalize} → include_keys / exclude_keys
    filter → non_match_value (pairs with no value-split get this instead
    of null) → default_values merged for keys still absent."""
    m = F.str_to_map(F.col(source), F.lit(field_split), F.lit(value_split))
    if delete_key_regex:
        m = F.transform_keys(m, lambda k, _: F.regexp_replace(k, delete_key_regex, ""))
    if delete_value_regex:
        m = F.transform_values(
            m, lambda _, v: F.regexp_replace(v, delete_value_regex, "")
        )
    if transform_key == "lowercase":
        m = F.transform_keys(m, lambda k, _: F.lower(k))
    elif transform_key == "uppercase":
        m = F.transform_keys(m, lambda k, _: F.upper(k))
    elif transform_key == "capitalize":
        m = F.transform_keys(m, lambda k, _: F.initcap(k))
    if include_keys is not None:
        m = F.map_filter(m, lambda k, _: k.isin(include_keys))
    if exclude_keys:
        m = F.map_filter(m, lambda k, _: ~k.isin(exclude_keys))
    if non_match_value is not None:
        m = F.transform_values(
            m, lambda _, v: F.coalesce(v, F.lit(str(non_match_value)))
        )
    if default_values:
        defaults = F.create_map(
            *[F.lit(x) for kv in default_values.items() for x in kv]
        )
        # merge only keys ABSENT from the parsed map — a present-but-
        # valueless pair (null value) keeps its null, per the reference
        present = F.map_keys(m)
        missing = F.map_filter(defaults, lambda k, _: ~F.array_contains(present, k))
        m = F.map_concat(m, missing)
    return df.withColumn(destination, m)


def key_value_recursive(
    df: DataFrame,
    source: str,
    destination: str = "parsed_message",
    field_split: str = "&",
    value_split: str = "=",
    max_depth: int = 8,
) -> DataFrame:
    """`key_value` with `recursive: true` (KeyValueProcessorConfig.java:
    19-23): values wrapped in (), [] or {} are parsed as nested
    key/value groups.  Nested delimiters make this context-sensitive —
    not expressible as Catalyst string functions — so it runs as an
    Arrow-batched pandas UDF emitting a JSON string at `destination`
    (nested maps of arbitrary depth have no static Spark type; compose
    with `parse_json` + a schema to get typed structs)."""
    import json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    opens, closes = "([{", ")]}"

    def split_top(s: str, delim: str) -> list[str]:
        parts, depth, cur = [], 0, []
        for ch in s:
            if ch in opens:
                depth += 1
            elif ch in closes and depth > 0:
                depth -= 1
            if ch == delim and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        return parts

    def parse(s: str, depth: int):
        out = {}
        for pair in split_top(s, field_split):
            if not pair:
                continue
            kv = split_top(pair, value_split)
            k = kv[0]
            v = value_split.join(kv[1:]) if len(kv) > 1 else None
            if (
                v
                and depth < max_depth
                and len(v) >= 2
                and v[0] in opens
                and v[-1] == closes[opens.index(v[0])]
            ):
                out[k] = parse(v[1:-1], depth + 1)
            else:
                out[k] = v
        return out

    def fn(s):
        return s.map(lambda x: None if x is None else json.dumps(parse(x, 0)))

    fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = pandas_udf(fn, "string")
    return df.withColumn(destination, udf(F.col(source)))


def csv_parse(
    df: DataFrame,
    source: str,
    column_names: list[str],
    delimiter: str = ",",
    quote_char: str = '"',
) -> DataFrame:
    """`csv` processor (CsvProcessor.java:35,53-90): parse one CSV row
    string into named string columns (quoting-correct via from_csv)."""
    schema = ", ".join(f"`{c}` string" for c in column_names)
    parsed = F.from_csv(
        F.col(source), schema, {"sep": delimiter, "quote": quote_char}
    )
    out = df.withColumn("_csv", parsed)
    for c in column_names:
        out = out.withColumn(c, F.col("_csv").getField(c))
    return out.drop("_csv")


def csv_parse_header_event(
    df: DataFrame,
    source: str,
    header_col: str,
    delimiter: str = ",",
    destination: str = "parsed",
    delete_header: bool = True,
) -> DataFrame:
    """`csv` with `column_names_source_key` + `delete_header`
    (CsvProcessor.java:53-90): the column names arrive in an event FIELD,
    so the schema is per-row dynamic → the Spark-faithful result is a
    map<string,string> built from zipped split arrays (JVM-side).
    Mismatched lengths truncate to the shorter side (the reference drops
    extra values / leaves extra names absent).  Quoted delimiters inside
    values are NOT honored on this path (from_csv needs a static schema);
    use `csv_parse` when column names are known at plan time."""
    d = re.escape(delimiter)
    keys = F.split(F.col(header_col), d)
    vals = F.split(F.col(source), d)
    n = F.least(F.size(keys), F.size(vals))
    out = df.withColumn(
        destination,
        F.map_from_arrays(F.slice(keys, 1, n), F.slice(vals, 1, n)),
    )
    return out.drop(header_col) if delete_header else out


def _pointer_walk(schema_ddl: str, pointer: str):
    """Resolve a JSON pointer against the declared schema at COMPILE time
    (the reference checks per-row with containsKey —
    ParseJsonProcessor.java:125-128; in a fixed-schema engine validity is
    a schema property).  Returns (elements, end_key, valid).  End-key rule
    per getEndOfPointer (ParseJsonProcessor.java:141-153): last element,
    or last two when the last is an array index; '/' → '.'
    (normalizePointerStructure :160-162)."""
    from pyspark.sql.types import ArrayType, StructType

    trimmed = pointer.strip("/")
    elements = trimmed.split("/")
    cur = StructType.fromDDL(schema_ddl)
    valid = True
    for e in elements:
        if re.fullmatch(r"[0-9]+", e) and isinstance(cur, ArrayType):
            cur = cur.elementType
        elif isinstance(cur, StructType) and e in cur.fieldNames():
            cur = cur[e].dataType
        else:
            valid = False
            break
    if len(elements) <= 1:
        end_key = trimmed
    elif re.fullmatch(r"[0-9]+", elements[-1]):
        end_key = elements[-2] + "/" + elements[-1]
    else:
        end_key = elements[-1]
    return elements, end_key.replace("/", "."), valid


def parse_json(
    df: DataFrame,
    source: str,
    schema: str,
    destination: str | None = None,
    pointer: str | None = None,
    tags_on_failure: list[str] | None = None,
) -> DataFrame:
    """`parse_json` (ParseJsonProcessor.java:34,61-101): from_json with a
    known schema; struct merged at root when destination is None.

    ``pointer`` extracts a subtree (parseUsingPointer :117-139): the
    value lands under the pointer's end key — or under the full
    dot-normalized pointer when the end key would collide with an
    existing root column (:133-135).  An invalid pointer falls back to
    the whole parsed document (:125-128; resolved at compile time
    against the declared schema).  ``tags_on_failure`` appends to the
    ``_tags`` metadata column on rows whose JSON does not parse
    (:93-99 — from_json yields NULL for malformed input; failure =
    non-null source, null parse)."""
    parsed = F.from_json(F.col(source), schema)
    out = df
    if tags_on_failure:
        # PERMISSIVE from_json yields an all-null struct (not NULL) for
        # malformed input — detect failure via a corrupt-record field
        # (the declarative twin of Jackson's JsonProcessingException,
        # ParseJsonProcessor.java:93-96)
        aug = F.from_json(
            F.col(source),
            schema + ", _dp_corrupt string",
            {"columnNameOfCorruptRecord": "_dp_corrupt"},
        )
        failed = F.col(source).isNotNull() & aug.getField("_dp_corrupt").isNotNull()
        have = df.columns
        base = F.col(TAGS_COL) if TAGS_COL in have else F.lit(None).cast("array<string>")
        out = out.withColumn(
            TAGS_COL,
            F.when(
                failed,
                F.array_union(
                    F.coalesce(base, F.array().cast("array<string>")),
                    F.array(*[F.lit(t) for t in tags_on_failure]),
                ),
            ).otherwise(base),
        )
    if pointer is not None:
        elements, end_key, valid = _pointer_walk(schema, pointer)
        if valid:
            col = parsed
            for e in elements:
                if re.fullmatch(r"[0-9]+", e):
                    col = F.get(col, int(e))
                else:
                    col = col.getField(e)
            key = end_key
            if destination is None and end_key in df.columns:
                key = pointer.strip("/").replace("/", ".")
            if destination is not None:
                return out.withColumn(destination, F.struct(col.alias(key)))
            return out.withColumn(key, col)
        # invalid pointer → whole document (reference fallback)
    if destination is not None:
        return out.withColumn(destination, parsed)
    tmp = out.withColumn("_j", parsed)
    for f_name in tmp.select("_j.*").columns:
        tmp = tmp.withColumn(f_name, F.col("_j").getField(f_name))
    return tmp.drop("_j")


# --------------------------------------------------------------------- grok

# The grok pattern dictionary — the standard public grok-patterns
# vocabulary the reference ships (grok-processor/src/main/resources/
# patterns bundles java-grok's default set; these are the same well-known
# public pattern *definitions*, normalized so every inner group is
# non-capturing — required because the Catalyst path addresses captures
# by group index, and so the same source compiles under both Java and
# Python regex flavors).
GROK_PATTERNS: dict[str, str] = {
    # --- base ---
    "INT": r"[+-]?\d+",
    "POSINT": r"\b[1-9][0-9]*\b",
    "NONNEGINT": r"\b[0-9]+\b",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QS": r"\"(?:[^\"\\]|\\.)*\"",
    "QUOTEDSTRING": r"\"(?:[^\"\\]|\\.)*\"",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    # --- network ---
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4}|(?:\d{1,3}\.){3}\d{1,3})",
    "IP": r"(?:(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4}|(?:\d{1,3}\.){3}\d{1,3})|(?:\d{1,3}\.){3}\d{1,3})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[\w.-]+)",
    "HOSTPORT": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[\w.-]+):[0-9]+",
    "MAC": r"(?:[A-Fa-f0-9]{2}[:-]){5}[A-Fa-f0-9]{2}",
    "USER": r"[a-zA-Z0-9._-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    # --- paths / uris ---
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "WINPATH": r"(?:[A-Za-z]:|\\)(?:\\[^\\?*]*)+",
    "TTY": r"/dev/(?:pts|tty(?:[pq])?)(?:\w+)?(?:/[0-9]+)?",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]+",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    # --- dates / times ---
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?",
    "TIME": r"(?:2[0123]|[01][0-9]):(?:[0-5][0-9])(?::(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?)?",
    "DATE_US": r"(?:0?[1-9]|1[0-2])[/-](?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])[/-](?:\d\d){1,2}",
    "DATE_EU": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])[./-](?:0?[1-9]|1[0-2])[./-](?:\d\d){1,2}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-](?:2[0123]|[01][0-9])(?::?(?:[0-5][0-9])))",
    "TIMESTAMP_ISO8601": r"(?:\d\d){1,2}-(?:0?[1-9]|1[0-2])-(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])[T ](?:2[0123]|[01]?[0-9]):?(?:[0-5][0-9])(?::?(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?))?(?:Z|[+-](?:2[0123]|[01][0-9])(?::?(?:[0-5][0-9])))?",
    "TZ": r"[A-Z]{3,4}|[+-]\d{4}",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    # --- syslog ---
    "PROG": r"[\w._/%-]+",
}
GROK_PATTERNS.update(
    {
        "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
        "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
        "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
        "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
        "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
        "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
        "SYSLOGHOST": r"%{IPORHOST}",
        "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
        "SYSLOGFACILITY": r"<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
        "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
        "DATESTAMP": r"%{DATE_US}[- ]%{TIME}|%{DATE_EU}[- ]%{TIME}",
        "COMMONAPACHELOG": (
            r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} "
            r"\[%{HTTPDATE:timestamp}\] "
            r'"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
            r"%{NUMBER:response} (?:%{NUMBER:bytes}|-)"
        ),
    }
)
GROK_PATTERNS["COMBINEDAPACHELOG"] = (
    GROK_PATTERNS["COMMONAPACHELOG"] + r" %{QS:referrer} %{QS:agent}"
)

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_compile(pattern: str, flavor: str = "java") -> tuple[str, list[str]]:
    """Expand %{NAME:capture} references into one regex with named groups
    (`java` → ``(?<n>…)`` for Catalyst, `python` → ``(?P<n>…)`` for the
    vectorized pandas path); returns (regex, capture_names).  Mirrors
    what java-grok does inside GrokProcessor (GrokProcessor.java:59) but
    at plan time."""
    captures: list[str] = []
    grp = "(?P<{cap}>{body})" if flavor == "python" else "(?<{cap}>{body})"

    def expand(p: str, depth: int = 0) -> str:
        if depth > 10:
            raise ValueError("grok recursion too deep")

        def sub(m: re.Match) -> str:
            name, cap = m.group(1), m.group(2)
            if cap:
                # register BEFORE expanding the body so capture order
                # matches Java's left-to-right group numbering even for
                # nested %{…:…} refs
                captures.append(cap)
                body = expand(GROK_PATTERNS[name], depth + 1)
                return grp.format(cap=cap, body=body)
            return f"(?:{expand(GROK_PATTERNS[name], depth + 1)})"

        return _GROK_REF.sub(sub, p)

    return expand(pattern), captures


def grok(
    df: DataFrame,
    match: dict[str, list[str]],
    keep_empty_captures: bool = False,
    vectorized: bool = True,
) -> DataFrame:
    """`grok` (GrokProcessor.java:59,120-150, matchAndMerge :232-258):
    for each source field, try patterns in order (break_on_match
    semantics); merge named captures as new columns.

    Two compilations of the same plan-time-expanded pattern:
      vectorized=True  — ONE regex pass per row per pattern, all captures
        at once, via pandas .str.extract inside mapInPandas (Arrow
        batches).  regexp_extract would cost 2 passes × n_captures.
      vectorized=False — pure Catalyst (regexp_extract per capture);
        keeps the whole plan JVM-side for small capture counts.
    """
    if vectorized:
        return _grok_pandas(df, match, keep_empty_captures)
    for field, patterns in match.items():
        compiled = [grok_compile(p) for p in patterns]
        all_caps: list[str] = []
        for _, caps in compiled:
            for c in caps:
                if c not in all_caps:
                    all_caps.append(c)
        for cap in all_caps:
            exprs = []
            for rx, caps in compiled:
                if cap not in caps:
                    continue
                # group index = position among ALL groups in this regex
                idx = caps.index(cap) + 1
                e = F.regexp_extract(F.col(field), rx, idx)
                exprs.append(F.when(F.col(field).rlike(rx), e))
            v = F.coalesce(*exprs) if len(exprs) > 1 else exprs[0]
            if not keep_empty_captures:
                v = F.when(v == "", None).otherwise(v)
            df = df.withColumn(cap, v)
    return df


def _grok_pandas(
    df: DataFrame,
    match: dict[str, list[str]],
    keep_empty_captures: bool,
) -> DataFrame:
    """Vectorized grok: per Arrow batch, pandas .str.extract extracts ALL
    named groups in one C-level regex pass; later patterns fill only rows
    the earlier ones missed (break_on_match)."""
    import pandas as pd

    plan: list[tuple[str, list[tuple[str, list[str]]], list[str]]] = []
    out_caps: list[str] = []
    for field, patterns in match.items():
        compiled = [grok_compile(p, flavor="python") for p in patterns]
        caps: list[str] = []
        for _, cs in compiled:
            for c in cs:
                if c not in caps:
                    caps.append(c)
        plan.append((field, compiled, caps))
        out_caps.extend(c for c in caps if c not in out_caps)

    from pyspark.sql.types import StringType, StructField, StructType

    base_cols = df.columns
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(c, StringType()) for c in out_caps if c not in base_cols]
    )

    def fn(batches):
        for b in batches:
            for field, compiled, caps in plan:
                src = b[field].astype("object").astype("string")
                got = pd.DataFrame(index=b.index, columns=caps, dtype="object")
                unmatched = pd.Series(True, index=b.index)
                for rx, cs in compiled:
                    if not unmatched.any():
                        break
                    ext = src[unmatched].str.extract(rx)
                    hit = ext.notna().any(axis=1)
                    for c in cs:
                        got.loc[ext.index[hit], c] = ext.loc[hit, c]
                    unmatched.loc[ext.index[hit]] = False
                for c in caps:
                    col = got[c].astype(object)
                    if keep_empty_captures:
                        col = col.where(pd.notna(col), None)
                    else:
                        col = col.where(pd.notna(col) & (col != ""), None)
                    b[c] = col
            yield b

    return df.mapInPandas(fn, schema=out_schema)
