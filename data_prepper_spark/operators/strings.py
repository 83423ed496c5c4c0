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


def obfuscate(
    df: DataFrame, source: str, patterns: list[str], target: str | None = None, mask: str = "***"
) -> DataFrame:
    """`obfuscate` with the default MaskAction (ObfuscationProcessor.java:31,92;
    MaskAction.java:24-35): replace every regex match with the mask."""
    c: Column = F.col(source)
    for p in patterns:
        c = F.regexp_replace(c, p, mask)
    return df.withColumn(target or source, c)


def key_value(
    df: DataFrame,
    source: str,
    destination: str = "parsed_message",
    field_split: str = "&",
    value_split: str = "=",
    transform_key: str | None = None,
) -> DataFrame:
    """`key_value` (KeyValueProcessor.java:30,180+; defaults
    KeyValueProcessorConfig.java:19,23): split into a map<string,string>.
    transform_key ∈ {lowercase, uppercase, capitalize}."""
    m = F.str_to_map(F.col(source), F.lit(field_split), F.lit(value_split))
    if transform_key == "lowercase":
        m = F.transform_keys(m, lambda k, _: F.lower(k))
    elif transform_key == "uppercase":
        m = F.transform_keys(m, lambda k, _: F.upper(k))
    elif transform_key == "capitalize":
        m = F.transform_keys(m, lambda k, _: F.initcap(k))
    return df.withColumn(destination, m)


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


def parse_json(df: DataFrame, source: str, schema: str, destination: str | None = None) -> DataFrame:
    """`parse_json` (ParseJsonProcessor.java:34,61-101): from_json with a
    known schema; struct merged at root when destination is None."""
    parsed = F.from_json(F.col(source), schema)
    if destination is not None:
        return df.withColumn(destination, parsed)
    out = df.withColumn("_j", parsed)
    for f_name in out.select("_j.*").columns:
        out = out.withColumn(f_name, F.col("_j").getField(f_name))
    return out.drop("_j")


# --------------------------------------------------------------------- grok

# The grok pattern dictionary — the subset of the reference's shipped
# patterns (grok-processor/src/main/resources/patterns + java-grok
# defaults) needed for the Apache CLF archetype used in the reference's
# e2e test (e2e-test/log/.../basic-grok-e2e-pipeline.yml).
GROK_PATTERNS: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPORHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[\w.-]+)",
    "USER": r"[a-zA-Z0-9._-]+",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "QS": r"\"(?:[^\"\\]|\\.)*\"",
}
GROK_PATTERNS["COMMONAPACHELOG"] = (
    r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} "
    r"\[%{HTTPDATE:timestamp}\] "
    r'"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
    r"%{NUMBER:response} (?:%{NUMBER:bytes}|-)"
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
