"""Mutate-event processor equivalents (reference: mutate-event-processors).

All are thin declarative wrappers — the point is the *mapping*, documented
per function, so a Data Prepper user can see where each YAML knob went.
Conditions (`add_when`, `convert_when`, …) take a DP expression string and
compile through :mod:`..expression` to a Catalyst predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..expression import compile_expression


def _guard(df: DataFrame, col: str, new: Column, when: str | None) -> DataFrame:
    """`*_when` semantics: apply per-row only where the guard holds
    (AddEntryProcessor.java:48 etc.)."""
    if when is None:
        return df.withColumn(col, new)
    cond = compile_expression(when)
    orig = F.col(col) if col in df.columns else F.lit(None)
    return df.withColumn(col, F.when(cond, new).otherwise(orig))


def add_entries(
    df: DataFrame,
    entries: list[dict],
) -> DataFrame:
    """`add_entries` (AddEntryProcessor.java:27,42-84).

    Each entry: {key, value | format | value_expression,
    overwrite_if_key_exists: bool, add_when: str}.
    `format` is the reference's "${/a}-${/b}" string template
    (JacksonEvent.formatString, Event.java:124-134) → format_string/concat.
    """
    for e in entries:
        key = e["key"]
        if "value" in e:
            new = F.lit(e["value"])
        elif "format" in e:
            new = _format_template(e["format"])
        else:
            new = compile_expression(e["value_expression"])
        if key in df.columns and not e.get("overwrite_if_key_exists", True):
            continue
        df = _guard(df, key, new, e.get("add_when"))
    return df


def _format_template(tmpl: str) -> Column:
    """"${/a}-${/b}" → concat(col a, lit('-'), col b)."""
    import re

    parts: list[Column] = []
    pos = 0
    for m in re.finditer(r"\$\{(/[^}]+)\}", tmpl):
        if m.start() > pos:
            parts.append(F.lit(tmpl[pos : m.start()]))
        path = m.group(1).lstrip("/").replace("/", ".")
        parts.append(F.col(path).cast("string"))
        pos = m.end()
    if pos < len(tmpl):
        parts.append(F.lit(tmpl[pos:]))
    return F.concat(*parts) if parts else F.lit("")


def copy_values(df: DataFrame, entries: list[dict]) -> DataFrame:
    """`copy_values` (CopyValueProcessor.java:21): {from_key, to_key,
    overwrite_if_to_key_exists}."""
    for e in entries:
        if e["to_key"] in df.columns and not e.get("overwrite_if_to_key_exists", False):
            continue
        df = df.withColumn(e["to_key"], F.col(e["from_key"]))
    return df


def rename_keys(df: DataFrame, entries: list[dict]) -> DataFrame:
    """`rename_keys` (RenameKeyProcessor.java:21): first-wins, optional
    overwrite of an existing destination."""
    for e in entries:
        if e["to_key"] in df.columns and not e.get("overwrite_if_to_key_exists", False):
            continue
        df = df.withColumnRenamed(e["from_key"], e["to_key"])
    return df


def delete_entries(df: DataFrame, with_keys: list[str]) -> DataFrame:
    """`delete_entries` (DeleteEntryProcessor.java:20) → drop."""
    return df.drop(*with_keys)


def convert_entry_type(
    df: DataFrame,
    key: str,
    type_: str,
    null_values: list[str] | None = None,
    convert_when: str | None = None,
) -> DataFrame:
    """`convert_entry_type` (ConvertEntryTypeProcessor.java:23); TargetType
    enum integer|string|double|boolean (TargetType.java:19-23)."""
    spark_t = {"integer": "long", "string": "string", "double": "double", "boolean": "boolean"}[type_]
    src = F.col(key).cast("string")
    if null_values:
        src = F.when(src.isin(null_values), None).otherwise(src)
    return _guard(df, key, src.cast(spark_t), convert_when)


def translate_exact(
    df: DataFrame,
    source: str,
    target: str,
    mapping: dict,
    default=None,
) -> DataFrame:
    """`translate` with exact keys (TranslateProcessor.java:38,56) — the
    dimension-enrichment case. Implemented as a map literal lookup (stays
    in codegen); a large mapping would become a broadcast-join instead."""
    lit_map = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    looked = F.element_at(lit_map, F.col(source).cast("string"))
    return df.withColumn(target, F.coalesce(looked, F.lit(default)))


def translate_range(
    df: DataFrame,
    source: str,
    target: str,
    ranges: list[tuple[float, float, str]],
    default=None,
) -> DataFrame:
    """`translate` numeric-range mappings "10-20": "teen"
    (TranslateProcessor.java:197-205) → chained F.when. Ranges are
    inclusive on both ends, first match wins (reference iterates entries
    in order)."""
    c: Column | None = None
    for lo, hi, val in ranges:
        cond = (F.col(source) >= lo) & (F.col(source) <= hi)
        c = F.when(cond, val) if c is None else c.when(cond, val)
    out = c.otherwise(F.lit(default)) if c is not None else F.lit(default)
    return df.withColumn(target, out)


def translate_regex(
    df: DataFrame,
    source: str,
    target: str,
    patterns: list[tuple[str, str]],
    default=None,
) -> DataFrame:
    """`translate` regex patterns (TranslateProcessor.java:207-213)."""
    c: Column | None = None
    for pat, val in patterns:
        cond = F.col(source).rlike(pat)
        c = F.when(cond, val) if c is None else c.when(cond, val)
    out = c.otherwise(F.lit(default)) if c is not None else F.lit(default)
    return df.withColumn(target, out)


def translate_file(
    df: DataFrame,
    source: str,
    target: str,
    file_path: str,
    default=None,
) -> DataFrame:
    """`translate` with `file:` mappings (TranslateProcessor.java:38;
    mappings loaded from a JSON object file at plan time — the
    reference's file_parameter_config).  The loaded dict flows through
    the same map-literal path as inline mappings."""
    import json

    with open(file_path) as f:
        mapping = json.load(f)
    return translate_exact(df, source, target, mapping, default)


def translate_iterate(
    df: DataFrame,
    source: str,
    target: str,
    mapping: dict,
    default=None,
) -> DataFrame:
    """`translate` with `iterate_on` (TranslateProcessor.java:56): the
    source is an ARRAY column; every element is translated, producing an
    array at `target`.  Pure transform lambda — stays in codegen."""
    lit_map = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return df.withColumn(
        target,
        F.transform(
            F.col(source),
            lambda x: F.coalesce(F.element_at(lit_map, x.cast("string")), F.lit(default)),
        ),
    )


def list_to_map(
    df: DataFrame,
    source: str,
    target: str,
    key: str,
    value_key: str | None = None,
    flatten: bool = False,
    flattened_element: str = "first",
) -> DataFrame:
    """`list_to_map` (ListToMapProcessor.java:30,47-83; full option
    surface per constructTargetNode :91-123): array<struct> → map keyed
    by the struct's `key` field.

      flatten=False (reference default, :98-110) — each key maps to the
        LIST of its items' values, in order of appearance.
      flatten=True (:111-118) — each key maps to ONE value; on duplicate
        keys, `flattened_element` 'first' (default) or 'last' picks the
        occurrence (FlattenedElement enum).
      value_key None → whole item; else item[value_key] (:104-108).

    Pure higher-order-function Catalyst (array_distinct + filter +
    transform — per-event lists are small; no shuffle, no UDF).  The
    reference's target=None root-merge needs data-dependent column names
    and is out of scope in a fixed-schema engine (documented)."""
    arr = F.col(source)
    val = (lambda x: x) if value_key is None else (lambda x: x.getField(value_key))
    keys = F.array_distinct(F.transform(arr, lambda x: x.getField(key)))
    if flatten:
        if flattened_element not in ("first", "last"):
            raise ValueError(f"flattened_element must be first|last, got {flattened_element!r}")
        idx = 0 if flattened_element == "first" else -1

        def pick(k):
            matches = F.filter(arr, lambda x: x.getField(key) == k)
            chosen = F.get(matches, 0) if idx == 0 else F.element_at(matches, -1)
            return val(chosen)

        entries = F.transform(keys, lambda k: F.struct(k.alias("k"), pick(k).alias("v")))
    else:
        entries = F.transform(
            keys,
            lambda k: F.struct(
                k.alias("k"),
                F.transform(
                    F.filter(arr, lambda x: x.getField(key) == k), val
                ).alias("v"),
            ),
        )
    return df.withColumn(target, F.map_from_entries(entries))


def select_entries(df: DataFrame, include_keys: list[str]) -> DataFrame:
    """`select_entries` (keep only listed keys; the reference snapshot
    carries include/exclude lists on sinks and key_value — mutate-event's
    select form postdates it) → plain projection."""
    return df.select(*include_keys)


def no_op(df: DataFrame) -> DataFrame:
    """`no-op` (common/.../NoOpProcessor.java:15) — identity."""
    return df


def drop_events(df: DataFrame, drop_when: str) -> DataFrame:
    """`drop_events` (DropEventsProcessor.java:23,43-52): keep rows where
    the condition is NOT true (null-safe, like the reference's evaluator
    returning false on failure → event kept)."""
    cond = compile_expression(drop_when)
    return df.filter(~F.coalesce(cond, F.lit(False)))
