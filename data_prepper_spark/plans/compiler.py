"""Compile a Data-Prepper-shaped pipeline spec into DataFrames.

The reference parses pipeline YAML into a live object DAG and executes the
processor list verbatim per batch (PipelineParser.java:101-248,
ProcessWorker.doRun:108-136 — see SURVEY.md §3.1/§3.2).  Here the spec
compiles ONCE into a lazy DataFrame chain; Catalyst is the
analyzer/optimizer the reference never had, so filters written last still
push down to the scan.

Spec shape (YAML-parsed dict, same vocabulary as the reference):

    {
      "source": {"parquet": {"path": ...}}            # or an input DataFrame
      "processor": [
        {"grok": {"match": {"log": ["%{COMMONAPACHELOG}"]}}},
        {"date": {"match_key": "timestamp", "patterns": [...]}},
        {"add_entries": {"entries": [...]}},
        {"drop_events": {"drop_when": "/status >= 500"}},
        ...
      ],
      "route": {"errors": "/response == \"500\"", ...},   # optional
      "sink": [
        {"parquet": {"path": ..., "routes": ["errors"]}},
        {"stdout": {}},
      ],
    }

Processor names map 1:1 to the reference plugin names
(@DataPrepperPlugin) wherever we implement the equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import aggregate as agg_ops
from ..operators import dates, mutate, routing, strings

# name → (module function, config keys passed positionally by **kwargs)
_PROCESSORS = {
    "add_entries": lambda df, c: mutate.add_entries(df, c["entries"]),
    "copy_values": lambda df, c: mutate.copy_values(df, c["entries"]),
    "rename_keys": lambda df, c: mutate.rename_keys(df, c["entries"]),
    "delete_entries": lambda df, c: mutate.delete_entries(df, c["with_keys"]),
    "convert_entry_type": lambda df, c: mutate.convert_entry_type(
        df, c["key"], c["type"], c.get("null_values"), c.get("convert_when")
    ),
    "translate": None,  # bound to _translate below
    "list_to_map": lambda df, c: mutate.list_to_map(
        df, c["source"], c["target"], c["key"], c.get("value_key")
    ),
    "drop_events": lambda df, c: mutate.drop_events(df, c["drop_when"]),
    "substitute_string": lambda df, c: strings.substitute_string(df, c["entries"]),
    "split_string": lambda df, c: strings.split_string(df, c["entries"]),
    "uppercase_string": lambda df, c: strings.uppercase_string(df, c["with_keys"]),
    "lowercase_string": lambda df, c: strings.lowercase_string(df, c["with_keys"]),
    "trim_string": lambda df, c: strings.trim_string(df, c["with_keys"]),
    "obfuscate": lambda df, c: strings.obfuscate(
        df, c["source"], c["patterns"], c.get("target"),
        c.get("mask", "***"), c.get("action", "mask")
    ),
    "key_value": lambda df, c: strings.key_value_recursive(
        df,
        c["source"],
        c.get("destination", "parsed_message"),
        c.get("field_split_characters", "&"),
        c.get("value_split_characters", "="),
    )
    if c.get("recursive")
    else strings.key_value(
        df,
        c["source"],
        c.get("destination", "parsed_message"),
        c.get("field_split_characters", "&"),
        c.get("value_split_characters", "="),
        c.get("transform_key"),
        c.get("include_keys"),
        c.get("exclude_keys"),
        c.get("default_values"),
        c.get("delete_key_regex"),
        c.get("delete_value_regex"),
        c.get("non_match_value"),
    ),
    "csv": lambda df, c: (
        strings.csv_parse_header_event(
            df, c["source"], c["column_names_source_key"],
            c.get("delimiter", ","), c.get("destination", "parsed"),
            c.get("delete_header", True),
        )
        if "column_names_source_key" in c
        else strings.csv_parse(
            df, c["source"], c["column_names"], c.get("delimiter", ","),
            c.get("quote_character", '"')
        )
    ),
    "parse_json": lambda df, c: strings.parse_json(
        df, c.get("source", "message"), c["schema"], c.get("destination")
    ),
    "grok": lambda df, c: strings.grok(df, c["match"], c.get("keep_empty_captures", False)),
    "date": lambda df, c: dates.date_processor(
        df, c["match_key"], c["patterns"], c.get("destination", "@timestamp"),
        source_timezone=c.get("source_timezone"),
    ),
    "aggregate": None,  # replaced below (action dispatch)
}


def _translate(df: DataFrame, c: dict) -> DataFrame:
    kind = c.get("kind", "exact")
    if kind == "exact":
        return mutate.translate_exact(df, c["source"], c["target"], c["map"], c.get("default"))
    if kind == "range":
        return mutate.translate_range(df, c["source"], c["target"], c["ranges"], c.get("default"))
    if kind == "file":
        return mutate.translate_file(df, c["source"], c["target"], c["file"], c.get("default"))
    if kind == "iterate":
        return mutate.translate_iterate(df, c["source"], c["target"], c["map"], c.get("default"))
    return mutate.translate_regex(df, c["source"], c["target"], c["patterns"], c.get("default"))


def _aggregate(df: DataFrame, c: dict) -> DataFrame:
    keys = c["identification_keys"]
    action = c["action"]
    ts = c.get("ts_col")
    dur = c.get("group_duration")
    if action == "count":
        return agg_ops.agg_count(df, keys, ts, dur, c.get("count_key", "value"))
    if action == "histogram":
        return agg_ops.agg_histogram(df, keys, c["key"], c["buckets"], ts, dur)
    if action == "put_all":
        return agg_ops.agg_put_all(df, keys, c["value_cols"], ts, dur)
    if action == "append":
        return agg_ops.agg_append(df, keys, c["append_cols"], ts, dur)
    if action == "remove_duplicates":
        return agg_ops.remove_duplicates(df, keys, c["order_by"])
    if action == "percent_sampler":
        return agg_ops.percent_sampler(df, c["percent"], c["sample_key"])
    if action == "rate_limiter":
        return agg_ops.rate_limiter(df, keys, c["events_per_second"], ts)
    if action == "tail_sampler":
        from ..expression import compile_expression

        return agg_ops.tail_sampler(
            df, keys, compile_expression(c["error_condition"]),
            c.get("percent", 0.0), c.get("sample_key", keys[0]),
        )
    raise ValueError(f"unknown aggregate action {action!r}")


_PROCESSORS["translate"] = _translate
_PROCESSORS["aggregate"] = _aggregate


def _read_source(spark: SparkSession, spec) -> DataFrame:
    if isinstance(spec, DataFrame):
        return spec
    (name, conf), = spec.items()
    if name == "parquet":
        return spark.read.parquet(conf["path"])
    if name == "json":
        return spark.read.json(conf["path"])
    if name == "csv":
        return spark.read.csv(conf["path"], header=conf.get("header", True))
    if name == "file":  # reference `file` source: newline text → {message}
        return spark.read.text(conf["path"]).withColumnRenamed("value", "message")
    raise ValueError(f"unknown source {name!r}")


def _processed_frame(spark: SparkSession, spec: dict) -> DataFrame:
    """source → processor chain → the pre-routing frame (shared by
    compile_pipeline and run_pipeline)."""
    df = _read_source(spark, spec["source"])
    for step in spec.get("processor", []):
        (name, conf), = step.items()
        fn = _PROCESSORS.get(name)
        if fn is None:
            raise ValueError(f"unknown processor {name!r}")
        df = fn(df, conf or {})
    return df


def compile_pipeline(spark: SparkSession, spec: dict) -> dict[str, DataFrame]:
    """spec → {route_name: DataFrame}; '_default' holds unrouted events
    (all events when no `route:` section, like a route-less DP sink)."""
    df = _processed_frame(spark, spec)
    if "route" in spec:
        return routing.route(df, spec["route"])
    return {"_default": df}


def run_pipeline(spark: SparkSession, spec: dict) -> dict[str, int]:
    """Compile + execute sinks; returns rows written per sink path.

    Sink semantics (DataFlowComponentRouter.java:23-45): a sink with
    `routes:` receives events matching ANY of its routes — each event
    once, even when it matches several of the sink's routes (dedup on a
    stable per-event row id added BEFORE routing, never on column values:
    two genuinely distinct events with equal fields must both survive).
    No routes = the pre-routing frame (all events).

    Row counts come from `observe()` metrics attached to the write job —
    one Spark job per file sink, not a write + a recount of the DAG."""
    from pyspark.sql import Observation

    df = _processed_frame(spark, spec)
    has_routes = "route" in spec
    routed: dict[str, DataFrame] = {}
    if has_routes:
        # stable event identity for multi-route dedup; deterministic for
        # a deterministic source because it derives from (partition, row
        # order) of one scan
        df = df.withColumn("_event_id", F.monotonically_increasing_id())
        routed = routing.route(df, spec["route"])
    written: dict[str, int] = {}
    for sink in spec.get("sink", []):
        (name, conf), = sink.items()
        wanted = conf.get("routes")
        if wanted and not has_routes:
            raise ValueError(
                f"sink declares routes {wanted} but the spec has no "
                "`route:` section"
            )
        if wanted and has_routes:
            parts = [routed[r] for r in wanted]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            if len(parts) > 1:
                out = out.dropDuplicates(["_event_id"])
        else:
            out = df  # route-less sink: every event, pre-routing
        if has_routes:
            out = out.drop("_event_id")
        if name in ("parquet", "json"):
            obs = Observation()
            observed = out.observe(obs, F.count(F.lit(1)).alias("n"))
            writer = observed.write.mode(conf.get("mode", "overwrite"))
            if name == "parquet":
                writer.parquet(conf["path"])
            else:
                writer.json(conf["path"])
            written[conf["path"]] = int(obs.get["n"])
        elif name == "stdout":  # reference StdOutSink
            out.show(conf.get("limit", 20), truncate=False)
            written["stdout"] = out.count()
        elif name == "count":  # test sink
            written["count"] = out.count()
        else:
            raise ValueError(f"unknown sink {name!r}")
    return written
