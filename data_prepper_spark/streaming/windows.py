"""Streaming equivalents of the reference's stateful windows.

Reference behaviors mapped (SURVEY.md §2.8):
  - `aggregate` group_duration (processing-time tumbling per-group timer,
    AggregateGroupManager.getGroupsToConclude:29-37)  → event-time
    `window()` + watermark (principled late-data handling the reference
    lacks).
  - `tail_sampler` wait_period session gap            → `session_window`.
  - trace raw flush interval parking late children    → watermark +
    append output mode.
  - incremental index: each micro-batch tokenizes its pages and appends
    to the token staging table (foreachBatch → the batch build's
    resumable posting merge picks it up) — the streaming front of the
    accept→transform→route pipeline.

These helpers work on BOTH batch and streaming DataFrames (the Spark
unification the reference's Buffer/ProcessWorker machinery approximates
by hand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_count(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    duration: str,
    watermark: str | None = None,
    count_key: str = "value",
) -> DataFrame:
    """`aggregate`+`count` under a tumbling event-time window."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        *[F.col(k) for k in keys], F.window(F.col(ts_col), duration).alias("window")
    ).agg(F.count(F.lit(1)).alias(count_key))


def streaming_count(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    duration: str,
    watermark: str = "0 seconds",
    count_key: str = "value",
) -> DataFrame:
    return tumbling_count(df, keys, ts_col, duration, watermark, count_key)


def session_gap_agg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap: str,
    watermark: str | None = None,
) -> DataFrame:
    """`tail_sampler` wait_period analog: one row per (keys, session),
    with the session bounds and event count — the group-conclusion unit
    the reference emits after `gap` idle time."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        *[F.col(k) for k in keys],
        F.session_window(F.col(ts_col), gap).alias("session"),
    ).agg(F.count(F.lit(1)).alias("n_events"))


def streaming_incremental_tokens(
    pages_stream: DataFrame,
    staging_path: str,
    checkpoint_path: str,
    cfg=None,
):
    """Streaming front of the index build: micro-batch pages → tokenize →
    append to the token staging table.  The batch posting build (ledger-
    resumable) runs over the staging table on whatever cadence the
    deployment wants — the same split the reference has between its
    buffered ingest and its sink flush (BlockingBuffer → OpenSearchSink
    bulk)."""
    from ..index.config import IndexConfig
    from ..index.tokenize import tokenize_stage

    cfg = cfg or IndexConfig()
    tokens = tokenize_stage(pages_stream, cfg)
    return (
        tokens.writeStream.format("parquet")
        .option("path", staging_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
    )
