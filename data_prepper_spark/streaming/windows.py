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


def stateful_count_conclude(
    df: DataFrame,
    keys: list[str],
    threshold: int,
    timeout_ms: int = 60_000,
):
    """`aggregate`+`count` with the reference's CUSTOM group-conclusion
    rule — emit a group's count when it reaches `threshold` OR when the
    group has been idle for `timeout_ms` — via applyInPandasWithState.

    This is the one §2.8 shape the built-in windows can't express: the
    reference's AggregateGroupManager holds per-group mutable state and a
    per-group timer (AggregateGroupManager.getGroupsToConclude:29-37,
    AggregateProcessor.doExecute counting into group state); Spark's
    GroupState carries the running count, ProcessingTimeTimeout plays the
    conclude timer.  Output rows: (keys…, n, concluded_by) where
    concluded_by ∈ {'threshold', 'timeout'}.

    State is one long per group — at 10^9 groups this is exactly the
    partitioned state store Structured Streaming shards by the groupBy
    key (the peer-forwarder hash ring, managed)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_fields = ", ".join(f"`{k}` string" for k in keys)
    out_schema = f"{key_fields}, n long, concluded_by string"
    state_schema = "n long"

    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame([(*key, n, "timeout")], columns=[*keys, "n", "concluded_by"])
            return
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        if n >= threshold:
            state.remove()
            yield pd.DataFrame(
                [(*key, n, "threshold")], columns=[*keys, "n", "concluded_by"]
            )
        else:
            state.update((n,))
            state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(columns=[*keys, "n", "concluded_by"])

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


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
