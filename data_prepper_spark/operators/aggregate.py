"""`aggregate` processor + actions, and the stateful trace operators
(reference: aggregate-processor, service-map-stateful, otel-trace-raw).

The reference shuffles events to peers by identification-key hash
(AggregateProcessor.java:30,151-154 → HashRing.java:52-78) and holds
per-group mutable state until a processing-time window closes
(AggregateGroupManager.java:29-37).  In Spark every action below is a
plain groupBy over (identification_keys…, window(ts)) — the shuffle IS
the peer forwarder, partial aggregation is map-side-combined by the hash
aggregate, and event-time windows are strictly stronger than the
reference's processing-time timers (SURVEY.md §2.6, §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _grp(df: DataFrame, keys: list[str], ts_col: str | None, duration: str | None):
    cols = [F.col(k) for k in keys]
    if ts_col is not None and duration is not None:
        cols.append(F.window(F.col(ts_col), duration).alias("window"))
    return df.groupBy(*cols)


def agg_count(
    df: DataFrame,
    identification_keys: list[str],
    ts_col: str | None = None,
    group_duration: str | None = None,
    count_key: str = "value",
) -> DataFrame:
    """`count` action (CountAggregateAction.java:33,62-68): events per
    group (+ window), emitted under `count_key` (default key is
    `aggr._count` in raw format)."""
    return _grp(df, identification_keys, ts_col, group_duration).agg(
        F.count(F.lit(1)).alias(count_key)
    )


def agg_histogram(
    df: DataFrame,
    identification_keys: list[str],
    key: str,
    buckets: list[float],
    ts_col: str | None = None,
    group_duration: str | None = None,
) -> DataFrame:
    """`histogram` action (HistogramAggregateAction.java:38,105-151):
    fixed explicit bucket bounds (binarySearch insert ≈ width_bucket),
    tracking count/sum/min/max + per-bucket counts.

    Bucket semantics match the reference: value < buckets[0] → underflow
    bucket 0; buckets[i] <= v < buckets[i+1] → bucket i+1; v >=
    buckets[-1] → overflow bucket len(buckets).  Bucket counts come back
    as an array column `bucket_counts` (aggregate over width_bucket —
    one shuffle, no per-bucket passes)."""
    v = F.col(key)
    # general (non-uniform) bounds via chained whens — folds to a single
    # codegen CASE; width_bucket would cover only uniform widths
    b: Column = F.lit(0)
    for i, bound in enumerate(buckets):
        b = F.when(v >= F.lit(float(bound)), F.lit(i + 1)).otherwise(b)
    g = _grp(df.withColumn("_bkt", b), identification_keys, ts_col, group_duration)
    n_b = len(buckets) + 1
    return g.agg(
        F.count(F.lit(1)).alias("count"),
        F.sum(v).alias("sum"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.array(
            *[F.sum(F.when(F.col("_bkt") == i, 1).otherwise(0)) for i in range(n_b)]
        ).alias("bucket_counts"),
    )


def agg_put_all(
    df: DataFrame,
    identification_keys: list[str],
    value_cols: list[str],
    ts_col: str,
    group_duration: str | None = None,
) -> DataFrame:
    """`put_all` action (PutAllAggregateAction.java:25): merge all events'
    fields, last-write-wins in arrival order → max_by(ts) per column."""
    g = _grp(df, identification_keys, ts_col if group_duration else None, group_duration)
    return g.agg(*[F.max_by(c, F.col(ts_col)).alias(c) for c in value_cols])


def agg_append(
    df: DataFrame,
    identification_keys: list[str],
    append_cols: list[str],
    ts_col: str | None = None,
    group_duration: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """`append` action (AppendAggregateAction.java:33): values per key
    collected into lists.  This is the posting-list-build shape —
    groupBy(term).agg(collect_list) — shared with index/build.py."""
    g = _grp(df, identification_keys, ts_col, group_duration)
    aggs = []
    for c in append_cols:
        a = F.collect_list(c)
        if sort:
            a = F.array_sort(a)
        aggs.append(a.alias(c))
    return g.agg(*aggs)


def remove_duplicates(
    df: DataFrame,
    identification_keys: list[str],
    order_by: list[str],
) -> DataFrame:
    """`remove_duplicates` action (RemoveDuplicatesAggregateAction.java:20):
    keep the FIRST event per group.  "First" needs a deterministic order
    in a distributed engine → explicit order_by tiebreak (the reference's
    arrival order is single-node luck).  row_number window, one shuffle."""
    w = Window.partitionBy(*identification_keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def percent_sampler(df: DataFrame, percent: float, key_col: str) -> DataFrame:
    """`percent_sampler` action (PercentSamplerAggregateAction.java:21):
    keep `percent`% of events.  Deterministic variant: hash-mod on a key
    column so the sample is stable across retries/cluster sizes (the
    reference's running-count approach is order-dependent)."""
    return df.filter(F.pmod(F.xxhash64(F.col(key_col)), F.lit(10000)) < F.lit(int(percent * 100)))


def rate_limiter(
    df: DataFrame,
    identification_keys: list[str],
    events_per_second: int,
    ts_col: str,
) -> DataFrame:
    """`rate_limiter` action (RateLimiterAggregateAction.java:22) with
    `when_exceeds: drop`, recast for batch: keep at most N events per
    group per 1-second window, earliest-first (deterministic)."""
    w = Window.partitionBy(
        *identification_keys, F.date_trunc("second", F.col(ts_col))
    ).orderBy(F.col(ts_col), *[F.col(k) for k in identification_keys])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= events_per_second)
        .drop("_rn")
    )


def tail_sampler(
    df: DataFrame,
    group_keys: list[str],
    error_cond: Column,
    percent: float,
    sample_key: str,
) -> DataFrame:
    """`tail_sampler` action (TailSamplerAggregateAction.java:29): emit ALL
    events of a group iff any event in the group matched the error
    condition, else admit the group with `percent`% probability
    (deterministic hash of `sample_key` — the configured sampling basis).
    One aggregation + one semi-join-free window max — no second scan."""
    w = Window.partitionBy(*group_keys)
    keep_group = F.max(F.when(error_cond, 1).otherwise(0)).over(w) == 1
    sampled = F.pmod(F.xxhash64(F.col(sample_key)), F.lit(10000)) < F.lit(
        int(percent * 100)
    )
    return df.withColumn("_keep", keep_group | sampled).filter(F.col("_keep")).drop("_keep")


# ------------------------------------------------------------- service map

def service_map(
    spans: DataFrame,
    trace_col: str = "traceId",
    span_col: str = "spanId",
    parent_col: str = "parentSpanId",
    service_col: str = "serviceName",
    kind_col: str = "spanKind",
) -> DataFrame:
    """`service_map_stateful` (ServiceMapStatefulProcessor.java:195-243):
    the reference's MapDB-windowed child↔parent lookup is a plain
    self-equi-join on (traceId, parentSpanId=spanId) + dropDuplicates.
    Emits distinct (serviceName, kind, destination) edges.

    Scale note: the join shuffles both sides by (traceId, spanId) — at
    10^9 spans this is exactly the partitioning a real deployment wants;
    AQE handles trace-size skew (skew-join split)."""
    child = spans.alias("c")
    parent = spans.alias("p")
    edges = child.join(
        parent,
        (F.col(f"c.{trace_col}") == F.col(f"p.{trace_col}"))
        & (F.col(f"c.{parent_col}") == F.col(f"p.{span_col}")),
        "inner",
    ).filter(F.col(f"p.{service_col}") != F.col(f"c.{service_col}"))
    return edges.select(
        F.col(f"p.{service_col}").alias("serviceName"),
        F.col(f"c.{kind_col}").alias("kind"),
        F.col(f"c.{service_col}").alias("destination"),
    ).dropDuplicates()


def adjacent_pairs(
    df: DataFrame,
    group_key: str,
    ts_col: str,
    label_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Ordered-adjacency edges within a group (the event-stream analog of
    the span parent/child join): for each group ordered by (ts, tiebreak),
    emit (prev_label → label) pairs with counts."""
    w = Window.partitionBy(group_key).orderBy(F.col(ts_col), F.col(tiebreak_col))
    pairs = (
        df.withColumn("_prev", F.lag(F.col(label_col)).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("src"), F.col(label_col).alias("dst"))
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return pairs
