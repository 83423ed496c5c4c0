"""Dead-letter-queue / quarantine semantics (reference: failures-common
S3DlqWriter + per-processor `tags_on_failure`).

The reference routes documents that fail a sink bulk-write or a processor
parse to a DLQ object store with failure metadata
(failures-common/.../dlq/s3/S3DlqWriter.java, S3DlqProvider.java:26), and
tags events that fail a processor (`tags_on_failure` on grok/date/parse_json
etc.).  Spark-side both become one pattern: evaluate named validity checks
as Catalyst predicates, split the frame, and write the rejected side with
the reasons attached — no row ever throws.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def tag_failures(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Attach `_failure_tags array<string>` listing every failed check
    (empty array = clean row).  The `tags_on_failure` analog; pure
    column expressions, one pass."""
    tags = F.array_compact(
        F.array(
            *[F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)) for name, cond in checks.items()]
        )
    )
    return df.withColumn("_failure_tags", tags)


def quarantine(
    df: DataFrame, checks: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(good, rejected): rows failing ANY check go to the rejected frame
    with `_failure_tags` + `_quarantined_at`; good rows come back
    untouched (tags column dropped).  The caller writes `rejected` to its
    quarantine table — the S3-DLQ analog."""
    tagged = tag_failures(df, checks)
    good = tagged.filter(F.size("_failure_tags") == 0).drop("_failure_tags")
    bad = tagged.filter(F.size("_failure_tags") > 0).withColumn(
        "_quarantined_at", F.current_timestamp()
    )
    return good, bad


def write_quarantine(bad: DataFrame, path: str) -> int:
    """Append rejected rows to the quarantine parquet table; returns the
    rejected count (the DLQ write is append-only, like the reference's
    keyed S3 objects).  The count is an `observe()` metric on the write
    job itself — one job, no second pass over the DAG."""
    from pyspark.sql import Observation

    obs = Observation()
    bad.observe(obs, F.count(F.lit(1)).alias("n")).write.mode("append").parquet(path)
    return int(obs.get["n"])
