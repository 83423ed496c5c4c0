"""Continuous ingestion → live index (Structured Streaming foreachBatch).

The north star's accept→filter→transform→index pipeline, run as a
STREAM: each micro-batch of new pages builds a DELTA index (the normal
one-shot build, unchanged) and MERGES it into the serving index via
index/merge.py — Lucene's segment-commit model recast on Spark's
exactly-once micro-batch engine.

Layout under *index_dir*:
    CURRENT            — "<version>,<last_batch_id>" (atomic pointer)
    v=<N>/             — full index directories (the merge outputs)
    _delta/batch=<id>/ — per-batch delta indexes (pruned after merge)

Consistency story:
  - Spark's streaming checkpoint replays an unacknowledged batch after a
    crash; the CURRENT pointer carries last_batch_id, so a replayed
    batch is detected and SKIPPED (idempotent foreachBatch — the
    standard exactly-once sink pattern).  A crash inside the merge
    itself resumes through the merge ledger (no recompute).
  - Readers resolve CURRENT once per searcher open; versions are whole
    directories, so an in-flight reader on v=N is never mutated by the
    commit of v=N+1 (snapshot isolation by immutability — the Iceberg
    table-version model applied to index segments).
  - Old versions are pruned keeping `keep_versions` behind CURRENT.

Reference anchor: the opensearch sink's bulk-ingest + refresh lifecycle
(data-prepper-plugins/opensearch — documents stream in, Lucene commits
segments, readers see the new point-in-time view on refresh).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from .build import build_oneshot
from .config import IndexConfig
from .merge import merge_indexes


def _read_current(index_dir: str) -> tuple[int, int] | None:
    p = os.path.join(index_dir, "CURRENT")
    if not os.path.exists(p):
        return None
    v, b = open(p).read().strip().split(",")
    return int(v), int(b)


def _write_current(index_dir: str, version: int, batch_id: int) -> None:
    p = os.path.join(index_dir, "CURRENT")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"{version},{batch_id}")
    os.replace(tmp, p)  # atomic pointer swap


def resolve_current(index_dir: str) -> str:
    """Directory a searcher should open: the CURRENT version of a live
    index, or *index_dir* itself for a plain batch-built index."""
    cur = _read_current(index_dir)
    return index_dir if cur is None else os.path.join(index_dir, f"v={cur[0]}")


def _prune(index_dir: str, current_version: int, keep_versions: int) -> None:
    for name in os.listdir(index_dir):
        if name.startswith("v="):
            v = int(name.split("=", 1)[1])
            if v < current_version - keep_versions:
                shutil.rmtree(os.path.join(index_dir, name), ignore_errors=True)


def apply_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    cfg: IndexConfig,
    keep_versions: int = 1,
    builder=build_oneshot,
) -> None:
    """Index one micro-batch: delta build → merge → pointer swap.
    Idempotent on batch_id (replays after a crash are skipped)."""
    cur = _read_current(index_dir)
    if cur is not None and batch_id <= cur[1]:
        return  # replayed batch — already committed
    if batch_df.isEmpty():
        if cur is not None:
            _write_current(index_dir, cur[0], batch_id)
        return
    delta = os.path.join(index_dir, "_delta", f"batch={batch_id}")
    shutil.rmtree(delta, ignore_errors=True)  # partial replay leftovers
    builder(spark, batch_df, delta, cfg)
    os.makedirs(index_dir, exist_ok=True)
    if cur is None:
        dest = os.path.join(index_dir, "v=0")
        shutil.rmtree(dest, ignore_errors=True)
        shutil.move(delta, dest)
        _write_current(index_dir, 0, batch_id)
    else:
        v_new = cur[0] + 1
        dest = os.path.join(index_dir, f"v={v_new}")
        shutil.rmtree(dest, ignore_errors=True)
        merge_indexes(
            spark, [os.path.join(index_dir, f"v={cur[0]}"), delta], dest
        )
        _write_current(index_dir, v_new, batch_id)
        shutil.rmtree(delta, ignore_errors=True)
        _prune(index_dir, v_new, keep_versions)


def start_stream_index(
    spark: SparkSession,
    source_path: str,
    index_dir: str,
    cfg: IndexConfig = IndexConfig(),
    checkpoint_dir: str | None = None,
    schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    builder=build_oneshot,
):
    """Start the live-index stream over a parquet directory of pages.

    available_now=True drains the existing files and stops (the test /
    backfill mode); False tails the directory continuously.  *builder*
    swaps the per-batch build (build_oneshot for the pages shape,
    build_oneshot_text for (doc_id, text) tables — pass the matching
    *schema*).  Returns the StreamingQuery."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_batch(spark, df, bid, index_dir, cfg, builder=builder)
    ).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(index_dir, "_checkpoint"),
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
