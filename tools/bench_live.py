"""Streaming-ingest cost evidence: drain a corpus through the live index
(per-micro-batch delta build + merge) and compare total ingest cost and
final-result identity against the one-shot batch build — same JVM, same
window.

Expected shape: streaming pays the batch build cost PLUS k merges of a
growing base — the freshness tax.  Merge cost scales with posting bytes
(BENCH.md merge section), so the tax is bounded and the per-batch
latency-to-visibility is the delta build + one merge, not a rebuild.

Usage: python tools/bench_live.py [--corpus /tmp/wt480k] [--cpus 8]
        [--batches 4]
Prints one RESULT json line; fold into BENCH.md by hand.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/wt480k")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--merge-every", type=int, default=1)
    args = ap.parse_args()

    os.chdir(REPO)
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from data_prepper_spark.envtune import apply_malloc_tuning

    apply_malloc_tuning()
    from pyspark.sql import SparkSession

    from data_prepper_spark.corpus import reference_queries
    from data_prepper_spark.index.build import build_oneshot
    from data_prepper_spark.index.config import IndexConfig
    from data_prepper_spark.index.live import resolve_current, start_stream_index
    from data_prepper_spark.index.query import BM25Searcher

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("bench-live")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "10g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(args.corpus)
    n_docs = pages.count()
    n_files = len(glob.glob(os.path.join(args.corpus, "*.parquet")))
    per_trigger = max(1, n_files // args.batches)
    cfg = IndexConfig.for_corpus(n_docs, block_size=128)
    work = tempfile.mkdtemp(prefix="dps_bench_live_")

    batch_dir = os.path.join(work, "batch")
    t0 = time.perf_counter()
    build_oneshot(spark, pages, batch_dir, cfg)
    t_batch = round(time.perf_counter() - t0, 1)

    live_dir = os.path.join(work, "live")
    t0 = time.perf_counter()
    q = start_stream_index(
        spark, args.corpus, live_dir, cfg,
        checkpoint_dir=os.path.join(work, "ckpt"),
        available_now=True, max_files_per_trigger=per_trigger,
        merge_every=args.merge_every,
    )
    q.awaitTermination()
    if args.merge_every > 1:
        from data_prepper_spark.index.live import compact

        compact(spark, live_dir)
    t_stream = round(time.perf_counter() - t0, 1)

    sb = BM25Searcher(spark, batch_dir)
    sl = BM25Searcher(spark, resolve_current(live_dir))
    checked = 0
    for rq in reference_queries()[:6]:
        a = sb.search(rq["query_text"], k=rq["k"], mode="bmw")
        b = sl.search(rq["query_text"], k=rq["k"], mode="bmw")
        assert [d for d, _ in a] == [d for d, _ in b], rq["query_text"]
        checked += 1

    print(
        "RESULT "
        + json.dumps(
            {
                "corpus": args.corpus,
                "n_docs": n_docs,
                "cpus": args.cpus,
                "n_batches": -(-n_files // per_trigger),
                "merge_every": args.merge_every,
                "t_batch_build_s": t_batch,
                "t_stream_drain_s": t_stream,
                "freshness_tax": round(t_stream / t_batch, 2),
                "stream_docs_per_sec": round(n_docs / t_stream, 1),
                "rank_identity_queries_checked": checked,
            }
        )
    )
    spark.stop()

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
