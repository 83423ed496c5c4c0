"""Merge-vs-rebuild evidence: time a segment merge of two half-corpus
indexes against a from-scratch full-corpus build on the same input, same
JVM, same window (host throughput drifts ±40% across windows — see
BENCH.md), and spot-check rank identity merged-vs-full.

The claim under test: incremental ingest at 10^12 docs should pay
~O(postings bytes) for a merge (posting-row union + tf/dl decode for the
bound recompute — no tokenize, no extraction, no posting shuffle), not
the full rebuild cost.

Usage:
  python tools/bench_merge.py [--corpus /tmp/wt480k] [--cpus 8]
Prints one RESULT json line; fold into BENCH.md by hand.
"""

from __future__ import annotations

import argparse
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
    args = ap.parse_args()

    os.chdir(REPO)
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from data_prepper_spark.envtune import apply_malloc_tuning

    apply_malloc_tuning()
    from pyspark.sql import SparkSession, functions as F

    from data_prepper_spark.corpus import reference_queries
    from data_prepper_spark.index.build import build_oneshot
    from data_prepper_spark.index.config import IndexConfig
    from data_prepper_spark.index.merge import merge_indexes
    from data_prepper_spark.index.query import BM25Searcher

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("bench-merge")
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
    cfg = IndexConfig.for_corpus(n_docs, block_size=128)
    work = tempfile.mkdtemp(prefix="dps_bench_merge_")

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return out, round(time.perf_counter() - t0, 1)

    full_dir = os.path.join(work, "full")
    _, t_full = timed(lambda: build_oneshot(spark, pages, full_dir, cfg))

    halves, t_halves = [], []
    for i in range(2):
        d = os.path.join(work, f"half{i}")
        part = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == i)
        _, t = timed(lambda p=part, dd=d: build_oneshot(spark, p, dd, cfg))
        halves.append(d)
        t_halves.append(t)

    merged_dir = os.path.join(work, "merged")
    _, t_merge = timed(lambda: merge_indexes(spark, halves, merged_dir))

    # rank identity merged vs full (exact float compare)
    sf, sm = BM25Searcher(spark, full_dir), BM25Searcher(spark, merged_dir)
    checked = 0
    for q in reference_queries()[:6]:
        a = sf.search(q["query_text"], k=q["k"], mode="bmw")
        b = sm.search(q["query_text"], k=q["k"], mode="bmw")
        assert [d for d, _ in a] == [d for d, _ in b], q["query_text"]
        assert all(abs(x - y) < 1e-9 for (_, x), (_, y) in zip(a, b)), q["query_text"]
        checked += 1

    print(
        "RESULT "
        + json.dumps(
            {
                "corpus": args.corpus,
                "n_docs": n_docs,
                "cpus": args.cpus,
                "t_full_build_s": t_full,
                "t_half_builds_s": t_halves,
                "t_merge_s": t_merge,
                "merge_speedup_vs_rebuild": round(t_full / t_merge, 1),
                "merge_docs_per_sec": round(n_docs / t_merge, 1),
                "rank_identity_queries_checked": checked,
            }
        )
    )
    spark.stop()

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
