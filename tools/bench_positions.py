"""Positional-index cost evidence: build the same corpus with and
without positions in ONE JVM/window (host drifts across windows), report
build-time overhead, index size delta, and phrase-query latency on the
positional index.

Usage: python tools/bench_positions.py [--corpus /tmp/wt480k] [--cpus 8]
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


def _du(path: str) -> int:
    total = 0
    for dp, _, fs in os.walk(path):
        for f in fs:
            total += os.path.getsize(os.path.join(dp, f))
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/wt480k")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    os.chdir(REPO)
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from data_prepper_spark.envtune import apply_malloc_tuning

    apply_malloc_tuning()
    from pyspark.sql import SparkSession

    from data_prepper_spark.index.build import build_oneshot
    from data_prepper_spark.index.config import IndexConfig
    from data_prepper_spark.index.phrase import phrase_topk
    from data_prepper_spark.index.query import BM25Searcher

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("bench-positions")
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
    work = tempfile.mkdtemp(prefix="dps_bench_pos_")
    res = {"corpus": args.corpus, "n_docs": n_docs, "cpus": args.cpus}

    for tag, positions in (("plain", False), ("positional", True)):
        cfg = IndexConfig.for_corpus(n_docs, block_size=128, positions=positions)
        d = os.path.join(work, tag)
        t0 = time.perf_counter()
        build_oneshot(spark, pages, d, cfg)
        res[f"t_build_{tag}_s"] = round(time.perf_counter() - t0, 1)
        res[f"postings_bytes_{tag}"] = _du(os.path.join(d, "postings"))

    res["build_overhead_pct"] = round(
        100.0 * (res["t_build_positional_s"] / res["t_build_plain_s"] - 1), 1
    )
    res["postings_bytes_overhead_pct"] = round(
        100.0 * (res["postings_bytes_positional"] / res["postings_bytes_plain"] - 1),
        1,
    )

    s = BM25Searcher(spark, os.path.join(work, "positional"))
    phrases = ["the spark", "a fast", "spark index", "the data", "fast join the"]
    lat = []
    for ph in phrases:  # warm + measure
        phrase_topk(s, ph, k=10)
    for ph in phrases:
        t0 = time.perf_counter()
        hits = phrase_topk(s, ph, k=10)
        dt_dist = round((time.perf_counter() - t0) * 1000, 1)
        t0 = time.perf_counter()
        hits_drv = phrase_topk(s, ph, k=10, distributed=False)
        dt_drv = round((time.perf_counter() - t0) * 1000, 1)
        assert [d for d, _ in hits] == [d for d, _ in hits_drv], ph
        lat.append((ph, dt_dist, dt_drv, len(hits)))
    res["phrase_latencies_ms_dist_vs_driver"] = lat

    print("RESULT " + json.dumps(res))
    spark.stop()

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
