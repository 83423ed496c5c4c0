"""Pipeline + remaining metric/bucket aggregations over the match set
(index/filtered.py): date_histogram→stats parent, derivative /
cumulative_sum / moving_avg / bucket_sort / bucket_selector / sibling
bucket stats, percentile_ranks, value_count, weighted_avg, filters,
date_range, rare_terms, multi_terms, auto_date_histogram — driver ==
distributed == a pure-python oracle on the tiny corpus."""

import os

import numpy as np
import pytest

from data_prepper_spark.hashing import xxh64_signed
from data_prepper_spark.index.query import BM25Searcher

QTEXT = "the data"


@pytest.fixture(scope="session")
def agg2_index(spark, tiny_corpus_path, workdir):
    """agg_index plus a second numeric docvalue (prio, url-derived so a
    pure-python oracle recomputes it) for weighted_avg / multi_terms."""
    from pyspark.sql import functions as F

    from data_prepper_spark.index.build import build_oneshot
    from data_prepper_spark.index.config import IndexConfig

    index_dir = os.path.join(workdir, "index_agg_pipeline")
    pages = (
        spark.read.parquet(tiny_corpus_path)
        .withColumn("n_chars", F.length("text"))
        .withColumn("prio", (F.length("url") % 7 + 1).cast("long"))
    )
    cfg = IndexConfig(range_bits=2, block_size=16, n_buckets=8)
    build_oneshot(spark, pages, index_dir, cfg,
                  field_cols=("lang", "warc_ts", "n_chars", "prio"))
    return index_dir


@pytest.fixture(scope="session")
def matched_docs(oracle_tiny, tiny_pages_pd):
    matched = set()
    for t in QTEXT.split():
        matched |= set(oracle_tiny.postings.get(t, ()))
    by_doc = {}
    for r in tiny_pages_pd.itertuples(index=False):
        d = xxh64_signed(r.url)
        if d in matched:
            by_doc[d] = {
                "n_chars": len(r.text),
                "prio": len(r.url) % 7 + 1,
                "lang": r.lang,
                "ts": r.warc_ts.to_pydatetime(),
            }
    return by_doc


def test_date_histogram_stats_and_pipeline(spark, agg2_index, matched_docs):
    from data_prepper_spark.index.filtered import (
        bucket_sort_buckets,
        bucket_stats_from_buckets,
        match_agg_date_histogram_stats,
        pipeline_from_buckets,
    )

    s = BM25Searcher(spark, agg2_index)
    by_bucket = {}
    for rec in matched_docs.values():
        b = rec["ts"].strftime("%Y-%m-%dT%H:%M")  # numpy minute-unit label
        by_bucket.setdefault(b, []).append(rec["n_chars"])
    want = [
        (b, len(v), sum(v), min(v), max(v))
        for b, v in sorted(by_bucket.items())
    ]
    got = match_agg_date_histogram_stats(
        s, QTEXT, "warc_ts", "minute", "n_chars"
    )
    assert got == want
    assert match_agg_date_histogram_stats(
        s, QTEXT, "warc_ts", "minute", "n_chars", distributed=True
    ) == got

    # pipeline transforms over the parent buckets (pure fold checks)
    p = pipeline_from_buckets(got, mavg_window=3)
    sums = [r[2] for r in got]
    assert [r[3] for r in p] == list(np.cumsum(sums))
    assert p[0][4] is None
    assert [r[4] for r in p[1:]] == [
        sums[i] - sums[i - 1] for i in range(1, len(sums))
    ]
    for i, r in enumerate(p):
        w = sums[max(0, i - 2): i + 1]
        assert r[5] == sum(w) * 10**4 // len(w)

    st = bucket_stats_from_buckets(got)
    assert st == {
        "n_buckets": len(sums), "sum": sum(sums), "min": min(sums),
        "max": max(sums), "avg_e4": sum(sums) * 10**4 // len(sums),
    }

    floor = sorted(r[1] for r in got)[len(got) // 2]
    top = bucket_sort_buckets(got, min_n=floor, k=3)
    kept = sorted(
        (r for r in got if r[1] >= floor), key=lambda r: (-r[2], r[0])
    )[:3]
    assert top == kept

    # serial_diff: lag-n difference, first lag buckets None
    from data_prepper_spark.index.filtered import serial_diff_from_buckets

    for lag in (1, 2, 3):
        sd = serial_diff_from_buckets(got, lag=lag)
        assert [r[3] for r in sd[:lag]] == [None] * min(lag, len(sd))
        assert [r[3] for r in sd[lag:]] == [
            sums[i] - sums[i - lag] for i in range(lag, len(sums))
        ]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        serial_diff_from_buckets(got, lag=0)


def test_percentile_ranks_value_count_weighted_avg(
    spark, agg2_index, matched_docs
):
    from data_prepper_spark.index.filtered import (
        match_agg_percentile_ranks,
        match_agg_value_count,
        match_agg_weighted_avg,
    )

    s = BM25Searcher(spark, agg2_index)
    vals = sorted(r["n_chars"] for r in matched_docs.values())
    n = len(vals)
    probes = [vals[0] - 1, vals[n // 2], vals[-1]]
    want = [
        (x, sum(v <= x for v in vals) * 100 * 10**4 // n) for x in probes
    ]
    got = match_agg_percentile_ranks(s, QTEXT, "n_chars", probes)
    assert got == want
    assert match_agg_percentile_ranks(
        s, QTEXT, "n_chars", probes, distributed=True
    ) == got

    assert match_agg_value_count(s, QTEXT, "n_chars") == n
    assert match_agg_value_count(
        s, QTEXT, "n_chars", distributed=True
    ) == n

    s_vw = sum(r["n_chars"] * r["prio"] for r in matched_docs.values())
    s_w = sum(r["prio"] for r in matched_docs.values())
    want_wa = {
        "n": n, "sum_vw": s_vw, "sum_w": s_w,
        "wavg_e4": s_vw * 10**4 // s_w,
    }
    wa = match_agg_weighted_avg(s, QTEXT, "n_chars", "prio")
    assert wa == want_wa
    assert match_agg_weighted_avg(
        s, QTEXT, "n_chars", "prio", distributed=True
    ) == want_wa


def test_filters_date_range_rare_multi(spark, agg2_index, matched_docs):
    from data_prepper_spark.index.filtered import (
        match_agg_date_range,
        match_agg_filters,
        match_agg_multi_terms,
        match_agg_rare_terms,
    )

    s = BM25Searcher(spark, agg2_index)
    vals = sorted(r["n_chars"] for r in matched_docs.values())
    med = vals[len(vals) // 2]
    named = [
        ("short", [("n_chars", "<", med)]),
        ("long", [("n_chars", ">=", med)]),
        ("all", []),
    ]
    want_f = [
        ("short", sum(v < med for v in vals)),
        ("long", sum(v >= med for v in vals)),
        ("all", len(vals)),
    ]
    got_f = match_agg_filters(s, QTEXT, named, "n_chars")
    assert got_f == want_f
    assert match_agg_filters(
        s, QTEXT, named, "n_chars", distributed=True
    ) == want_f

    tss = sorted(r["ts"] for r in matched_docs.values())
    cut = tss[len(tss) // 2].isoformat(sep=" ")
    ranges = [("early", None, cut), ("late", cut, None), ("none",
               "2030-01-01", None)]
    want_dr = [
        ("early", sum(t < np.datetime64(cut) for t in
                      np.array(tss, dtype="datetime64[us]"))),
        ("late", sum(t >= np.datetime64(cut) for t in
                     np.array(tss, dtype="datetime64[us]"))),
        ("none", 0),
    ]
    got_dr = match_agg_date_range(s, QTEXT, "warc_ts", ranges)
    assert got_dr == want_dr
    assert match_agg_date_range(
        s, QTEXT, "warc_ts", ranges, distributed=True
    ) == want_dr

    counts = {}
    for v in vals:
        counts[v] = counts.get(v, 0) + 1
    want_rare = sorted(
        ((v, c) for v, c in counts.items() if c <= 2),
        key=lambda t: (t[1], t[0]),
    )
    got_rare = match_agg_rare_terms(s, QTEXT, "n_chars", max_doc_count=2)
    assert got_rare == want_rare
    assert match_agg_rare_terms(
        s, QTEXT, "n_chars", max_doc_count=2, distributed=True
    ) == want_rare

    tuples = {}
    for r in matched_docs.values():
        key = (r["lang"], r["prio"])
        tuples[key] = tuples.get(key, 0) + 1
    want_mt = sorted(
        ((k[0], k[1], c) for k, c in tuples.items()),
        key=lambda t: (-t[-1], t[:-1]),
    )[:5]
    got_mt = match_agg_multi_terms(s, QTEXT, ["lang", "prio"], k=5)
    assert got_mt == want_mt
    assert match_agg_multi_terms(
        s, QTEXT, ["lang", "prio"], k=5, distributed=True
    ) == want_mt


def test_auto_date_histogram(spark, agg2_index, matched_docs):
    from data_prepper_spark.index.filtered import (
        match_agg_auto_date_histogram,
    )

    s = BM25Searcher(spark, agg2_index)
    tss = [r["ts"] for r in matched_docs.values()]
    n_min = len({t.replace(second=0, microsecond=0) for t in tss})
    n_hr = len({t.replace(minute=0, second=0, microsecond=0) for t in tss})
    assert n_min > 10 >= n_hr  # the tiny corpus spans minutes, not hours

    iv, buckets = match_agg_auto_date_histogram(
        s, QTEXT, "warc_ts", max_buckets=10
    )
    assert iv == "hour"
    by_b = {}
    for t in tss:
        b = t.replace(minute=0, second=0, microsecond=0)
        by_b[b] = by_b.get(b, 0) + 1
    assert buckets == [
        (b.isoformat(sep=" "), c) for b, c in sorted(by_b.items())
    ]

    iv2, buckets2 = match_agg_auto_date_histogram(
        s, QTEXT, "warc_ts", max_buckets=n_min
    )
    assert iv2 == "minute"
    assert sum(c for _, c in buckets2) == len(tss)
    assert match_agg_auto_date_histogram(
        s, QTEXT, "warc_ts", max_buckets=10, distributed=True
    ) == (iv, buckets)


def test_sibling_pipeline_completions(spark, agg2_index, matched_docs):
    """min/max_bucket (tie keys), percentiles_bucket,
    extended_stats_bucket, normalize, moving_percentiles — pure folds
    over the parent buckets, each vs direct arithmetic."""
    import math

    from data_prepper_spark.index.filtered import (
        extended_stats_bucket_from_buckets,
        extremal_bucket_from_buckets,
        match_agg_date_histogram_stats,
        moving_percentiles_from_buckets,
        normalize_from_buckets,
        percentiles_bucket_from_buckets,
    )

    s = BM25Searcher(spark, agg2_index)
    got = match_agg_date_histogram_stats(
        s, QTEXT, "warc_ts", "minute", "n_chars"
    )
    sums = [r[2] for r in got]
    n, tot = len(sums), sum(sums)

    mx, keys = extremal_bucket_from_buckets(got, "max")
    assert mx == max(sums)
    assert keys == sorted(str(r[0]) for r in got if r[2] == mx)
    mn, keys_n = extremal_bucket_from_buckets(got, "min")
    assert mn == min(sums)
    assert keys_n == sorted(str(r[0]) for r in got if r[2] == mn)
    with pytest.raises(ValueError):
        extremal_bucket_from_buckets(got, "median")

    ss = sorted(sums)
    for p, v in percentiles_bucket_from_buckets(
        got, (25.0, 50.0, 75.0, 100.0)
    ):
        assert v == ss[max(1, math.ceil(p / 100 * n)) - 1], p

    st = extended_stats_bucket_from_buckets(got)
    ssq = sum(v * v for v in sums)
    assert st == {
        "n_buckets": n, "sum": tot, "min": min(sums), "max": max(sums),
        "sum_sq": ssq, "var_e4": ((n * ssq - tot * tot) * 10**4) // (n * n),
    }

    for _b, _cnt, sv, e6 in normalize_from_buckets(got, "percent_of_sum"):
        assert e6 == sv * 10**6 // tot
    lo, hi = min(sums), max(sums)
    for _b, _cnt, sv, e6 in normalize_from_buckets(got, "rescale_0_1"):
        assert e6 == (sv - lo) * 10**6 // (hi - lo)
    with pytest.raises(ValueError):
        normalize_from_buckets(got, "softmax")
    one = [got[0]]
    assert normalize_from_buckets(one, "rescale_0_1")[0][3] is None

    mp = moving_percentiles_from_buckets(got, window=3, percents=(50.0,))
    for i, (_b, _cnt, _sv, d) in enumerate(mp):
        w = sorted(sums[max(0, i - 2): i + 1])
        assert d[50.0] == w[max(1, math.ceil(0.5 * len(w))) - 1], i


def test_cumulative_cardinality(spark, agg2_index, matched_docs):
    """cumulative_cardinality: first-bucket attribution + accumulation
    vs a brute per-bucket distinct-set fold; driver == distributed."""
    from collections import Counter

    from data_prepper_spark.index.filtered import (
        match_agg_cumulative_cardinality,
    )

    s = BM25Searcher(spark, agg2_index)
    by_bucket = {}
    for rec in matched_docs.values():
        b = rec["ts"].strftime("%Y-%m-%dT%H:%M")
        by_bucket.setdefault(b, set()).add(rec["prio"])
    first = {}
    for b in sorted(by_bucket):
        for v in by_bucket[b]:
            if v not in first:
                first[v] = b
    cnts = Counter(first.values())
    want, cum = [], 0
    for b in sorted(by_bucket):
        cum += cnts.get(b, 0)
        want.append((b, cum))
    got = match_agg_cumulative_cardinality(
        s, QTEXT, "warc_ts", "minute", "prio"
    )
    assert got == want
    assert want[-1][1] == len({v for vs in by_bucket.values() for v in vs})
    assert match_agg_cumulative_cardinality(
        s, QTEXT, "warc_ts", "minute", "prio", distributed=True
    ) == want
