"""Time-partitioned index families (index/family.py) — the opensearch
sink's dynamic index pattern (%{yyyy.MM.dd}, OpenSearchSink.java:144-150)
+ cross-index search with dfs_query_then_fetch global stats.

The exactness claim under test: a FamilySearcher over ALL periods must
be rank-identical to ONE index built over the same docs, because per-term
df / N / avgdl are summed from the segments' additive stored stats and
each segment scores brute with those global values."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_prepper_spark.corpus import reference_queries
from data_prepper_spark.index.build import build_oneshot
from data_prepper_spark.index.config import IndexConfig
from data_prepper_spark.index.family import FamilySearcher, build_family
from data_prepper_spark.index.query import BM25Searcher

CFG = IndexConfig(range_bits=2, block_size=16, n_buckets=8)
PATTERN = "mm"  # minute-of-hour: the tiny corpus spans ~17 minutes


@pytest.fixture(scope="module")
def family_root(spark, tiny_corpus_path, workdir):
    root = os.path.join(workdir, "index_family")
    pages = spark.read.parquet(tiny_corpus_path)
    # parallelism=2 exercises the concurrent per-period build path; the
    # rank-identity tests below prove it equals the sequential result
    manifest = build_family(
        spark, pages, root, CFG, ts_col="warc_ts", pattern=PATTERN,
        mode="pages", parallelism=2,
    )
    return root, manifest


def test_manifest_and_segments(family_root):
    root, manifest = family_root
    assert manifest["pattern"] == PATTERN
    assert len(manifest["periods"]) >= 3
    for p in manifest["periods"]:
        seg = os.path.join(root, f"p={p}")
        assert os.path.isdir(os.path.join(seg, "postings"))
        assert os.path.isdir(os.path.join(seg, "stats"))


def test_family_stats_sum_to_full(spark, family_root, tiny_index):
    root, manifest = family_root
    _, _, fstats = tiny_index
    fs = FamilySearcher(spark, root)
    segs = [fs._searcher(p) for p in fs.periods]
    assert sum(s.n_docs for s in segs) == fstats["n_docs"]
    assert (
        sum(int(s.stats["total_tokens"]) for s in segs)
        == fstats["total_tokens"]
    )


def test_all_periods_rank_identical_to_single_index(
    spark, family_root, tiny_index
):
    root, _ = family_root
    index_dir, _, _ = tiny_index
    fs = FamilySearcher(spark, root)
    single = BM25Searcher(spark, index_dir)
    for q in [q["query_text"] for q in reference_queries()][:12]:
        want = single.search(q, k=10, mode="brute")
        got = fs.search(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        assert np.allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-9
        ), q


def test_range_selection_matches_subset_build(
    spark, family_root, tiny_corpus_path, workdir
):
    """A period RANGE must score like one index over just those docs."""
    root, manifest = family_root
    lo, hi = manifest["periods"][1], manifest["periods"][3]
    fs = FamilySearcher(spark, root)
    assert fs.covered(lo, hi) == manifest["periods"][1:4]
    pages = spark.read.parquet(tiny_corpus_path).filter(
        F.date_format("warc_ts", PATTERN).between(lo, hi)
    )
    sub_dir = os.path.join(workdir, "index_family_subset")
    build_oneshot(spark, pages, sub_dir, CFG)
    sub = BM25Searcher(spark, sub_dir)
    for q in [q["query_text"] for q in reference_queries()][:8]:
        want = sub.search(q, k=10, mode="brute")
        got = fs.search(q, k=10, start=lo, end=hi)
        assert [d for d, _ in got] == [d for d, _ in want], q
        assert np.allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-9
        ), q


@pytest.fixture(scope="module")
def live_family_root(spark, tiny_corpus_path, workdir):
    """Streamed family: same corpus, ingested via start_stream_family
    (one file per micro-batch), each period a live index."""
    from data_prepper_spark.index.live import start_stream_family

    root = os.path.join(workdir, "live_family")
    q = start_stream_family(
        spark, tiny_corpus_path, root, CFG,
        checkpoint_dir=os.path.join(workdir, "live_family_ckpt"),
        ts_col="warc_ts", pattern=PATTERN,
        available_now=True, max_files_per_trigger=2,
    )
    q.awaitTermination(600)
    assert not q.isActive
    return root


def test_live_family_rank_identical_to_single_index(
    spark, live_family_root, family_root, tiny_index
):
    """Streaming ingest into a family (per-period live indexes, no
    manifest) must be invisible to queries: ranks equal both the
    batch-built family and one index over the whole corpus."""
    index_dir, _, _ = tiny_index
    _, manifest = family_root
    fs = FamilySearcher(spark, live_family_root)
    assert fs.manifest is None  # discovered from layout, not manifest
    assert fs.periods == sorted(manifest["periods"])
    single = BM25Searcher(spark, index_dir)
    for q in [q["query_text"] for q in reference_queries()][:10]:
        want = single.search(q, k=10, mode="brute")
        got = fs.search(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        assert np.allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-9
        ), q


def test_live_family_upsert_replaces_not_duplicates(
    spark, live_family_root, tiny_corpus_path
):
    """Re-ingesting docs in a later batch must upsert (one copy per
    doc_id per period), and a replayed batch_id must be a no-op —
    apply_batch's idempotence applied per period."""
    from data_prepper_spark.index.live import apply_batch_family

    fs = FamilySearcher(spark, live_family_root)
    n_before = sum(fs._searcher(p).n_docs for p in fs.periods)
    sub = spark.read.parquet(tiny_corpus_path).limit(40)
    # a batch_id far beyond any committed watermark → real upsert
    apply_batch_family(
        spark, sub, 10_000, live_family_root, CFG, ts_col="warc_ts",
        pattern=PATTERN,
    )
    fs2 = FamilySearcher(spark, live_family_root)  # reopen: new snapshot
    assert sum(fs2._searcher(p).n_docs for p in fs2.periods) == n_before
    # replay of the same batch_id: every period skips (watermarks advanced)
    apply_batch_family(
        spark, sub, 10_000, live_family_root, CFG, ts_col="warc_ts",
        pattern=PATTERN,
    )
    fs3 = FamilySearcher(spark, live_family_root)
    assert sum(fs3._searcher(p).n_docs for p in fs3.periods) == n_before


def test_retention_drop_is_directory_delete(spark, family_root):
    """Dropping a period = removing its segment + manifest edit
    (family.drop_period); queries over the remaining range never touch
    the dropped dir.  Runs last in the module: it mutates the fixture."""
    from data_prepper_spark.index.family import drop_period

    root, manifest = family_root
    fs = FamilySearcher(spark, root)
    keep = manifest["periods"][1:]
    got = fs.search("the", k=5, periods=keep)
    assert len(got) > 0
    # k=None returns every match, callers re-rank with their tie rule
    all_hits = fs.search("the", k=None, periods=keep)
    assert len(all_hits) >= len(got)
    assert sorted(all_hits, key=lambda h: (-h[1], h[0]))[:5] == got

    dropped = manifest["periods"][0]
    assert drop_period(root, dropped) is True
    assert not os.path.isdir(os.path.join(root, f"p={dropped}"))
    fs2 = FamilySearcher(spark, root)  # reopen: manifest no longer lists it
    assert fs2.periods == keep
    assert fs2.search("the", k=5) == got  # full range ≡ explicit keep
    assert drop_period(root, dropped) is False  # idempotent


def test_null_ts_rows_dropped_in_batch_build(spark, tiny_corpus_path, workdir):
    """Batch build must drop NULL-timestamp docs like the streaming path
    (apply_batch_family) does — no p=__HIVE_DEFAULT_PARTITION__ segment
    (ADVICE r4)."""
    root = os.path.join(workdir, "family_nullts")
    pages = spark.read.parquet(tiny_corpus_path).limit(40)
    nulled = pages.withColumn(
        "warc_ts",
        F.when(F.col("url").contains("0"), F.lit(None)).otherwise(
            F.col("warc_ts")
        ),
    )
    manifest = build_family(
        spark, nulled, root, CFG, ts_col="warc_ts", pattern=PATTERN,
        mode="pages",
    )
    assert "__HIVE_DEFAULT_PARTITION__" not in manifest["periods"]
    assert not os.path.isdir(os.path.join(root, "p=__HIVE_DEFAULT_PARTITION__"))
    s = FamilySearcher(spark, root)
    n_docs = sum(seg.n_docs for seg in s.segments) if hasattr(s, "segments") \
        else None
    kept = nulled.where(F.col("warc_ts").isNotNull()).count()
    if n_docs is not None:
        assert n_docs == kept


def test_family_bmw_identical_to_brute(spark, family_root):
    """k-bounded family search prunes with avgdl-rescaled block UBs
    (max(1, avgdl_global/avgdl_segment) inflation — sound because the
    BM25 tf-norm is monotone increasing in avgdl with ratio < A_g/A_s).
    Pin: identical (doc, score) lists to per-segment brute scoring at
    several k, over every reference query."""
    root, _ = family_root
    fs = FamilySearcher(spark, root)
    for q in [q["query_text"] for q in reference_queries()]:
        for k in (1, 5, 10, 50):
            brute = fs.search(q, k=k, mode="brute")
            bmw = fs.search(q, k=k, mode="bmw")
            assert [d for d, _ in bmw] == [d for d, _ in brute], (q, k)
            assert np.allclose(
                [s for _, s in bmw], [s for _, s in brute], rtol=1e-12
            ), (q, k)


def test_family_distributed_rank_identical(spark, family_root):
    """search_distributed (one Spark job over the union of per-period
    pruned scans, global top-k via orderBy/limit) must equal the driver
    path — both with the exact rule (mode) and the SQL-oracle tie rule
    (tie_round)."""
    root, _ = family_root
    fs = FamilySearcher(spark, root)
    for q in [q["query_text"] for q in reference_queries()][:6]:
        want = fs.search(q, k=10)
        got = fs.search_distributed(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        assert np.allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-9
        ), q
        # oracle tie rule: round(score,4) DESC, doc_id ASC over all matches
        allm = fs.search(q, k=None)
        want_t = sorted(allm, key=lambda h: (-round(h[1], 4), h[0]))[:10]
        got_t = fs.search_distributed(q, k=10, tie_round=4)
        assert [d for d, _ in got_t] == [d for d, _ in want_t], q


@pytest.fixture(scope="module")
def family_root_dv(spark, tiny_corpus_path, workdir):
    """Family with docvalues (n_chars/lang) for the cross-period metric
    aggregations."""
    root = os.path.join(workdir, "index_family_dv")
    pages = spark.read.parquet(tiny_corpus_path).withColumn(
        "n_chars", F.length("text")
    )
    build_family(
        spark, pages, root, CFG, ts_col="warc_ts", pattern=PATTERN,
        mode="pages", field_cols=("lang", "warc_ts", "n_chars"),
    )
    return root


def test_family_metric_aggs_equal_single_index(spark, family_root_dv,
                                               tiny_corpus_path, workdir):
    """Cross-period stats/percentiles/cardinality/range over ALL periods
    must equal the single-index aggregations over the same docs — the
    folded (value, count) histogram is exact."""
    from data_prepper_spark.index.filtered import (
        match_agg_cardinality,
        match_agg_percentiles,
        match_agg_range,
        match_agg_stats,
    )

    single = os.path.join(workdir, "index_agg_single_for_family")
    pages = spark.read.parquet(tiny_corpus_path).withColumn(
        "n_chars", F.length("text")
    )
    build_oneshot(spark, pages, single, CFG,
                  field_cols=("lang", "warc_ts", "n_chars"))
    s1 = BM25Searcher(spark, single)
    fs = FamilySearcher(spark, family_root_dv)
    for qtext in ("the data", "spark index"):
        assert fs.agg_stats(qtext, "n_chars") == match_agg_stats(
            s1, qtext, "n_chars"
        )
        assert fs.agg_percentiles(qtext, "n_chars") == (
            match_agg_percentiles(s1, qtext, "n_chars")
        )
        assert fs.agg_cardinality(qtext, "n_chars") == (
            match_agg_cardinality(s1, qtext, "n_chars")
        )
        ranges = [("lo", None, 1500), ("hi", 1500, None), ("all", None, None)]
        assert fs.agg_range(qtext, "n_chars", ranges) == match_agg_range(
            s1, qtext, "n_chars", ranges
        )
    # a period-range subset folds only the covered periods
    sub = fs.periods[:2]
    st_sub = fs.agg_stats("the data", "n_chars", periods=sub)
    st_all = fs.agg_stats("the data", "n_chars")
    assert 0 < st_sub["count"] < st_all["count"]


def test_family_new_aggs_equal_single_index(spark, family_root_dv,
                                            tiny_corpus_path, workdir):
    """percentile_ranks / value_count / weighted_avg / date_range /
    rare_terms / multi_terms / date_histogram_stats / pipeline /
    auto_date_histogram over ALL periods must equal the single-index
    aggregations over the same docs — every partial folds exactly
    (additive counts/sums, extremal min/max, global interval pick)."""
    from data_prepper_spark.index.filtered import (
        match_agg_auto_date_histogram,
        match_agg_date_histogram_stats,
        match_agg_date_range,
        match_agg_multi_terms,
        match_agg_percentile_ranks,
        match_agg_rare_terms,
        match_agg_value_count,
        match_agg_weighted_avg,
        pipeline_from_buckets,
    )

    single = os.path.join(workdir, "index_agg_single_for_family_new")
    pages = spark.read.parquet(tiny_corpus_path).withColumn(
        "n_chars", F.length("text")
    )
    build_oneshot(spark, pages, single, CFG,
                  field_cols=("lang", "warc_ts", "n_chars"))
    s1 = BM25Searcher(spark, single)
    fs = FamilySearcher(spark, family_root_dv)
    for qtext in ("the data", "spark index"):
        probes = [500, 1500, 3000]
        assert fs.agg_percentile_ranks(qtext, "n_chars", probes) == (
            match_agg_percentile_ranks(s1, qtext, "n_chars", probes)
        )
        assert fs.agg_value_count(qtext, "n_chars") == (
            match_agg_value_count(s1, qtext, "n_chars")
        )
        assert fs.agg_weighted_avg(qtext, "n_chars", "n_chars") == (
            match_agg_weighted_avg(s1, qtext, "n_chars", "n_chars")
        )
        dranges = [("early", None, "2025-01-01 00:05:00"),
                   ("late", "2025-01-01 00:05:00", None)]
        assert fs.agg_date_range(qtext, "warc_ts", dranges) == (
            match_agg_date_range(s1, qtext, "warc_ts", dranges)
        )
        assert fs.agg_rare_terms(qtext, "n_chars", 2) == (
            match_agg_rare_terms(s1, qtext, "n_chars", 2)
        )
        assert fs.agg_multi_terms(qtext, ["lang", "n_chars"], k=7) == (
            match_agg_multi_terms(s1, qtext, ["lang", "n_chars"], k=7)
        )
        parent_f = fs.agg_date_histogram_stats(
            qtext, "warc_ts", "minute", "n_chars"
        )
        parent_s = match_agg_date_histogram_stats(
            s1, qtext, "warc_ts", "minute", "n_chars"
        )
        assert parent_f == parent_s
        assert fs.agg_pipeline(qtext, "warc_ts", "minute", "n_chars") == (
            pipeline_from_buckets(parent_s)
        )
        assert fs.agg_auto_date_histogram(qtext, "warc_ts", 10) == (
            match_agg_auto_date_histogram(s1, qtext, "warc_ts", 10)
        )
        # session-7 additions: matrix_stats / mad / adjacency_matrix
        from data_prepper_spark.index.filtered import (
            match_agg_adjacency_matrix,
            match_agg_matrix_stats,
            match_agg_median_absolute_deviation,
        )

        assert fs.agg_matrix_stats(qtext, "n_chars", "n_chars") == (
            match_agg_matrix_stats(s1, qtext, "n_chars", "n_chars")
        )
        assert fs.agg_mad(qtext, "n_chars") == (
            match_agg_median_absolute_deviation(s1, qtext, "n_chars")
        )
        named = [("short", (("n_chars", "<", 1500),)),
                 ("long", (("n_chars", ">=", 1500),)),
                 ("en", (("lang", "==", "en"),))]
        assert fs.agg_adjacency_matrix(qtext, named, "n_chars") == (
            match_agg_adjacency_matrix(s1, qtext, named, "n_chars")
        )
        # session-8 additions: boxplot / string_stats / t_test /
        # top_metrics / sampler / bucket_script
        from data_prepper_spark.index.filtered import (
            bucket_script_from_buckets,
            match_agg_boxplot,
            match_agg_sampler,
            match_agg_string_stats,
            match_agg_t_test,
            match_agg_top_metrics,
        )

        assert fs.agg_boxplot(qtext, "n_chars") == (
            match_agg_boxplot(s1, qtext, "n_chars")
        )
        assert fs.agg_string_stats(qtext, "lang") == (
            match_agg_string_stats(s1, qtext, "lang")
        )
        fa, fb = (("n_chars", "<", 1500),), (("n_chars", ">=", 1500),)
        assert fs.agg_t_test(qtext, "n_chars", fa, fb) == (
            match_agg_t_test(s1, qtext, "n_chars", fa, fb)
        )
        for asc in (False, True):
            assert fs.agg_top_metrics(
                qtext, "n_chars", ["n_chars"], k=4, ascending=asc
            ) == match_agg_top_metrics(
                s1, qtext, "n_chars", ["n_chars"], k=4, ascending=asc
            )
        for dvf in (None, "lang"):
            assert fs.agg_sampler(
                qtext, 6, "n_chars", diversify_field=dvf, max_per_value=2
            ) == match_agg_sampler(
                s1, qtext, 6, "n_chars", diversify_field=dvf,
                max_per_value=2,
            )
        assert fs.agg_bucket_script(
            qtext, "warc_ts", "minute", "n_chars"
        ) == bucket_script_from_buckets(
            [(b, n, sm) for b, n, sm, _, _ in parent_s]
        )
        # session-9 additions: cumulative_cardinality (pair union BEFORE
        # first-bucket attribution) + sibling folds over the folded parent
        from data_prepper_spark.index.filtered import (
            extremal_bucket_from_buckets,
            match_agg_cumulative_cardinality,
        )

        assert fs.agg_cumulative_cardinality(
            qtext, "warc_ts", "minute", "n_chars"
        ) == match_agg_cumulative_cardinality(
            s1, qtext, "warc_ts", "minute", "n_chars"
        )
        assert extremal_bucket_from_buckets(parent_f, "max") == (
            extremal_bucket_from_buckets(parent_s, "max")
        )

    # completion suggester: uncut per-period candidates fold by df sum
    from data_prepper_spark.index.boolquery import suggest_completion

    for pref in ("t", "d", "zzz"):
        assert fs.suggest_completion(pref, k=5) == (
            suggest_completion(s1, pref, k=5)
        )


def test_family_phrase_equals_single_positional_index(spark,
                                                      tiny_corpus_path,
                                                      workdir):
    """Cross-period phrase search over ALL periods == phrase_topk over
    one positional index built from the same docs (family-global stats
    make the fold rank-identical); slop variant included."""
    from data_prepper_spark.index.family import FamilySearcher, build_family
    from data_prepper_spark.index.phrase import phrase_topk

    cfg = IndexConfig(range_bits=2, block_size=16, n_buckets=8,
                      positions=True)
    pages = spark.read.parquet(tiny_corpus_path)
    froot = os.path.join(workdir, "index_family_pos")
    build_family(spark, pages, froot, cfg, ts_col="warc_ts",
                 pattern=PATTERN, mode="pages")
    single = os.path.join(workdir, "index_single_pos_for_family")
    build_oneshot(spark, pages, single, cfg)
    fs = FamilySearcher(spark, froot)
    s1 = BM25Searcher(spark, single)
    assert len(fs.covered()) > 1  # the fold actually crosses periods
    for ph, slop in [("the data", 0), ("data the", 0), ("the data", 2),
                     ("merge join", 1), ("zzz absent", 0)]:
        fam = fs.phrase_topk(ph, slop=slop, k=10)
        one = phrase_topk(s1, ph, slop=slop, k=10, distributed=False)
        assert [d for d, _ in fam] == [d for d, _ in one], (ph, slop)
        assert all(abs(a - b) < 1e-9
                   for (_, a), (_, b) in zip(fam, one)), (ph, slop)


def test_family_intervals_equals_single_positional_index(spark,
                                                         tiny_corpus_path,
                                                         workdir):
    """Cross-period intervals search over ALL periods == intervals_topk
    over one positional index from the same docs (the shared
    _positional_fold under family-global stats)."""
    from data_prepper_spark.index.family import FamilySearcher, build_family
    from data_prepper_spark.index.phrase import intervals_topk

    cfg = IndexConfig(range_bits=2, block_size=16, n_buckets=8,
                      positions=True)
    pages = spark.read.parquet(tiny_corpus_path)
    froot = os.path.join(workdir, "index_family_pos_iv")
    build_family(spark, pages, froot, cfg, ts_col="warc_ts",
                 pattern=PATTERN, mode="pages")
    single = os.path.join(workdir, "index_single_pos_for_family_iv")
    build_oneshot(spark, pages, single, cfg)
    fs = FamilySearcher(spark, froot)
    s1 = BM25Searcher(spark, single)
    assert len(fs.covered()) > 1
    specs = [
        {"match": {"query": "the data", "ordered": True, "max_gaps": 2}},
        {"match": {"query": "data the", "ordered": False, "max_gaps": 4}},
        {"any_of": {"intervals": [
            {"match": {"query": "merge join", "ordered": True,
                       "max_gaps": 0}},
            {"match": {"query": "the data", "ordered": True,
                       "max_gaps": 0}},
        ]}},
        {"match": {"query": "zzz absent", "ordered": True}},
    ]
    for spec in specs:
        fam = fs.intervals_topk(spec, k=10)
        one = intervals_topk(s1, spec, k=10, distributed=False)
        assert [d for d, _ in fam] == [d for d, _ in one], spec
        assert all(abs(a - b) < 1e-9
                   for (_, a), (_, b) in zip(fam, one)), spec


def test_family_indices_boost(spark, family_root, single_index_same_docs=None):
    """indices_boost: per-period score multipliers — boosted brute ==
    manual boost of unboosted scores, boosted BMW top-k == boosted
    brute top-k (pruning stays exact under the linear scale + theta/beta
    threshold), beta=0 keeps hits at score 0, negatives rejected."""
    from data_prepper_spark.index.family import FamilySearcher

    root, _ = family_root
    fs = FamilySearcher(spark, root)
    periods = fs.covered()
    assert len(periods) >= 3
    boosts = {p: [1.0, 2.0, 0.5][i % 3] for i, p in enumerate(periods)}
    for qtext in ("the data", "spark index"):
        plain = fs.search(qtext, k=None)
        boosted = fs.search(qtext, k=None, indices_boost=boosts)
        # period of a doc: recover from per-period search
        by_period = {}
        for p in periods:
            for d, _sc in fs.search(qtext, k=None, periods=[p]):
                by_period[d] = p
        want = {d: sc * boosts[by_period[d]] for d, sc in plain}
        got = dict(boosted)
        assert got.keys() == want.keys()
        for d in want:
            assert abs(got[d] - want[d]) < 1e-9, (qtext, d)
        # BMW top-k under boost == brute top-k under boost
        brute_top = sorted(boosted, key=lambda h: (-h[1], h[0]))[:10]
        bmw_top = fs.search(qtext, k=10, indices_boost=boosts)
        assert [d for d, _ in bmw_top] == [d for d, _ in brute_top], qtext
        assert all(abs(a - b) < 1e-9 for (_, a), (_, b)
                   in zip(bmw_top, brute_top)), qtext
        # beta=0 keeps matches at score 0 (never prunes them away)
        zeroed = dict(fs.search(qtext, k=None,
                                indices_boost={periods[0]: 0.0}))
        for d, p in by_period.items():
            if p == periods[0]:
                assert zeroed[d] == 0.0
    import pytest as _pt

    with _pt.raises(ValueError):
        fs.search("the", k=5, indices_boost={periods[0]: -1.0})
