"""End-to-end index correctness: byte-identical extraction, rank-identical
top-k vs the pure-Python oracle (the two gates in BASELINE.json input_hint)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_prepper_spark.corpus import reference_queries
from data_prepper_spark.index.query import BM25Searcher
from data_prepper_spark.textproc import extract_text_series


def test_byte_identical_extraction(spark, tiny_corpus_path, oracle_tiny):
    """Spark-side extraction (mapInPandas over html BINARY) must be
    byte-identical per url to the oracle's pure-Python extraction."""
    pages = spark.read.parquet(tiny_corpus_path).select("url", "html", "text")

    def ex(batches):
        for b in batches:
            out = b[["url", "text"]].copy()
            out["extracted"] = extract_text_series(b["html"])
            yield out

    rows = pages.mapInPandas(ex, "url string, text string, extracted string").collect()
    assert len(rows) == len(oracle_tiny.extracted)
    for r in rows:
        assert r["extracted"] == r["text"], r["url"]
        assert r["extracted"] == oracle_tiny.extracted[r["url"]], r["url"]


def test_corpus_stats_match_oracle(tiny_index, oracle_tiny):
    _, _, stats = tiny_index
    assert stats["n_docs"] == oracle_tiny.n_docs
    assert stats["total_tokens"] == oracle_tiny.total_tokens
    assert abs(stats["avgdl"] - oracle_tiny.avgdl) < 1e-9


def _assert_rank_identical(got, want, ctx):
    assert [d for d, _ in got] == [d for d, _ in want], ctx
    g = np.array([s for _, s in got])
    w = np.array([s for _, s in want])
    assert np.allclose(g, w, rtol=1e-9, atol=1e-12), ctx


def test_rank_identical_topk_all_reference_queries(spark, tiny_index, oracle_tiny):
    index_dir, _, _ = tiny_index
    searcher = BM25Searcher(spark, index_dir)
    for q in reference_queries():
        want = oracle_tiny.topk(q["query_text"], q["k"])
        got_bmw = searcher.search(q["query_text"], k=q["k"], mode="bmw")
        _assert_rank_identical(got_bmw, want, f"bmw q{q['query_id']}: {q['query_text']}")
        got_brute = searcher.search(q["query_text"], k=q["k"], mode="brute")
        got_brute = got_brute[: q["k"]]
        _assert_rank_identical(got_brute, want, f"brute q{q['query_id']}")


def test_distributed_search_matches_driver(spark, tiny_index, oracle_tiny):
    index_dir, _, _ = tiny_index
    searcher = BM25Searcher(spark, index_dir)
    for qt, k in [("zanzibar", 10), ("the", 5), ("spark index the", 10), ("melange of", 100)]:
        want = oracle_tiny.topk(qt, k)
        got = searcher.search(qt, k=k, mode="bmw", distributed=True)
        _assert_rank_identical(got, want, f"distributed {qt}")


def test_absent_term_query(spark, tiny_index):
    index_dir, _, _ = tiny_index
    searcher = BM25Searcher(spark, index_dir)
    assert searcher.search("qqqabsentterm", k=10) == []


def test_urls_resolve(spark, tiny_index, oracle_tiny):
    index_dir, _, _ = tiny_index
    searcher = BM25Searcher(spark, index_dir)
    hits = searcher.search("zanzibar", k=5)
    urls = searcher.urls_for([d for d, _ in hits])
    for d, _ in hits:
        assert urls[d] == oracle_tiny.doc_url[d]


def test_bucket_pruning_plan(spark, tiny_index):
    """The postings scan must prune to the query terms' buckets (partition
    pruning on term_bucket) — the 'only read what the query needs' gate."""
    index_dir, cfg, _ = tiny_index
    searcher = BM25Searcher(spark, index_dir)
    from data_prepper_spark.hashing import pmod, xxh64_signed

    tid = xxh64_signed("zanzibar")
    bucket = pmod(tid, cfg.n_buckets)
    df = (
        spark.read.parquet(f"{index_dir}/postings")
        .filter(F.col("term_bucket").isin([bucket]) & (F.col("term_id") == tid))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition pruning on term_bucket must reach the scan ...
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "term_bucket" in pf, plan
    # ... and the term predicate must be pushed into parquet
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "term_id" in pushed, plan
    # and the pruned scan must actually read fewer partitions than exist
    pruned = df.withColumn("f", F.input_file_name()).select("f").distinct().collect()
    assert all(f"term_bucket={bucket}/" in r["f"] for r in pruned), pruned
    n_total = len(spark.read.parquet(f"{index_dir}/postings").inputFiles())
    assert 0 < len(pruned) < n_total


def test_pfor_codec_rank_identical(spark, tiny_corpus_path, workdir, tiny_index, oracle_tiny):
    """An index built with codec='pfor' returns byte-for-byte the same
    BM25 top-k as the varint index AND the oracle — the codec is a pure
    storage concern."""
    import os

    from data_prepper_spark.corpus import reference_queries
    from data_prepper_spark.index.build import build_oneshot
    from data_prepper_spark.index.config import IndexConfig
    from data_prepper_spark.index.query import BM25Searcher

    idx_pfor = os.path.join(workdir, "index_tiny_pfor")
    pages = spark.read.parquet(tiny_corpus_path)
    cfg = IndexConfig(range_bits=2, block_size=16, n_buckets=8, codec="pfor")
    build_oneshot(spark, pages, idx_pfor, cfg)
    s_pfor = BM25Searcher(spark, idx_pfor)
    s_var = BM25Searcher(spark, tiny_index[0])
    for q in reference_queries()[:12]:
        got = s_pfor.search(q["query_text"], k=q["k"])
        assert got == s_var.search(q["query_text"], k=q["k"])
        want = oracle_tiny.topk(q["query_text"], q["k"])
        assert [d for d, _ in got] == [d for d, _ in want]


def test_bmw_guard_rare_plus_stopword(spark, workdir):
    """The pruning-convergence pathology: a rare term + a term in every
    doc.  The guard must keep bmw exact (== brute) and fast."""
    import os
    import time

    from data_prepper_spark.index.build import build_oneshot_text
    from data_prepper_spark.index.config import IndexConfig
    from data_prepper_spark.index.query import BM25Searcher

    rows = [
        (i, "the common filler words repeat here " + ("rareword " if i % 97 == 0 else "") + f"tail{i % 7}")
        for i in range(3000)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = os.path.join(workdir, "idx_guard")
    build_oneshot_text(spark, docs, d, IndexConfig(range_bits=2, block_size=32, n_buckets=8))
    s = BM25Searcher(spark, d)
    t0 = time.perf_counter()
    a = s.search("rareword the", k=10, mode="bmw")
    dt = time.perf_counter() - t0
    b = s.search("rareword the", k=10, mode="brute")
    assert a == b and len(a) == 10
    assert dt < 2.0  # pre-guard this shape ran the full segment loop


def test_range_bits_rank_identical(spark, tiny_corpus_path, workdir, tiny_index, oracle_tiny):
    """range_bits is the scale-out knob (IndexConfig.for_corpus bounds the
    encode group by raising it with corpus size) — it must be a pure
    layout concern: an index built with 8x the ranges returns identical
    BM25 top-k, in both driver and distributed modes."""
    import os

    from data_prepper_spark.corpus import reference_queries
    from data_prepper_spark.index.build import build_oneshot
    from data_prepper_spark.index.config import IndexConfig
    from data_prepper_spark.index.query import BM25Searcher

    idx_wide = os.path.join(workdir, "index_tiny_rb5")
    pages = spark.read.parquet(tiny_corpus_path)
    cfg = IndexConfig(range_bits=5, block_size=16, n_buckets=8)
    build_oneshot(spark, pages, idx_wide, cfg)
    s_wide = BM25Searcher(spark, idx_wide)
    s_ref = BM25Searcher(spark, tiny_index[0])
    for q in reference_queries()[:12]:
        got = s_wide.search(q["query_text"], k=q["k"])
        assert got == s_ref.search(q["query_text"], k=q["k"])
        want = oracle_tiny.topk(q["query_text"], q["k"])
        assert [d for d, _ in got] == [d for d, _ in want]


def test_for_corpus_group_bound():
    """for_corpus keeps postings-per-encode-group ≈ flat as docs grow."""
    from data_prepper_spark.index.config import IndexConfig

    for n_docs in (10_000, 1_000_000, 10_000_000, 1_000_000_000):
        cfg = IndexConfig.for_corpus(n_docs)
        group = n_docs * 150 / (cfg.n_buckets * cfg.n_ranges)
        assert group <= 2_000_000 or cfg.range_bits >= 2
        if n_docs >= 1_000_000:
            assert group <= 2_000_000 * 1.05, (n_docs, cfg.range_bits, group)


import pytest


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_lazy_bmw_identity(codec):
    """Block-lazy BMW (decode only scored blocks) must produce EXACTLY the
    eager scorer's (doc_id, score) top-k — same grid, same bounds, same
    accumulation — including through the MAX_SEG brute fallback.  Both
    tagged codecs are range-addressable (varint terminator index / PFor
    block header index), so both must pass bit-identically."""
    import numpy as np
    import pandas as pd

    from data_prepper_spark.index.build import encode_slice_fn
    from data_prepper_spark.index.scoring import (
        decode_slice,
        decode_slice_lazy,
        score_bmw,
        score_bmw_lazy,
    )

    rng = np.random.default_rng(11)
    k1, b, avgdl, bs = 1.2, 0.75, 120.0, 8
    vec = encode_slice_fn(avgdl, k1, b, block_size=bs, codec=codec)
    n = 60_000
    terms = rng.choice(
        rng.integers(-(2**62), 2**62, size=6, dtype=np.int64), size=n
    )
    pdf = pd.DataFrame(
        {
            "term_id": terms,
            "range_id": np.zeros(n, dtype=np.int32),
            "doc_id": rng.integers(-(2**62), 2**62, size=n, dtype=np.int64),
            "tf": rng.integers(1, 30, size=n).astype(np.int64),
            "dl": rng.integers(20, 400, size=n).astype(np.int64),
        }
    )
    pdf["dl"] = pdf.groupby("doc_id")["dl"].transform("first")
    pdf = pdf.drop_duplicates(["term_id", "doc_id"]).reset_index(drop=True)
    out = vec(pdf)
    idf = {int(t): 0.5 + 0.1 * i for i, t in enumerate(sorted(out["term_id"]))}

    for n_terms, k in [(2, 10), (6, 10), (3, 1), (6, 10**9)]:  # last: MAX_SEG fallback
        sel = out.iloc[:n_terms]
        eager = [
            decode_slice(sel.iloc[i], idf[int(sel.iloc[i]["term_id"])],
                         label=str(int(sel.iloc[i]["term_id"])))
            for i in range(len(sel))
        ]
        lazy = [
            decode_slice_lazy(sel.iloc[i], idf[int(sel.iloc[i]["term_id"])], bs,
                              label=str(int(sel.iloc[i]["term_id"])))
            for i in range(len(sel))
        ]
        assert all(s is not None for s in lazy)
        ids_e, sc_e = score_bmw(eager, k1, b, avgdl, k)
        ids_l, sc_l = score_bmw_lazy(lazy, k1, b, avgdl, k)
        assert np.array_equal(ids_e, ids_l)
        assert np.array_equal(sc_e, sc_l)
        # and lazy full-decode round-trips to the eager arrays
        for se, sl in zip(eager, lazy):
            ts = sl.to_term_slice()
            assert np.array_equal(se.doc_ids, ts.doc_ids)
            assert np.array_equal(se.tfs, ts.tfs)
            assert np.array_equal(se.dls, ts.dls)
            assert sl.last_doc() == int(se.doc_ids[-1])
