"""Field collapse / boosting / rescore / explain vs the pure-Python oracle
(index/rescore.py) — driver and distributed paths rank-identical."""

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_prepper_spark.hashing import xxh64_signed
from data_prepper_spark.index.query import BM25Searcher
from data_prepper_spark.index.rescore import (
    explain_bm25,
    search_boosting,
    search_collapsed,
    search_rescored,
)
from data_prepper_spark.textproc import tokenize

K1, B = 1.2, 0.75
TIE = 4


@pytest.fixture(scope="session")
def rescore_index(spark, tiny_corpus_path, workdir):
    from data_prepper_spark.index.build import build_oneshot
    from data_prepper_spark.index.config import IndexConfig

    index_dir = os.path.join(workdir, "index_rescore")
    pages = (
        spark.read.parquet(tiny_corpus_path)
        .withColumn(
            "site",
            F.concat(F.lit("s"), F.pmod(F.xxhash64("url"), F.lit(7)).cast("string")),
        )
        .withColumn("grp", F.pmod(F.xxhash64("url"), F.lit(3)))
    )
    cfg = IndexConfig(range_bits=2, block_size=16, n_buckets=8)
    build_oneshot(spark, pages, index_dir, cfg, field_cols=("site", "grp"))
    return index_dir


@pytest.fixture(scope="session")
def site_by_doc(tiny_pages_pd):
    # mirrors F.pmod(F.xxhash64(url), 7): pmod of the SIGNED xxhash64
    out = {}
    for r in tiny_pages_pd.itertuples(index=False):
        h = xxh64_signed(r.url)
        out[h] = f"s{h % 7}"
    return out


def _oracle_scores(oracle, query_text):
    scores = {}
    for t in sorted(set(tokenize(query_text))):
        if t not in oracle.postings:
            continue
        df = len(oracle.postings[t])
        idf = math.log(1.0 + (oracle.n_docs - df + 0.5) / (df + 0.5))
        for d, tf in oracle.postings[t].items():
            dl = oracle.doc_len[d]
            denom = tf + K1 * (1.0 - B + B * dl / oracle.avgdl)
            scores[d] = scores.get(d, 0.0) + idf * tf * (K1 + 1.0) / denom
    return scores


def _rank(items, k):
    # (round(score, TIE) DESC, doc_id ASC)
    return sorted(items, key=lambda kv: (-round(kv[1], TIE), kv[0]))[:k]


COLLAPSE_QUERIES = ["the data", "spark index", "web search table"]


def test_collapse_matches_oracle(spark, rescore_index, oracle_tiny, site_by_doc):
    s = BM25Searcher(spark, rescore_index)
    for q in COLLAPSE_QUERIES:
        sc = _oracle_scores(oracle_tiny, q)
        # oracle: best per site under the tie rule, then top-k groups
        by_site = {}
        for d, v in sc.items():
            by_site.setdefault(site_by_doc[d], []).append((d, v))
        want = []
        for key, items in by_site.items():
            wd, wv = _rank(items, 1)[0]
            want.append((key, wd, wv, len(items)))
        want = sorted(want, key=lambda t: (-round(t[2], TIE), t[1]))[:5]
        got = search_collapsed(s, q, "site", k=5, tie_round=TIE)
        assert [(g[0], g[1], g[3]) for g in got] == [
            (w[0], w[1], w[3]) for w in want
        ], q
        np.testing.assert_allclose(
            [g[2] for g in got], [w[2] for w in want], rtol=1e-9
        )
        got_d = search_collapsed(s, q, "site", k=5, tie_round=TIE,
                                 distributed=True)
        assert [(g[0], g[1], g[3]) for g in got_d] == [
            (g[0], g[1], g[3]) for g in got
        ], q
        np.testing.assert_allclose(
            [g[2] for g in got_d], [g[2] for g in got], rtol=1e-9
        )


BOOSTING_CASES = [
    ("the data", "web", 0.5),
    ("spark index table", "the", 0.25),
    ("web search", "data spark", 0.5),
]


def test_boosting_matches_oracle(spark, rescore_index, oracle_tiny):
    s = BM25Searcher(spark, rescore_index)
    for pos, neg, nb in BOOSTING_CASES:
        sc = _oracle_scores(oracle_tiny, pos)
        neg_docs = set()
        for t in set(tokenize(neg)):
            neg_docs |= set(oracle_tiny.postings.get(t, {}))
        want = _rank(
            [(d, v * nb if d in neg_docs else v) for d, v in sc.items()], 10
        )
        got = search_boosting(s, pos, neg, negative_boost=nb, k=10,
                              tie_round=TIE)
        assert [d for d, _ in got] == [d for d, _ in want], (pos, neg)
        np.testing.assert_allclose(
            [v for _, v in got], [v for _, v in want], rtol=1e-9
        )
        got_d = search_boosting(s, pos, neg, negative_boost=nb, k=10,
                                tie_round=TIE, distributed=True)
        assert got_d == got, (pos, neg)


def test_boosting_demotes_not_excludes(spark, rescore_index, oracle_tiny):
    s = BM25Searcher(spark, rescore_index)
    pos, neg = "the data", "web"
    n_all = len(_oracle_scores(oracle_tiny, pos))
    got = search_boosting(s, pos, neg, k=n_all, tie_round=TIE)
    assert len(got) == n_all  # nothing excluded, only demoted


def test_rescore_matches_oracle(spark, rescore_index, oracle_tiny):
    s = BM25Searcher(spark, rescore_index)
    prim_q, resc_q, qw, rw, window = "the data", "web search", 1.0, 2.0, 30
    p = _oracle_scores(oracle_tiny, prim_q)
    r = _oracle_scores(oracle_tiny, resc_q)
    win = _rank(list(p.items()), window)
    want = _rank([(d, qw * v + rw * r.get(d, 0.0)) for d, v in win], 10)
    got = search_rescored(s, prim_q, resc_q, window_size=window,
                          query_weight=qw, rescore_weight=rw, k=10,
                          tie_round=TIE)
    assert [g[0] for g in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [g[1] for g in got], [v for _, v in want], rtol=1e-9
    )
    # combined = qw·primary + rw·secondary on every returned row
    for d, comb, pr, sec in got:
        assert comb == pytest.approx(qw * pr + rw * sec, rel=1e-12)
        assert pr == pytest.approx(p[d], rel=1e-9)
        assert sec == pytest.approx(r.get(d, 0.0), rel=1e-9)


def test_explain_sums_to_score(spark, rescore_index, oracle_tiny):
    s = BM25Searcher(spark, rescore_index)
    q = "the data spark"
    hits = s.search(q, k=5)
    rows = explain_bm25(s, q, [d for d, _ in hits])
    by_doc = {}
    for d, term, tf, df, contrib in rows:
        assert tf >= 1 and df >= 1
        assert oracle_tiny.postings[term][d] == tf
        assert len(oracle_tiny.postings[term]) == df
        by_doc[d] = by_doc.get(d, 0.0) + contrib
    for d, sc in hits:
        assert by_doc[d] == pytest.approx(sc, rel=1e-9)
    # rows are (doc_id, term)-sorted
    assert rows == sorted(rows, key=lambda t: (t[0], t[1]))


# ---------------------------------------------- composite / extended stats

def _matched_docs(oracle, query_text):
    out = set()
    for t in set(tokenize(query_text)):
        out |= set(oracle.postings.get(t, {}))
    return out


def test_composite_pages_match_oracle(spark, rescore_index, oracle_tiny,
                                      site_by_doc):
    from data_prepper_spark.index.filtered import match_agg_composite

    s = BM25Searcher(spark, rescore_index)
    q = "the data web"
    matched = _matched_docs(oracle_tiny, q)
    from collections import Counter

    want_all = sorted(
        Counter(
            (site_by_doc[d], xxh64_signed(oracle_tiny.doc_url[d]) % 3)
            for d in matched
        ).items()
    )
    want_rows = [(k[0], int(k[1]), n) for k, n in want_all]
    for distributed in (False, True):
        got, after = [], None
        while True:
            rows, after = match_agg_composite(
                s, q, ["site", "grp"], size=5, after=after,
                distributed=distributed,
            )
            if not rows:
                break
            assert len(rows) <= 5
            got.extend(rows)
            if len(rows) < 5:
                break
        assert [(r[0], int(r[1]), int(r[2])) for r in got] == want_rows, (
            distributed
        )


def test_composite_after_cursor_skips(spark, rescore_index):
    from data_prepper_spark.index.filtered import match_agg_composite

    s = BM25Searcher(spark, rescore_index)
    q = "the data web"
    full, _ = match_agg_composite(s, q, ["site", "grp"], size=10_000)
    page2, _ = match_agg_composite(
        s, q, ["site", "grp"], size=5, after=tuple(full[4][:-1])
    )
    assert page2 == full[5:10]


def test_extended_stats_matches_oracle(spark, rescore_index, oracle_tiny):
    from data_prepper_spark.index.filtered import match_agg_extended_stats

    s = BM25Searcher(spark, rescore_index)
    q = "spark index data"
    matched = _matched_docs(oracle_tiny, q)
    dls = [oracle_tiny.doc_len[d] for d in matched]
    n = len(dls)
    want = {
        "count": n,
        "min": min(dls),
        "max": max(dls),
        "sum": sum(dls),
        "sum_sq": sum(v * v for v in dls),
    }
    for distributed in (False, True):
        got = match_agg_extended_stats(s, q, "doc_len", distributed=distributed)
        for key, v in want.items():
            assert got[key] == v, (key, distributed)
        var = (n * want["sum_sq"] - want["sum"] ** 2) / (n * n)
        assert got["variance"] == pytest.approx(var, rel=1e-12)
