"""query_string parsing + evaluation (index/querystring.py) vs a
pure-Python oracle; driver and distributed paths identical.

The oracle re-implements the documented semantics from scratch: clause
parsing is NOT shared (the test would be vacuous), scores come from the
OracleIndex postings plus tokenize()-derived positions for phrases."""

import math
import os

import numpy as np
import pytest

from data_prepper_spark.hashing import xxh64_signed
from data_prepper_spark.index.query import BM25Searcher
from data_prepper_spark.index.querystring import (
    Clause,
    parse_query_string,
    search_query_string,
)
from data_prepper_spark.textproc import tokenize

K1, B = 1.2, 0.75
TIE = 4


# ------------------------------------------------------------ parser

def test_parser_clauses():
    got = parse_query_string('+spark qu* -batch "the data"~2 fast^2 quer~1')
    assert got == [
        Clause("must", "term", "spark"),
        Clause("should", "prefix", "qu"),
        Clause("must_not", "term", "batch"),
        Clause("should", "phrase", "the data", slop=2),
        Clause("should", "term", "fast", boost=2.0),
        Clause("should", "fuzzy", "quer", edits=1),
    ]


def test_parser_boost_and_case():
    got = parse_query_string('+"Big Table"^1.5 -Slow*')
    assert got == [
        Clause("must", "phrase", "big table", boost=1.5),
        Clause("must_not", "prefix", "slow"),
    ]


# ------------------------------------------------------------ fixtures

@pytest.fixture(scope="module")
def qs_index(spark, tiny_corpus_path, workdir):
    from data_prepper_spark.index.build import build_oneshot
    from data_prepper_spark.index.config import IndexConfig

    d = os.path.join(workdir, "index_querystring")
    pages = spark.read.parquet(tiny_corpus_path)
    cfg = IndexConfig(range_bits=2, block_size=16, n_buckets=8, positions=True)
    build_oneshot(spark, pages, d, cfg)
    return d


@pytest.fixture(scope="module")
def positions_by_doc(tiny_pages_pd):
    from data_prepper_spark.textproc import extract_text

    out = {}
    for r in tiny_pages_pd.itertuples(index=False):
        if r.lang != "en":
            continue  # route semantics: the index holds en docs only
        toks = tokenize(extract_text(r.html))
        pos = {}
        for i, t in enumerate(toks):
            pos.setdefault(t, []).append(i)
        out[xxh64_signed(r.url)] = (toks, pos)
    return out


# ------------------------------------------------------- python oracle

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _phrase_occurrences(toks, terms, slop):
    """Start positions where the ordered chain fits (greedy
    earliest-next, the engine's documented existence check)."""
    n = 0
    for p, t in enumerate(toks):
        if t != terms[0]:
            continue
        if slop == 0:
            if toks[p + 1: p + len(terms)] == terms[1:]:
                n += 1
            continue
        cur = p
        ok = True
        for t2 in terms[1:]:
            nxt = next((j for j in range(cur + 1, len(toks))
                        if toks[j] == t2), None)
            if nxt is None:
                ok = False
                break
            cur = nxt
        if ok and cur - p <= len(terms) - 1 + slop:
            n += 1
    return n


def _oracle_qs(oracle, positions_by_doc, query_string, msm=0):
    clauses = parse_query_string(query_string)
    vocab = sorted(oracle.postings)
    n, avgdl = oracle.n_docs, oracle.avgdl

    def term_scores(terms, boost):
        sc = {}
        for t in terms:
            post = oracle.postings.get(t)
            if not post:
                continue
            idf = boost * math.log(1 + (n - len(post) + 0.5) / (len(post) + 0.5))
            for d, tf in post.items():
                dl = oracle.doc_len[d]
                sc[d] = sc.get(d, 0.0) + idf * tf * (K1 + 1) / (
                    tf + K1 * (1 - B + B * dl / avgdl)
                )
        return sc

    def clause_scores(c):
        if c.kind == "term":
            return term_scores([c.text], c.boost)
        if c.kind == "prefix":
            return term_scores([t for t in vocab if t.startswith(c.text)],
                               c.boost)
        if c.kind == "fuzzy":
            return term_scores(
                [t for t in vocab
                 if abs(len(t) - len(c.text)) <= c.edits
                 and _lev(t, c.text) <= c.edits],
                c.boost,
            )
        terms = tokenize(c.text)
        hits = {}
        for d, (toks, _pos) in positions_by_doc.items():
            tfp = _phrase_occurrences(toks, terms, c.slop)
            if tfp:
                hits[d] = tfp
        if not hits:
            return {}
        idf = c.boost * math.log(
            1 + (n - len(hits) + 0.5) / (len(hits) + 0.5)
        )
        return {
            d: idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * oracle.doc_len[d] / avgdl)
            )
            for d, tf in hits.items()
        }

    per = [(c, clause_scores(c)) for c in clauses if c.occur != "must_not"]
    must = [set(sc) for c, sc in per if c.occur == "must"]
    if must:
        cand = set.intersection(*must)
    else:
        cand = set().union(*(set(sc) for _, sc in per))
    if msm > 0 and any(c.occur == "should" for c, _ in per):
        cand = {
            d for d in cand
            if sum(d in sc for c, sc in per if c.occur == "should") >= msm
        }
    for c in clauses:
        if c.occur == "must_not":
            cand -= set(clause_scores(Clause("should", c.kind, c.text,
                                             1.0, c.slop, c.edits)))
    total = {d: sum(sc.get(d, 0.0) for _, sc in per) for d in cand}
    return total


# webtext-corpus vocabulary: stopwords + zipf tokNNNN tokens
QS_CASES = [
    "+tok0010 tok001*",
    '"of the" tok0011^2',
    "tok001~1 +the",
    '"in the of"~2 tok0042',
    "tok0030^3 tok0031 tok0032",
    "+the -of",
    '+tok0010 -"of the"',
    "zzqq* tok0010",      # prefix with zero expansions
]


def _rank(scores, k):
    return sorted(scores.items(), key=lambda kv: (-round(kv[1], TIE), kv[0]))[:k]


def test_query_string_matches_oracle(spark, qs_index, oracle_tiny,
                                     positions_by_doc):
    s = BM25Searcher(spark, qs_index)
    for q in QS_CASES:
        want = _rank(_oracle_qs(oracle_tiny, positions_by_doc, q), 10)
        got = search_query_string(s, q, k=10, tie_round=TIE)
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_allclose(
            [v for _, v in got], [v for _, v in want], rtol=1e-9,
            err_msg=q,
        )


def test_query_string_driver_equals_distributed(spark, qs_index):
    s = BM25Searcher(spark, qs_index)
    for q in QS_CASES:
        a = search_query_string(s, q, k=10, tie_round=TIE)
        b = search_query_string(s, q, k=10, tie_round=TIE, distributed=True)
        assert [d for d, _ in a] == [d for d, _ in b], q
        np.testing.assert_allclose(
            [v for _, v in a], [v for _, v in b], rtol=1e-12, err_msg=q
        )


def test_query_string_must_semantics(spark, qs_index, oracle_tiny):
    s = BM25Searcher(spark, qs_index)
    # a must clause with no postings empties the result
    assert search_query_string(s, "+zzqq the", k=10, tie_round=TIE) == []
    # must_not excludes every doc containing the term
    got = search_query_string(s, "+the -tok0010", k=1000, tie_round=TIE)
    data_docs = set(oracle_tiny.postings.get("tok0010", {}))
    assert got and not ({d for d, _ in got} & data_docs)


def test_query_string_boost_scales_contribution(spark, qs_index):
    s = BM25Searcher(spark, qs_index)
    base = dict(search_query_string(s, "tok0010", k=10_000, tie_round=TIE))
    boosted = dict(search_query_string(s, "tok0010^3", k=10_000, tie_round=TIE))
    assert set(base) == set(boosted)
    for d, v in base.items():
        assert boosted[d] == pytest.approx(3.0 * v, rel=1e-12)


def test_query_string_respects_deletes(spark, qs_index, workdir):
    """Tombstoned docs leave every clause path (term scoring, phrase
    matching, must_not sets) in both driver and distributed modes."""
    import shutil

    from data_prepper_spark.index.deletes import delete_docs

    d = os.path.join(workdir, "index_querystring_del")
    if not os.path.exists(d):
        shutil.copytree(qs_index, d)
    s0 = BM25Searcher(spark, d)
    before = search_query_string(s0, '+tok0010 "of the"', k=5, tie_round=TIE)
    assert before
    victims = [did for did, _ in before[:2]]
    delete_docs(d, victims)
    s1 = BM25Searcher(spark, d)
    for distributed in (False, True):
        after = search_query_string(
            s1, '+tok0010 "of the"', k=5, tie_round=TIE,
            distributed=distributed,
        )
        assert not ({did for did, _ in after} & set(victims)), distributed


QS_MSM_CASES = [
    # clause-level counting: a prefix/fuzzy/phrase clause counts once
    ("tok0030 tok0031 tok0032 tok0033", 2),
    ("tok0030 tok0031 tok0032 tok0033", 3),
    ("+the tok0010 tok0011", 1),
    ("+the tok0010 tok0011", 2),
    ('"of the" tok0010 tok001*', 2),    # phrase + prefix should clauses
    ("+tok0010 -of the data", 2),
    ("tok001* tok0030~1 the", 2),       # expansion clauses count once
]


def test_query_string_minimum_should_match(spark, qs_index, oracle_tiny,
                                           positions_by_doc):
    """Clause-level minimum_should_match vs the oracle, identical across
    driver / distributed / routed paths."""
    s = BM25Searcher(spark, qs_index)
    for q, msm in QS_MSM_CASES:
        want = _rank(
            _oracle_qs(oracle_tiny, positions_by_doc, q, msm=msm), 10
        )
        ctx = f"{q} msm={msm}"
        for kw in (
            {},
            {"distributed": True},
            {"route_bool": False},
            {"route_bool": False, "distributed": True},
        ):
            got = search_query_string(
                s, q, k=10, tie_round=TIE, minimum_should_match=msm, **kw
            )
            assert [d for d, _ in got] == [d for d, _ in want], (ctx, kw)
            np.testing.assert_allclose(
                [v for _, v in got], [v for _, v in want], rtol=1e-9,
                err_msg=f"{ctx} {kw}",
            )


def test_query_string_bool_route_identical(spark, qs_index):
    """Term-family strings route through search_bool; scores and ranks
    must be identical to the generic per-clause fold."""
    for q in ["+tok0010 tok001*", "tok0030^3 tok0031 tok0032", "+the -of",
              "tok001~1 +the", "zzqq* tok0010"]:
        a = search_query_string(s := BM25Searcher(spark, qs_index), q,
                                k=20, tie_round=TIE)
        b = search_query_string(s, q, k=20, tie_round=TIE, route_bool=False)
        assert [d for d, _ in a] == [d for d, _ in b], q
        np.testing.assert_allclose(
            [v for _, v in a], [v for _, v in b], rtol=1e-9, err_msg=q
        )


# ------------------------------------------------- simple_query_string

def test_simple_parser_groups():
    from data_prepper_spark.index.querystring import (
        parse_simple_query_string,
    )

    got = parse_simple_query_string('spark qu* -batch | "the data"~2 fast^2')
    assert got == [
        [Clause("must", "term", "spark"),
         Clause("must", "prefix", "qu"),
         Clause("must_not", "term", "batch")],
        [Clause("must", "phrase", "the data", slop=2),
         Clause("must", "term", "fast", boost=2.0)],
    ]


SQS_CASES = [
    "tok0010 tok0011 | tok0020",
    '"of the" | tok001* -tok0015',
    "tok0042 -of | tok0031 tok0032 | zzqq*",
    "tok0030^3 | tok0030",            # a doc matched by both groups sums
    "the | the",                      # identical groups double the score
    "zzqq* | qqzz",                   # nothing matches anywhere
]


def test_simple_query_string_matches_oracle(spark, qs_index, oracle_tiny,
                                            positions_by_doc):
    """simple_query_string == Σ over fully-matched OR groups of the
    group's clause-sum — oracle evaluates each group independently
    (all-must semantics) with the scoring oracle that does NOT share
    the engine's evaluation path; driver == distributed."""
    from data_prepper_spark.index.querystring import (
        clause_to_qs,
        parse_simple_query_string,
        search_simple_query_string,
    )

    s = BM25Searcher(spark, qs_index)
    for q in SQS_CASES:
        total = {}
        for g in parse_simple_query_string(q):
            if not any(c.occur == "must" for c in g):
                continue
            gq = " ".join(clause_to_qs(c) for c in g)
            for d, v in _oracle_qs(oracle_tiny, positions_by_doc,
                                   gq).items():
                total[d] = total.get(d, 0.0) + v
        want = _rank(total, 10)
        got = search_simple_query_string(s, q, k=10, tie_round=TIE)
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_allclose(
            [v for _, v in got], [v for _, v in want], rtol=1e-9,
            err_msg=q,
        )
        dst = search_simple_query_string(s, q, k=10, tie_round=TIE,
                                         distributed=True)
        assert [d for d, _ in dst] == [d for d, _ in got], q
        np.testing.assert_allclose(
            [v for _, v in dst], [v for _, v in got], rtol=1e-12,
            err_msg=q,
        )
