"""Percolator (index/percolate.py) vs a brute per-(doc, query) python
oracle — reverse search with bool filter-context semantics."""

import pytest

from data_prepper_spark.textproc import tokenize

SPECS = [
    # (query_id, must, should, must_not, min_should)
    # — over the webtext corpus vocabulary (tokNNNN + function words)
    (0, ["tok0010"], [], [], 0),
    (1, ["tok0010", "tok0011"], [], [], 0),
    (2, [], ["tok0012", "tok0013", "tok0014"], [], 2),
    (3, ["tok0011"], ["tok0920", "tok0685"], [], 1),
    (4, ["tok0012"], [], ["tok0507"], 0),
    (5, [], ["tok0010"], ["the"], 1),    # head-term must_not: rare match
    (6, ["zzznotaterm"], [], [], 0),     # unmatchable must
    (7, ["the"], ["the"], [], 1),        # same term in two roles
]


def _brute(pages_pd):
    out = set()
    for r in pages_pd.itertuples(index=False):
        toks = set(tokenize(r.text))
        for qid, must, should, must_not, ms in SPECS:
            if any(t not in toks for t in must):
                continue
            if any(t in toks for t in must_not):
                continue
            if sum(1 for t in set(should) if t in toks) < ms:
                continue
            out.add((r.url, qid))
    return out


def test_percolate_matches_brute(spark, tiny_corpus_path, tiny_pages_pd):
    from pyspark.sql import functions as F

    from data_prepper_spark.index.percolate import (
        percolate,
        queries_from_specs,
    )

    q = queries_from_specs(spark, SPECS)
    docs = spark.read.parquet(tiny_corpus_path).withColumn(
        "doc_id", F.xxhash64("url")
    )
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(q, docs).collect()
    }
    from data_prepper_spark.hashing import xxh64_signed

    want = {(xxh64_signed(u), qid) for u, qid in _brute(tiny_pages_pd)}
    assert got == want
    assert not any(qid == 6 for _, qid in got)       # unmatchable must
    assert any(qid == 0 for _, qid in got)           # sanity: non-empty


def test_percolate_rejects_pure_negative(spark):
    from data_prepper_spark.index.percolate import queries_from_specs

    with pytest.raises(ValueError):
        queries_from_specs(spark, [(0, [], [], ["slow"], 0)])


def test_percolate_plan_shape(spark, tiny_corpus_path):
    """The plan must contain NO cartesian/nested-loop join — matching is
    the term equi-join + aggregation, requirements broadcast."""
    from pyspark.sql import functions as F

    from data_prepper_spark.index.percolate import (
        percolate,
        queries_from_specs,
    )

    q = queries_from_specs(spark, SPECS)
    docs = spark.read.parquet(tiny_corpus_path).withColumn(
        "doc_id", F.xxhash64("url")
    )
    plan = percolate(q, docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rank_eval_metrics():
    """rank_eval metric arithmetic (exact scaled integers) on hand-
    checked cases."""
    from data_prepper_spark.index.rankeval import rank_eval_metrics

    m = rank_eval_metrics([1, 2, 3, 4, 5], {2, 4, 9}, k=5)
    assert m == {
        "k": 5, "n_relevant": 3, "hits": 2,
        "precision_e6": 2 * 10**6 // 5,     # 0.4
        "recall_e6": 2 * 10**6 // 3,        # 0.666666
        "first_rank": 2, "mrr_e6": 500000,
    }
    # no relevant judged → recall undefined, mrr 0
    m0 = rank_eval_metrics([1, 2], set(), k=10)
    assert m0["recall_e6"] is None and m0["mrr_e6"] == 0
    assert m0["precision_e6"] == 0
    # relevant exists but none retrieved in k
    m1 = rank_eval_metrics([1, 2, 3], {99}, k=3)
    assert m1["hits"] == 0 and m1["first_rank"] is None
    assert m1["mrr_e6"] == 0 and m1["recall_e6"] == 0
    # k cuts the ranked list
    m2 = rank_eval_metrics([9, 1, 99], {99}, k=2)
    assert m2["hits"] == 0 and m2["first_rank"] is None
