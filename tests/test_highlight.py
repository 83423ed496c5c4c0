"""Hit highlighting (index/highlight.py) — deterministic plain-
highlighter semantics as pure Catalyst expressions."""

import pytest

from data_prepper_spark.index.highlight import (
    highlight_col,
    highlight_hits,
    highlight_pattern,
)


def test_highlight_col_semantics(spark):
    from pyspark.sql import functions as F

    rows = [
        # fragment anchors at the EARLIEST term occurrence ("data" at 0)
        (1, "data comes first and Spark follows in this sentence here"),
        # case-insensitive tagging, original case preserved in output
        (2, "x" * 50 + " SPARK lives mid-document " + "y" * 50),
        # word boundary: "sparkle" must NOT be tagged, "spark" must
        (3, "sparkle spark sparkle"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id",
            highlight_col(F.col("text"), "spark data", frag_size=60,
                          lead=10).alias("s"),
        ).collect()
    }
    assert out[1].startswith("<em>data</em> comes first")
    assert "<em>SPARK</em>" in out[2]
    assert out[3] == "sparkle <em>spark</em> sparkle"
    # fragment is bounded (tags excluded from the size budget by design:
    # the 60-char window is cut BEFORE tags are inserted)
    raw3 = "sparkle spark sparkle"
    assert len(out[3]) == len(raw3) + len("<em></em>")


def test_highlight_hits_rank_order(spark, tiny_corpus_path, tiny_index,
                                   oracle_tiny):
    index_dir, _, _ = tiny_index
    from data_prepper_spark.index.query import BM25Searcher

    s = BM25Searcher(spark, index_dir)
    docs = spark.read.parquet(tiny_corpus_path).selectExpr(
        "xxhash64(url) AS doc_id", "text"
    )
    hits = s.search("the data", k=5)
    got = highlight_hits(docs, hits, "the data")
    assert [d for d, _ in got] == [d for d, _ in hits]
    assert all("<em>" in snip for _, snip in got)


def test_highlight_pattern_rejects_empty():
    with pytest.raises(ValueError):
        highlight_pattern("!!!")


def test_term_vectors_matches_oracle(spark, tiny_corpus_path, tiny_index,
                                     oracle_tiny, tiny_pages_pd):
    """_termvectors on-the-fly: tf/df against the OracleIndex postings,
    first_pos against a direct tokenization; absent ids skipped."""
    from data_prepper_spark.hashing import xxh64_signed
    from data_prepper_spark.index.highlight import term_vectors
    from data_prepper_spark.index.query import BM25Searcher
    from data_prepper_spark.textproc import extract_text, tokenize

    index_dir, _, _ = tiny_index
    s = BM25Searcher(spark, index_dir)
    texts = {
        xxh64_signed(r.url): extract_text(r.html)
        for r in tiny_pages_pd.itertuples(index=False)
        if r.lang == "en"
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    ids = sorted(texts)[:4] + [123456789]  # + one absent id
    got = term_vectors(s, docs, ids)
    by_doc = {}
    for d, t, tf, first, dfv in got:
        by_doc.setdefault(d, {})[t] = (tf, first, dfv)
    assert set(by_doc) == set(ids[:4])
    for d in ids[:4]:
        toks = tokenize(texts[d])
        want_first = {}
        for i, t in enumerate(toks):
            want_first.setdefault(t, i)
        assert set(by_doc[d]) == set(want_first)
        for t, (tf, first, dfv) in by_doc[d].items():
            assert tf == oracle_tiny.postings[t][d], (d, t)
            assert first == want_first[t], (d, t)
            assert dfv == len(oracle_tiny.postings[t]), (d, t)
