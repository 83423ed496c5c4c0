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
