"""Physical-plan regression guards: the plan PROPERTIES the 100 TB story
depends on, pinned as tests so a refactor can't silently lose them
(the human-readable evidence lives in PLANS.md)."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def pages(spark, tiny_corpus_path):
    return spark.read.parquet(tiny_corpus_path)


def test_tokenize_pushdown_and_pruning(pages):
    from data_prepper_spark.index.config import IndexConfig
    from data_prepper_spark.index.tokenize import tokenize_stage

    p = plan_of(tokenize_stage(pages, IndexConfig()))
    assert "PushedFilters" in p and "lang" in p.split("PushedFilters", 1)[1][:200]
    # column pruning: the token stream must not read text or warc_ts
    read_schema = p.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "text" not in read_schema and "warc_ts" not in read_schema


def test_posting_build_single_exchange(pages):
    from data_prepper_spark.index.build import _term_bucket, encode_slice_fn
    from data_prepper_spark.index.config import SLICE_SCHEMA, IndexConfig
    from data_prepper_spark.index.tokenize import range_id_col, tokenize_stage

    cfg = IndexConfig(range_bits=2, n_buckets=16)
    tokens = tokenize_stage(pages, cfg)
    slices = (
        tokens.withColumn("range_id", range_id_col(cfg))
        .withColumn("term_bucket", _term_bucket(cfg))
        .select("term", "term_bucket", "range_id", "doc_id", "tf", "dl")
        .groupBy("term_bucket", "range_id")
        .applyInPandas(encode_slice_fn(200.0, cfg.k1, cfg.b, cfg.block_size), schema=SLICE_SCHEMA)
    )
    import re

    p = plan_of(slices)
    # ONE shuffle, on the salted coarse key (formatted output names each
    # node twice — tree + detail — so count the detail headers)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "hashpartitioning(term_bucket" in p


def test_bm25_scan_prunes(spark):
    from data_prepper_spark import entry_queries as eq
    from data_prepper_spark.hashing import pmod, xxh64_signed

    idx = eq._index_dir(spark, "/root/testdata/sf0.001")
    ids = [xxh64_signed(t) for t in ("spark", "data")]
    buckets = sorted({pmod(i, 16) for i in ids})
    pruned = (
        spark.read.parquet(f"{idx}/postings")
        .filter(F.col("term_bucket").isin(buckets) & F.col("term_id").isin(ids))
        .select("term_id", "doc_ids")
    )
    p = plan_of(pruned)
    assert "PartitionFilters" in p and "term_bucket" in p
    assert "term_id" in p.split("PushedFilters", 1)[1][:300]


def test_similarity_topk_two_stage(spark):
    from data_prepper_spark.trainprep import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    p = plan_of(similarity.brute_topk(emb, qs, k=3))
    # the partial top-k MapInPandas must sit below the final Window
    assert "MapInPandas" in p and "Window" in p
    assert p.index("MapInPandas") > p.index("Window")  # formatted plan lists top-down


def test_dedup_joins_never_cartesian(spark):
    from data_prepper_spark.trainprep import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for frame in (
        dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5),
        dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_perm=8, bands=4, materialize=False
        ),
        dedup.simhash_pairs(docs, "doc_id", "text"),
    ):
        p = plan_of(frame)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


def test_line_dedup_plan_shape(spark):
    """line_dedup: equi-joins only (no cartesian/NLJ), no Python eval
    in the plan — the whole pipeline is Catalyst."""
    from data_prepper_spark.trainprep import dedup

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.array(F.lit("a"), F.lit("b")).alias("lines"),
    )
    p = plan_of(dedup.line_dedup(df, "doc_id", "lines"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # count aggregation must have a map-side partial
    assert p.count("HashAggregate") >= 2


def test_url_dedup_plan_shape(spark):
    """url_dedup: canonicalization stays in the scan projection (no
    UDF, no extra shuffle before the single groupBy)."""
    from data_prepper_spark.trainprep import dedup

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://Ex.com/p?utm_source=x&id="), F.col("id")).alias("url"),
    )
    p = plan_of(dedup.url_dedup(df, "doc_id", "url"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p


def test_user_agent_dedupe_plan_shape(spark):
    """user_agent dedupe mode: the regex chain runs on the DISTINCT
    side only; no Python eval anywhere."""
    from data_prepper_spark.operators.enrich import user_agent

    df = spark.range(100).select(
        F.concat(F.lit("curl/8."), F.col("id")).alias("ua")
    )
    p = plan_of(user_agent(df, "ua"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
