"""Kill-resume fixture (FIXTURES.md F5): kill the build after ≥1 but <all
posting bucket-groups commit; rerun; assert (a) completed work is not
recomputed, (b) the final index equals an uninterrupted build's, (c) top-k
answers unchanged. Mirrors the reference's lease/ack semantics
(LeaseBasedSourceCoordinator + positive-ack completePartition)."""

import os

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.index.build import BuildKilled, build_index
from data_prepper_spark.index.config import IndexConfig
from data_prepper_spark.index.ledger import Ledger
from data_prepper_spark.index.query import BM25Searcher

CFG = IndexConfig(range_bits=2, block_size=16, n_buckets=8)
GROUPS = 4


def _postings_fingerprint(spark, index_dir):
    df = spark.read.parquet(f"{index_dir}/postings")
    return sorted(
        (
            r["term_id"], r["range_id"], r["df_slice"],
            bytes(r["doc_ids"]).hex(), bytes(r["tfs"]).hex(), bytes(r["dls"]).hex(),
        )
        for r in df.collect()
    )


def test_kill_resume(spark, tiny_corpus_path, workdir, oracle_tiny):
    pages = spark.read.parquet(tiny_corpus_path)

    # uninterrupted reference build
    ref_dir = os.path.join(workdir, "index_ref")
    build_index(spark, pages, ref_dir, CFG, src_tag="tiny", bucket_groups=GROUPS)

    # interrupted build: die after the 2nd posting group commits
    idx_dir = os.path.join(workdir, "index_resume")

    def killer(stage, pid):
        if stage == "postings" and pid == 1:
            raise BuildKilled("simulated crash")

    with pytest.raises(BuildKilled):
        build_index(
            spark, pages, idx_dir, CFG, src_tag="tiny",
            bucket_groups=GROUPS, fault_injector=killer,
        )
    led = Ledger(idx_dir)
    done_before = led.completed("postings")
    assert done_before == {0, 1}

    # resume: completed groups must be skipped (fault injector now fails on
    # any group it already saw — reprocessing would raise)
    def must_not_recompute(stage, pid):
        if stage == "postings" and pid in done_before:
            raise AssertionError(f"group {pid} was recomputed")

    build_index(
        spark, pages, idx_dir, CFG, src_tag="tiny",
        bucket_groups=GROUPS, fault_injector=must_not_recompute,
    )
    led2 = Ledger(idx_dir)
    assert led2.completed("postings") == set(range(GROUPS))
    # tokens stage ran exactly once across both attempts
    token_commits = [r for r in led2.rows() if r["stage"] == "tokens"]
    assert len(token_commits) == 1

    # (b) final index bytes equal the uninterrupted build's
    assert _postings_fingerprint(spark, idx_dir) == _postings_fingerprint(spark, ref_dir)

    # (c) answers unchanged and rank-identical to the oracle
    s = BM25Searcher(spark, idx_dir)
    for qt, k in [("zanzibar", 10), ("spark index", 10), ("the", 5)]:
        got = s.search(qt, k=k)
        want = oracle_tiny.topk(qt, k)
        assert [d for d, _ in got] == [d for d, _ in want], qt


def test_config_change_invalidates_ledger(spark, tiny_corpus_path, workdir):
    """A different input fingerprint (config change) must not reuse stale
    ledger rows — it rebuilds."""
    pages = spark.read.parquet(tiny_corpus_path)
    idx_dir = os.path.join(workdir, "index_fp")
    build_index(spark, pages, idx_dir, CFG, src_tag="tiny", bucket_groups=2)
    cfg2 = IndexConfig(range_bits=1, block_size=16, n_buckets=8)
    stats = build_index(spark, pages, idx_dir, cfg2, src_tag="tiny", bucket_groups=2)
    assert stats["range_bits"] == 1
    posts = spark.read.parquet(f"{idx_dir}/postings")
    assert posts.agg(F.max("range_id")).collect()[0][0] <= 1
