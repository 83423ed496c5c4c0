"""DLQ / quarantine tests (tags_on_failure + S3DlqWriter analogs)."""

import os

from pyspark.sql import functions as F

from data_prepper_spark.operators.dlq import quarantine, tag_failures, write_quarantine
from data_prepper_spark.operators.mutate import no_op, select_entries


def test_tag_failures_and_quarantine(spark, workdir):
    df = spark.createDataFrame(
        [(1, "ok", 10), (2, None, 20), (3, "ok", -5), (4, None, -1)],
        "id int, msg string, v int",
    )
    checks = {
        "msg_missing": F.col("msg").isNotNull(),
        "v_negative": F.col("v") >= 0,
    }
    tagged = tag_failures(df, checks)
    m = {r["id"]: sorted(r["_failure_tags"]) for r in tagged.collect()}
    assert m[1] == []
    assert m[2] == ["msg_missing"]
    assert m[3] == ["v_negative"]
    assert m[4] == ["msg_missing", "v_negative"]

    good, bad = quarantine(df, checks)
    assert sorted(r["id"] for r in good.collect()) == [1]
    assert "_failure_tags" not in good.columns
    qpath = os.path.join(workdir, "dlq")
    assert write_quarantine(bad, qpath) == 3
    back = spark.read.parquet(qpath)
    assert back.count() == 3
    assert "_quarantined_at" in back.columns


def test_select_entries_noop(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id int, s string, v double")
    assert select_entries(df, ["id", "v"]).columns == ["id", "v"]
    assert no_op(df) is df
