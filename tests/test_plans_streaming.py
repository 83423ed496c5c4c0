"""Pipeline-spec compiler + streaming parity tests.

The compiler test mirrors the reference's e2e log pipeline
(basic-grok-e2e-pipeline.yml: grok COMMONAPACHELOG → date → sink,
EndToEndBasicLogTest.java:47-90) end-to-end on synthetic CLF lines."""

import os

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.plans import compile_pipeline, run_pipeline


@pytest.fixture(scope="module")
def clf_df(spark):
    lines = [
        f'127.0.0.{i} - frank [11/Dec/2021:10:00:0{i % 10} -0700] '
        f'"GET /page/{i} HTTP/1.0" {200 if i % 3 else 500} {1000 + i}'
        for i in range(10)
    ]
    return spark.createDataFrame([(l,) for l in lines], "log string")


def test_e2e_log_pipeline(spark, clf_df, workdir):
    out_path = os.path.join(workdir, "plans_out")
    spec = {
        "source": clf_df,
        "processor": [
            {"grok": {"match": {"log": ["%{COMMONAPACHELOG}"]}}},
            {
                "date": {
                    "match_key": "timestamp",
                    "patterns": ["dd/MMM/yyyy:HH:mm:ss Z"],
                    "destination": "@timestamp",
                }
            },
            {"convert_entry_type": {"key": "response", "type": "integer"}},
            {"add_entries": {"entries": [{"key": "pipe", "value": "grok-pipeline"}]}},
        ],
        "route": {"errors": "/response >= 500", "ok": "/response < 500"},
        "sink": [
            {"parquet": {"path": out_path, "routes": ["errors"]}},
            {"count": {"routes": ["ok"]}},
        ],
    }
    written = run_pipeline(spark, spec)
    assert written["count"] == 6  # i in 3,6,9 → 500s are i=0,3,6,9 → 4 errors, 6 ok
    assert written[out_path] == 4
    back = spark.read.parquet(out_path)
    r = back.orderBy("request").collect()[0]
    assert r["clientip"].startswith("127.0.0.")
    assert r["response"] == 500
    assert r["pipe"] == "grok-pipeline"
    assert r["@timestamp"].startswith("2021-12-11T17:00:0")  # -0700 → UTC


def test_compile_routes_default(spark, clf_df):
    spec = {
        "source": clf_df,
        "processor": [{"grok": {"match": {"log": ["%{COMMONAPACHELOG}"]}}}],
        "route": {"errors": '/response == "500"'},
    }
    routed = compile_pipeline(spark, spec)
    assert routed["errors"].count() == 4
    assert routed["_default"].count() == 6


def test_aggregate_in_pipeline(spark):
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:01"), (2, "a", "2024-01-01 00:30:00"),
         (3, "b", "2024-01-01 01:10:00")],
        "id int, k string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    spec = {
        "source": df,
        "processor": [
            {
                "aggregate": {
                    "identification_keys": ["k"],
                    "action": "count",
                    "ts_col": "ts",
                    "group_duration": "1 hour",
                    "count_key": "n",
                }
            }
        ],
    }
    out = compile_pipeline(spark, spec)["_default"]
    m = {(r["k"], r["window"]["start"].hour): r["n"] for r in out.collect()}
    assert m[("a", 0)] == 2 and m[("b", 1)] == 1


def test_tumbling_and_session_windows_batch(spark):
    from data_prepper_spark.streaming import session_gap_agg, tumbling_count

    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00"), ("u1", "2024-01-01 00:00:30"),
         ("u1", "2024-01-01 00:10:00"), ("u2", "2024-01-01 00:00:10")],
        "user string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    tc = tumbling_count(df, ["user"], "ts", "5 minutes", count_key="n")
    m = {(r["user"], r["window"]["start"].minute): r["n"] for r in tc.collect()}
    assert m[("u1", 0)] == 2 and m[("u1", 10)] == 1 and m[("u2", 0)] == 1
    sg = session_gap_agg(df, ["user"], "ts", "2 minutes")
    sessions = {(r["user"], r["n_events"]) for r in sg.collect()}
    assert sessions == {("u1", 2), ("u1", 1), ("u2", 1)}


def test_streaming_windowed_count(spark, workdir):
    """True readStream → window agg → memory sink, availableNow."""
    src = os.path.join(workdir, "stream_src")
    df = spark.createDataFrame(
        [(i, f"u{i % 2}", f"2024-01-01 00:{i:02d}:00") for i in range(10)],
        "id long, user string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "id long, user string, ts timestamp"
    ).parquet(src)
    from data_prepper_spark.streaming import streaming_count

    agg = streaming_count(stream, ["user"], "ts", "5 minutes", watermark="10 minutes", count_key="n")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM win_counts").collect()
    got = {(r["user"], r["window"]["start"].minute): r["n"] for r in rows}
    # minutes 0-9, users alternate: window [0,5) → u0:3 (0,2,4), u1:2 (1,3)
    assert got[("u0", 0)] == 3 and got[("u1", 0)] == 2
    assert got[("u0", 5)] == 2 and got[("u1", 5)] == 3


def test_streaming_incremental_tokens(spark, tiny_corpus_path, workdir):
    from data_prepper_spark.index.config import IndexConfig
    from data_prepper_spark.streaming import streaming_incremental_tokens

    staging = os.path.join(workdir, "stream_tokens")
    ckpt = os.path.join(workdir, "stream_ckpt")
    pages = spark.readStream.schema(
        "url string, warc_ts timestamp, html binary, text string, lang string"
    ).parquet(tiny_corpus_path)
    writer = streaming_incremental_tokens(pages, staging, ckpt, IndexConfig(range_bits=2))
    q = writer.start()
    q.awaitTermination(300)
    toks = spark.read.parquet(staging)
    assert toks.count() > 0
    assert set(toks.columns) >= {"doc_id", "term", "tf", "dl"}
    # restart with no new data → no duplicates (checkpoint exactly-once)
    n1 = toks.count()
    q2 = streaming_incremental_tokens(pages, staging, ckpt, IndexConfig(range_bits=2)).start()
    q2.awaitTermination(120)
    assert spark.read.parquet(staging).count() == n1


def test_stateful_count_conclude(spark, workdir):
    """applyInPandasWithState: a group crossing the count threshold
    concludes immediately ('threshold'); an under-threshold group parks
    in state and its processing-time timer concludes it ('timeout') —
    the reference's AggregateGroupManager group_duration semantics."""
    from data_prepper_spark.streaming import stateful_count_conclude

    src = os.path.join(workdir, "state_src")
    rows = [(i, "hot") for i in range(7)] + [(100 + i, "cold") for i in range(2)]
    spark.createDataFrame(rows, "id long, k string").write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("id long, k string").parquet(src)
    out = stateful_count_conclude(stream, ["k"], threshold=5, timeout_ms=2000)
    q = (
        out.writeStream.format("memory")
        .queryName("concluded")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # a live timer keeps the query running past availableNow's drain —
    # poll the sink until both conclusions arrive, then stop explicitly
    import time as _time

    deadline = _time.time() + 90
    while _time.time() < deadline:
        if spark.sql("SELECT count(*) AS c FROM concluded").collect()[0]["c"] >= 2:
            break
        _time.sleep(1)
    q.stop()
    got = {(r["k"], r["n"], r["concluded_by"]) for r in spark.sql("SELECT * FROM concluded").collect()}
    assert ("hot", 7, "threshold") in got
    assert ("cold", 2, "timeout") in got


def test_sink_routes_without_route_section_errors(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="no `route:` section"):
        run_pipeline(spark, {"source": df, "sink": [{"count": {"routes": ["errors"]}}]})
