"""Data Prepper processor-equivalent operator tests (SURVEY.md §2.3-2.7).

Pattern mirrors the reference's per-plugin unit tests (build config, run
on synthetic events, assert output — e.g. GrokProcessorTests.java,
KeyValueProcessorTests.java, AggregateProcessorTest.java)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.operators import aggregate as agg
from data_prepper_spark.operators import dates, mutate, routing, strings

CLF = (
    '127.0.0.1 - frank [11/Dec/2021:10:00:00 -0700] '
    '"GET /apache_pb.gif?paramKey1=paramValue1 HTTP/1.0" 200 2326'
)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, "2024-01-01 00:00:01", "click", 10.0, 7),
        (2, "2024-01-01 00:00:02", "view", 20.0, 7),
        (3, "2024-01-01 00:00:02", "error", 30.0, 7),
        (4, "2024-01-01 00:59:59", "click", 40.0, 8),
        (5, "2024-01-01 01:00:01", "purchase", 50.0, 8),
        (6, "2024-01-01 01:00:01", "view", 5.0, 7),
    ]
    return spark.createDataFrame(
        rows, "id int, ts_s string, event_type string, value double, user int"
    ).withColumn("ts", F.to_timestamp("ts_s"))


def test_add_entries_format_and_expr(events):
    out = mutate.add_entries(
        events,
        [
            {"key": "tag", "format": "${/event_type}-${/user}"},
            {"key": "double_value", "value_expression": "/value * 2"},
            {"key": "const", "value": 7},
        ],
    )
    r = {x["id"]: x for x in out.collect()}
    assert r[1]["tag"] == "click-7"
    assert r[3]["double_value"] == 60.0
    assert r[2]["const"] == 7


def test_add_entries_when_guard(events):
    out = mutate.add_entries(
        events, [{"key": "flag", "value": "hot", "add_when": "/value >= 30"}]
    )
    r = {x["id"]: x["flag"] for x in out.collect()}
    assert r[3] == "hot" and r[1] is None


def test_copy_rename_delete(events):
    out = mutate.copy_values(events, [{"from_key": "value", "to_key": "v2"}])
    out = mutate.rename_keys(out, [{"from_key": "event_type", "to_key": "etype"}])
    out = mutate.delete_entries(out, ["ts_s"])
    assert "v2" in out.columns and "etype" in out.columns
    assert "event_type" not in out.columns and "ts_s" not in out.columns
    assert out.filter(F.col("v2") != F.col("value")).count() == 0


def test_convert_entry_type(spark):
    df = spark.createDataFrame([("12",), ("-",), ("7",)], "x string")
    out = mutate.convert_entry_type(df, "x", "integer", null_values=["-"])
    vals = [r["x"] for r in out.collect()]
    assert sorted(v for v in vals if v is not None) == [7, 12]
    assert None in vals


def test_translate_exact_and_range(events):
    out = mutate.translate_exact(
        events, "event_type", "code", {"click": "C", "view": "V"}, default="X"
    )
    r = {x["id"]: x["code"] for x in out.collect()}
    assert r[1] == "C" and r[2] == "V" and r[3] == "X"
    out2 = mutate.translate_range(
        events, "value", "bucket", [(0, 15, "low"), (15, 35, "mid")], default="high"
    )
    r2 = {x["id"]: x["bucket"] for x in out2.collect()}
    assert r2[1] == "low" and r2[3] == "mid" and r2[5] == "high"


def test_drop_events(events):
    out = mutate.drop_events(events, '/event_type == "error" and /value >= 10')
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 4, 5, 6]


def test_strings_chain(spark):
    df = spark.createDataFrame([("  Hello-World  ", "a=1&b=2")], "s string, kv string")
    out = strings.trim_string(df, ["s"])
    out = strings.substitute_string(out, [{"source": "s", "from": "-", "to": " "}])
    out = strings.lowercase_string(out, ["s"])
    r = out.collect()[0]
    assert r["s"] == "hello world"
    out2 = strings.key_value(df, "kv", "m")
    m = out2.collect()[0]["m"]
    assert m == {"a": "1", "b": "2"}


def test_split_and_csv(spark):
    df = spark.createDataFrame([("a,b,c", 'x,"y,z",w')], "s string, c string")
    out = strings.split_string(df, [{"source": "s", "delimiter": ","}])
    assert out.collect()[0]["s"] == ["a", "b", "c"]
    out2 = strings.csv_parse(df, "c", ["c1", "c2", "c3"])
    r = out2.collect()[0]
    assert (r["c1"], r["c2"], r["c3"]) == ("x", "y,z", "w")


def test_parse_json(spark):
    df = spark.createDataFrame([('{"k": 69, "s": "hi"}',)], "props string")
    out = strings.parse_json(df, "props", "k int, s string")
    r = out.collect()[0]
    assert r["k"] == 69 and r["s"] == "hi"


def test_grok_clf(spark):
    df = spark.createDataFrame([(CLF,), ("not a log line",)], "log string")
    out = strings.grok(df, {"log": ["%{COMMONAPACHELOG}"]})
    rows = out.collect()
    ok = [r for r in rows if r["log"] == CLF][0]
    assert ok["clientip"] == "127.0.0.1"
    assert ok["auth"] == "frank"
    assert ok["verb"] == "GET"
    assert ok["request"] == "/apache_pb.gif?paramKey1=paramValue1"
    assert ok["response"] == "200"
    assert ok["bytes"] == "2326"
    bad = [r for r in rows if r["log"] != CLF][0]
    assert bad["clientip"] is None


def test_obfuscate(spark):
    df = spark.createDataFrame([("call me at 555-123-4567 ok",)], "msg string")
    out = strings.obfuscate(df, "msg", [r"\d{3}-\d{3}-\d{4}"])
    assert out.collect()[0]["msg"] == "call me at *** ok"


def test_date_processor(spark):
    df = spark.createDataFrame(
        [("11/Dec/2021:10:00:00",), ("2021-12-11 10:00:00",), ("nope",)], "t string"
    )
    out = dates.date_processor(
        df, "t", ["dd/MMM/yyyy:HH:mm:ss", "yyyy-MM-dd HH:mm:ss"], destination="iso"
    )
    vals = [r["iso"] for r in out.collect()]
    assert vals.count(None) == 1
    assert all(v is None or v.startswith("2021-12-11T10:00:00.000") for v in vals)


def test_agg_count_window(events):
    out = agg.agg_count(events, ["event_type"], "ts", "1 hour", count_key="n")
    m = {(r["event_type"], r["window"]["start"].hour): r["n"] for r in out.collect()}
    assert m[("click", 0)] == 2 and m[("view", 1)] == 1


def test_agg_histogram(events):
    out = agg.agg_histogram(events, ["user"], "value", [10.0, 30.0, 50.0])
    r = {x["user"]: x for x in out.collect()}
    # user 7: values 10,20,30,5 → buckets: [5]<10 → b0; 10,20 → b1; 30 → b2
    assert r[7]["count"] == 4 and r[7]["min"] == 5.0 and r[7]["max"] == 30.0
    assert r[7]["bucket_counts"] == [1, 2, 1, 0]
    assert r[8]["bucket_counts"] == [0, 0, 1, 1]


def test_agg_put_all_append(events):
    out = agg.agg_put_all(events, ["user"], ["event_type", "value"], "ts")
    r = {x["user"]: x for x in out.collect()}
    assert r[8]["event_type"] == "purchase" and r[8]["value"] == 50.0
    out2 = agg.agg_append(events, ["user"], ["value"])
    r2 = {x["user"]: x["value"] for x in out2.collect()}
    assert r2[7] == [5.0, 10.0, 20.0, 30.0]


def test_remove_duplicates_and_rate_limiter(events):
    out = agg.remove_duplicates(events, ["event_type"], ["ts", "id"])
    kept = sorted(r["id"] for r in out.collect())
    assert kept == [1, 2, 3, 5]
    out2 = agg.rate_limiter(events, ["user"], 1, "ts")
    per_sec = out2.groupBy("user", F.date_trunc("second", "ts")).count().collect()
    assert all(r["count"] == 1 for r in per_sec)


def test_tail_sampler(events):
    out = agg.tail_sampler(
        events, ["user"], F.col("event_type") == "error", percent=0.0, sample_key="user"
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3, 6]


def test_service_map(spark):
    spans = spark.createDataFrame(
        [
            ("t1", "s1", None, "frontend", "SERVER"),
            ("t1", "s2", "s1", "auth", "CLIENT"),
            ("t1", "s3", "s1", "db", "CLIENT"),
            ("t2", "s4", None, "frontend", "SERVER"),
            ("t2", "s5", "s4", "auth", "CLIENT"),
        ],
        "traceId string, spanId string, parentSpanId string, serviceName string, spanKind string",
    )
    edges = agg.service_map(spans)
    got = sorted((r["serviceName"], r["destination"]) for r in edges.collect())
    assert got == [("frontend", "auth"), ("frontend", "db")]


def test_adjacent_pairs(events):
    out = agg.adjacent_pairs(events, "user", "ts", "event_type", "id")
    m = {(r["src"], r["dst"]): r["n_edges"] for r in out.collect()}
    assert m[("click", "view")] == 1
    assert m[("click", "purchase")] == 1


def test_routing(events):
    routed = routing.route(
        events,
        {"errors": '/event_type == "error"', "big": "/value >= 40"},
    )
    assert sorted(r["id"] for r in routed["errors"].collect()) == [3]
    assert sorted(r["id"] for r in routed["big"].collect()) == [4, 5]
    assert sorted(r["id"] for r in routed["_default"].collect()) == [1, 2, 6]
    tagged = routing.route_tagged(events, {"errors": '/event_type == "error"', "all": "true"})
    assert tagged.filter(F.col("_route") == "all").count() == 6
    assert tagged.count() == 7


def test_percent_sampler_deterministic(events):
    out1 = agg.percent_sampler(events, 50.0, "id")
    out2 = agg.percent_sampler(events, 50.0, "id")
    assert sorted(r["id"] for r in out1.collect()) == sorted(r["id"] for r in out2.collect())
    assert 0 < out1.count() < 6


def test_list_to_map(spark):
    # duplicate key 'a' — exercises all three modes (ListToMapProcessor
    # constructTargetNode :91-123)
    df = spark.createDataFrame(
        [(1, [{"k": "a", "v": "1"}, {"k": "b", "v": "2"}, {"k": "a", "v": "3"}])],
        "id int, arr array<struct<k string, v string>>",
    )
    grouped = mutate.list_to_map(df, "arr", "m", key="k", value_key="v")
    assert grouped.collect()[0]["m"] == {"a": ["1", "3"], "b": ["2"]}
    first = mutate.list_to_map(df, "arr", "m", key="k", value_key="v", flatten=True)
    assert first.collect()[0]["m"] == {"a": "1", "b": "2"}
    last = mutate.list_to_map(
        df, "arr", "m", key="k", value_key="v", flatten=True, flattened_element="last"
    )
    assert last.collect()[0]["m"] == {"a": "3", "b": "2"}
    whole = mutate.list_to_map(df, "arr", "m", key="k", flatten=True)
    assert whole.collect()[0]["m"]["a"].asDict() == {"k": "a", "v": "1"}


# ------------------------------------------------- round-2 option surface

def test_key_value_options(spark):
    df = spark.createDataFrame([("A=1&B=&C=xx3&Drop=9&Flag",)], "msg string")
    out = strings.key_value(
        df, "msg", "m",
        transform_key="lowercase",
        include_keys=["a", "b", "c", "flag", "extra"],
        default_values={"extra": "dv"},
        delete_value_regex="x",
        non_match_value="none",
    )
    m = out.collect()[0]["m"]
    assert m == {"a": "1", "b": "", "c": "3", "flag": "none", "extra": "dv"}


def test_key_value_exclude_and_delete_key(spark):
    df = spark.createDataFrame([("foo_a=1&foo_b=2&c=3",)], "msg string")
    out = strings.key_value(df, "msg", "m", exclude_keys=["c"], delete_key_regex="^foo_")
    assert out.collect()[0]["m"] == {"a": "1", "b": "2"}


def test_csv_header_event(spark):
    df = spark.createDataFrame([("1,foo,2.5", "id,typ,val")], "row string, hdr string")
    out = strings.csv_parse_header_event(df, "row", "hdr")
    r = out.collect()[0]
    assert r["parsed"] == {"id": "1", "typ": "foo", "val": "2.5"}
    assert "hdr" not in out.columns  # delete_header default
    # mismatched lengths truncate to the shorter side
    df2 = spark.createDataFrame([("1,foo,9,extra", "id,typ")], "row string, hdr string")
    assert strings.csv_parse_header_event(df2, "row", "hdr").collect()[0]["parsed"] == {
        "id": "1", "typ": "foo"
    }


def test_obfuscate_hash_action(spark):
    import hashlib

    df = spark.createDataFrame([("card 1111-2222 ok",)], "msg string")
    got = strings.obfuscate(df, "msg", [r"\d{4}-\d{4}"], action="hash").collect()[0]["msg"]
    want = "card " + hashlib.sha256(b"1111-2222").hexdigest() + " ok"
    assert got == want
    whole = strings.obfuscate(df, "msg", [], action="hash").collect()[0]["msg"]
    assert len(whole) == 64 and whole != "card 1111-2222 ok"


def test_translate_iterate_and_file(spark, workdir):
    import json
    import os

    df = spark.createDataFrame([(1, ["a", "b", "z"])], "id int, arr array<string>")
    out = mutate.translate_iterate(df, "arr", "t", {"a": "1", "b": "2"}, default="?")
    assert out.collect()[0]["t"] == ["1", "2", "?"]
    p = os.path.join(workdir, "map.json")
    with open(p, "w") as f:
        json.dump({"x": "ex"}, f)
    df2 = spark.createDataFrame([("x",), ("y",)], "s string")
    out2 = mutate.translate_file(df2, "s", "t", p, default="d")
    assert [r["t"] for r in out2.orderBy("s").collect()] == ["ex", "d"]


def test_grok_syslog_both_paths(spark):
    line = "Oct 11 22:14:15 web01 sshd[4242]: Accepted password"
    df = spark.createDataFrame([(line,)], "log string")
    for vec in (True, False):
        r = strings.grok(
            df, {"log": ["%{SYSLOGBASE} %{GREEDYDATA:message}"]}, vectorized=vec
        ).collect()[0]
        assert (r["timestamp"], r["logsource"], r["program"], r["pid"], r["message"]) == (
            "Oct 11 22:14:15", "web01", "sshd", "4242", "Accepted password"
        )


def test_date_source_timezone(spark):
    df = spark.createDataFrame([("2024-06-01 12:00:00",)], "raw string")
    out = dates.date_processor(
        df, "raw", ["yyyy-MM-dd HH:mm:ss"], destination="iso",
        source_timezone="America/New_York",
    )
    # noon EDT == 16:00 UTC
    assert out.collect()[0]["iso"].startswith("2024-06-01T16:00:00")


def test_tail_sampler_sample_key_effective(events):
    # percent=100 admits every group regardless of error condition
    out = agg.tail_sampler(
        events, ["user"], F.col("event_type") == "nope", percent=100.0, sample_key="user"
    )
    assert out.count() == 6


def test_route_tagged_empty(events):
    out = routing.route_tagged(events, {})
    assert out.count() == 0 and "_route" in out.columns


def test_key_value_recursive(spark):
    import json

    df = spark.createDataFrame(
        [("a=[b=1&c=2]&d=3&e={f=[g=4]&h=5}&i",)], "msg string"
    )
    out = strings.key_value_recursive(df, "msg", "j")
    got = json.loads(out.collect()[0]["j"])
    assert got == {
        "a": {"b": "1", "c": "2"},
        "d": "3",
        "e": {"f": {"g": "4"}, "h": "5"},
        "i": None,
    }
    # composes with parse_json for typed access
    typed = strings.parse_json(out, "j", "a struct<b string, c string>, d string", "t")
    r = typed.collect()[0]["t"]
    assert r["a"]["b"] == "1" and r["d"] == "3"


def test_key_value_default_not_overwriting_null_value(spark):
    # a PRESENT valueless pair keeps its null; only ABSENT keys get defaults
    df = spark.createDataFrame([("Flag&Type=x",)], "msg string")
    out = strings.key_value(
        df, "msg", "m", default_values={"Flag": "d", "Extra": "e"}
    )
    m = out.collect()[0]["m"]
    assert m["Flag"] is None and m["Extra"] == "e" and m["Type"] == "x"


def test_date_zone_no_double_shift(spark):
    df = spark.createDataFrame(
        [("2024-06-01 10:00:00 +0000", "2024-06-01 12:00:00")], "with_z string, no_z string"
    )
    # zone-carrying pattern: source_timezone must NOT re-shift
    out = dates.date_processor(
        df, "with_z", ["yyyy-MM-dd HH:mm:ss Z"], destination="iso",
        source_timezone="America/New_York",
    )
    assert out.collect()[0]["iso"].startswith("2024-06-01T10:00:00")
    # zone-less pattern: interpreted in the source zone (noon EDT = 16 UTC)
    out2 = dates.date_processor(
        df, "no_z", ["yyyy-MM-dd HH:mm:ss"], destination="iso",
        source_timezone="America/New_York",
    )
    assert out2.collect()[0]["iso"].startswith("2024-06-01T16:00:00")
