"""Source codecs + enrichment operator tests."""

import os

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.operators.enrich import geoip, trace_group_fill, user_agent
from data_prepper_spark.sources import (
    read_csv,
    read_json_array,
    read_ndjson,
    read_newline,
    write_ndjson,
    write_parquet,
)


def test_newline_codec(spark, workdir):
    p = os.path.join(workdir, "lines.txt")
    with open(p, "w") as f:
        f.write("skipme\nheader_line\ndata1\ndata2\n")
    df = read_newline(spark, p, skip_lines=1, header_destination="hdr")
    rows = df.orderBy("message").collect()
    assert [r["message"] for r in rows] == ["data1", "data2"]
    assert all(r["hdr"] == "header_line" for r in rows)
    plain = read_newline(spark, p)
    assert plain.count() == 4


def test_json_codecs(spark, workdir):
    arr = os.path.join(workdir, "arr.json")
    with open(arr, "w") as f:
        f.write('[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]')
    df = read_json_array(spark, arr)
    assert sorted(r["a"] for r in df.collect()) == [1, 2]
    nd = os.path.join(workdir, "nd")
    write_ndjson(df, nd)
    back = read_ndjson(spark, nd)
    assert back.count() == 2


def test_csv_codec_and_parquet_sink(spark, workdir):
    p = os.path.join(workdir, "data.csv")
    with open(p, "w") as f:
        f.write('a,b\n1,"x,y"\n2,z\n')
    df = read_csv(spark, p)
    r = {x["a"]: x["b"] for x in df.collect()}
    assert r["1"] == "x,y" and r["2"] == "z"
    out = os.path.join(workdir, "pq_out")
    write_parquet(df, out, partition_by=["a"], max_records_per_file=1)
    assert spark.read.parquet(out).count() == 2


def test_user_agent(spark):
    uas = [
        ("Mozilla/5.0 (Windows NT 10.0; Win64) AppleWebKit/537.36 (KHTML, like Gecko) "
         "Chrome/120.0.0.0 Safari/537.36"),
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 "
         "(KHTML, like Gecko) Version/17.0 Mobile/15E148 Safari/604.1"),
        "curl/8.4.0",
        "weird-bot/1.0",
    ]
    df = spark.createDataFrame([(u,) for u in uas], "ua string")
    out = {r["ua"][:20]: r["user_agent"] for r in user_agent(df, "ua").collect()}
    chrome = out[uas[0][:20]]
    assert chrome["name"] == "Chrome" and chrome["version"] == "120.0.0"
    assert chrome["os"]["full"] == "Windows 10" and chrome["device"]["name"] == "Other"
    assert chrome["original"] == uas[0]
    iphone = out[uas[1][:20]]
    assert iphone["name"] == "Mobile Safari" and iphone["os"]["full"] == "iOS 17.0"
    assert iphone["device"]["name"] == "iPhone"
    assert out["curl/8.4.0"[:20]]["name"] == "curl"
    # 'weird-bot' hits the generic crawler device rule but no UA family
    weird = out["weird-bot/1.0"[:20]]
    assert weird["name"] == "Other" and weird["device"]["name"] == "Spider"


def test_geoip_stub(spark):
    df = spark.createDataFrame(
        [("10.1.2.3",), ("8.8.8.8",), ("200.1.1.1",)], "ip string"
    )
    out = {r["ip"]: r["geo"] for r in geoip(df, "ip").collect()}
    assert out["10.1.2.3"]["country"] == "private"
    assert out["8.8.8.8"]["country"] == "US"
    assert out["200.1.1.1"]["country"] == "other"
    # real mode is implemented (pure-python mmdb reader) — a missing db
    # file fails fast at plan time
    with pytest.raises(FileNotFoundError):
        geoip(df, "ip", mmdb_path="/nonexistent.mmdb")


def test_trace_group_fill(spark):
    spans = spark.createDataFrame(
        [
            ("t1", "s1", None, "checkout"),
            ("t1", "s2", "s1", "auth-call"),
            ("t1", "s3", "s2", "db-call"),
            ("t2", "s4", None, "search"),
            ("t2", "s5", "s4", "cache-call"),
        ],
        "traceId string, spanId string, parentSpanId string, name string",
    )
    out = trace_group_fill(spans)
    got = {r["spanId"]: r["traceGroup"] for r in out.collect()}
    assert got == {"s1": "checkout", "s2": "checkout", "s3": "checkout",
                   "s4": "search", "s5": "search"}


def test_user_agent_extended_families(spark):
    # expectations follow uap-core rule semantics (operators/uap.py)
    cases = [
        ("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
         "Googlebot", "2.1", "Spider"),
        ("Mozilla/5.0 (Linux; Android 13; SM-S901B) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
         "Samsung Internet", "23.0", "Samsung SM-S901B"),
        ("Mozilla/5.0 (Windows NT 6.1; Win64; x64) Chrome/109.0.0.0 Safari/537.36",
         "Chrome", "109.0.0", "Other"),
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X) CriOS/114.0.5735.99 Mobile/15E148 Safari/604.1",
         "Chrome Mobile iOS", "114.0.5735", "iPhone"),
        ("Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) Chrome/120.0.0.0 Safari/537.36",
         "Chrome", "120.0.0", "Other"),
        ("python-requests/2.31.0", "Python Requests", "2.31.0", "Other"),
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)], "i int, ua string")
    out = {r["i"]: r["user_agent"] for r in user_agent(df, "ua").collect()}
    for i, (_, name, ver, device) in enumerate(cases):
        assert out[i]["name"] == name, (i, out[i])
        assert out[i]["version"] == ver, (i, out[i])
        assert out[i]["device"]["name"] == device, (i, out[i])
    # os spot checks (reference os map: name/version/full)
    assert out[2]["os"]["full"] == "Windows 7"
    assert out[2]["os"]["name"] == "Windows" and out[2]["os"]["version"] == "7"
    assert out[4]["os"]["full"] == "Chrome OS 14541.0.0"


def test_uap_regexes_yaml_drop_in(spark, tmp_path):
    """A uap-core-format regexes.yaml loads and drives the engine —
    the bundled subset is swappable for the full public database."""
    from data_prepper_spark.operators.uap import load_regexes_yaml, parse_user_agent

    y = tmp_path / "regexes.yaml"
    y.write_text(
        """
user_agent_parsers:
  - regex: '(MyBrowser)/(\\d+)\\.(\\d+)\\.(\\d+)'
    family_replacement: 'My Browser'
  - regex: '(OtherTool)/(\\d+)'
os_parsers:
  - regex: '(MyOS) (\\d+)\\.(\\d+)'
device_parsers:
  - regex: 'mydevice'
    regex_flag: 'i'
    device_replacement: 'My Device'
"""
    )
    ua_r, os_r, dev_r = load_regexes_yaml(str(y))
    df = spark.createDataFrame(
        [("MyBrowser/3.2.1 (MyOS 9.4; MyDevice)",), ("OtherTool/7",)], "ua string"
    )
    out = parse_user_agent(
        df, "ua", ua_rules=ua_r, os_rules=os_r, device_rules=dev_r
    ).collect()
    byname = {r["ua"].split("/")[0]: r["user_agent"] for r in out}
    first = byname["MyBrowser"]
    assert first["name"] == "My Browser" and first["version"] == "3.2.1"
    assert first["os"]["full"] == "MyOS 9.4"
    assert first["device"]["name"] == "My Device"
    second = byname["OtherTool"]
    assert second["name"] == "OtherTool" and second["version"] == "7"
    assert second["os"]["name"] == "Other" and second["device"]["name"] == "Other"


# ------------------------------------------------------------ mmdb geoip

def test_mmdb_roundtrip_and_types():
    """Fixture writer → pure-python reader: tree walk, nested maps,
    doubles, negative ints, booleans, arrays, metadata."""
    from data_prepper_spark.sources.mmdb import MMDBReader, build_mmdb

    nets = [
        ("10.0.0.0/8", {"country": {"iso_code": "XX"},
                        "flags": {"anycast": True, "offset": -5},
                        "tags": ["a", "b"]}),
        ("52.0.0.0/8", {"location": {"latitude": 39.0, "longitude": -77.5}}),
        ("52.0.0.0/8".replace("52", "53"), {"country": {"iso_code": "YY"}}),
    ]
    r = MMDBReader(build_mmdb(nets))
    assert r.meta["ip_version"] == 4 and r.record_size == 24
    rec = r.lookup("10.200.1.1")
    assert rec["country"]["iso_code"] == "XX"
    assert rec["flags"]["anycast"] is True and rec["flags"]["offset"] == -5
    assert rec["tags"] == ["a", "b"]
    assert r.lookup("52.1.2.3")["location"]["longitude"] == -77.5
    assert r.lookup("53.0.0.1")["country"]["iso_code"] == "YY"
    assert r.lookup("99.0.0.1") is None
    assert r.lookup("::1") is None  # v6 addr against a v4 tree


def test_mmdb_rejects_overlap_and_garbage():
    import pytest as _pytest

    from data_prepper_spark.sources.mmdb import MMDBReader, build_mmdb

    with _pytest.raises(ValueError):
        build_mmdb([("10.0.0.0/8", {}), ("10.0.0.0/16", {})])
    with _pytest.raises(ValueError):
        MMDBReader(b"not a database")


def test_geoip_mmdb_mode(spark, tmp_path):
    """Real geoip mode end-to-end in Spark: mapInPandas over a fixture
    .mmdb, struct fields populated / NULL for unresolved."""
    from data_prepper_spark.operators.enrich import geoip
    from data_prepper_spark.sources.mmdb import build_mmdb

    db = build_mmdb([
        ("20.0.0.0/8", {"country": {"iso_code": "US", "names": {"en": "United States"}},
                        "city": {"names": {"en": "Boston"}},
                        "location": {"latitude": 42.4, "longitude": -71.1,
                                     "time_zone": "America/New_York"}}),
    ])
    p = tmp_path / "fix.mmdb"
    p.write_bytes(db)
    df = spark.createDataFrame(
        [("20.1.2.3",), ("99.9.9.9",), (None,)], "ip string"
    )
    rows = {r["ip"]: r["geo"] for r in geoip(df, "ip", mmdb_path=str(p)).collect()}
    hit = rows["20.1.2.3"]
    assert hit["country_iso_code"] == "US" and hit["city_name"] == "Boston"
    assert abs(hit["latitude"] - 42.4) < 1e-9
    assert hit["time_zone"] == "America/New_York"
    miss = rows["99.9.9.9"]
    assert miss["country_iso_code"] is None and miss["latitude"] is None
