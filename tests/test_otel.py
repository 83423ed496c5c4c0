"""OTLP trace decode (operators/otel.py) — wire-format round-trip,
reference field semantics (OTelProtoCodec.java:261-291,379-381), and the
mapInPandas distributed path."""

import struct

import pytest

from data_prepper_spark.operators import otel


def _mk_span(eid, tn, pos):
    start = 1_700_000_000_000_000_000 + eid * 1_000_000
    return otel.encode_span(
        tn.to_bytes(16, "big"), (eid + 1).to_bytes(8, "big"),
        b"" if pos == 0 else (tn * 4 + 1).to_bytes(8, "big"),
        f"op-{eid % 7}", 2 if pos == 0 else 3,
        start, start + 5000, status_code=eid % 3,
    )


def test_roundtrip_fields():
    req = otel.encode_trace_request(
        {"svc-a": [_mk_span(0, 0, 0)], "svc-b": [_mk_span(1, 0, 1)]}
    )
    rows = otel.decode_trace_request(req)
    assert len(rows) == 2
    root = next(r for r in rows if r["parent_span_id"] == "")
    child = next(r for r in rows if r["parent_span_id"] != "")
    assert root["kind"] == "SPAN_KIND_SERVER"
    assert child["kind"] == "SPAN_KIND_CLIENT"
    # traceGroup: root keeps its name, child NULL (OTelProtoCodec:379)
    assert root["trace_group"] == root["name"]
    assert child["trace_group"] is None
    assert child["parent_span_id"] == root["span_id"]
    assert root["service_name"] == "svc-a"
    assert child["service_name"] == "svc-b"
    assert root["duration_nanos"] == 5000
    assert child["status_code"] == 1
    assert len(root["trace_id"]) == 32 and len(root["span_id"]) == 16


def test_unknown_fields_skipped():
    """Forward compat: unknown span fields (here #20, a varint and a
    length-delimited blob) must be skipped, like protobuf itself."""
    sp = _mk_span(2, 0, 2)
    extra = otel._fld(20, 0, otel._wr_varint(99)) + otel._fld(21, 2, b"blob")
    req = otel.encode_trace_request({"svc": [sp + extra]})
    rows = otel.decode_trace_request(req)
    assert len(rows) == 1 and rows[0]["name"] == "op-2"


def test_anyvalue_scalars():
    enc_int = otel._fld(3, 0, otel._wr_varint(42))
    assert otel._anyvalue(enc_int) == 42
    enc_dbl = otel._fld(4, 1, struct.pack("<d", 2.5))
    assert otel._anyvalue(enc_dbl) == 2.5
    enc_bool = otel._fld(2, 0, otel._wr_varint(1))
    assert otel._anyvalue(enc_bool) is True


def test_spark_decode_distributed(spark):
    reqs = []
    for t in range(6):
        spans = [_mk_span(t * 4 + p, t, p) for p in range(4)]
        reqs.append((otel.encode_trace_request({f"svc-{t % 3}": spans}),))
    df = spark.createDataFrame(reqs, "payload binary").repartition(3)
    out = otel.otel_trace_decode(df)
    rows = out.collect()
    assert len(rows) == 24
    assert {r["kind"] for r in rows} == {"SPAN_KIND_SERVER", "SPAN_KIND_CLIENT"}
    roots = [r for r in rows if r["parent_span_id"] == ""]
    assert len(roots) == 6 and all(r["trace_group"] == r["name"] for r in roots)


def test_service_map_composition(spark):
    """decode → service_map end-to-end: cross-service parent→child edges."""
    from data_prepper_spark.operators.aggregate import service_map

    spans = [_mk_span(p, 0, p) for p in range(3)]
    req = otel.encode_trace_request({"svc-root": [spans[0]],
                                     "svc-leaf": spans[1:]})
    df = spark.createDataFrame([(req,)], "payload binary")
    edges = service_map(
        otel.otel_trace_decode(df),
        trace_col="trace_id", span_col="span_id",
        parent_col="parent_span_id", service_col="service_name",
        kind_col="kind",
    ).collect()
    assert len(edges) == 1
    assert (edges[0]["serviceName"], edges[0]["destination"]) == (
        "svc-root", "svc-leaf",
    )


def test_truncated_payload_raises():
    req = otel.encode_trace_request({"svc": [_mk_span(0, 0, 0)]})
    with pytest.raises((IndexError, ValueError)):
        otel.decode_trace_request(req[: len(req) // 2])


def test_metrics_roundtrip():
    g = otel.encode_metric(
        "cpu", "1", "GAUGE", [otel.encode_number_point(10, 20, 0.75)]
    )
    s = otel.encode_metric(
        "reqs", "1", "SUM", [otel.encode_number_point(10, 20, 42, as_int=True)],
        monotonic=True, temporality=2,
    )
    h = otel.encode_metric(
        "lat", "ms", "HISTOGRAM",
        [otel.encode_hist_point(10, 20, 7, [2, 4, 1], [1.0, 5.0])],
        temporality=1,
    )
    rows = otel.decode_metrics_request(
        otel.encode_metrics_request({"svc": [g, s, h]})
    )
    by_kind = {r["kind"]: r for r in rows}
    assert by_kind["GAUGE"]["value"] == 0.75
    assert by_kind["GAUGE"]["is_monotonic"] is None
    assert by_kind["SUM"]["value"] == 42.0
    assert by_kind["SUM"]["is_monotonic"] is True
    assert by_kind["SUM"]["aggregation_temporality"] == 2
    assert by_kind["HISTOGRAM"]["value"] == 7.0
    assert by_kind["HISTOGRAM"]["bucket_counts"] == [2, 4, 1]
    assert by_kind["HISTOGRAM"]["explicit_bounds"] == [1.0, 5.0]
    assert all(r["service_name"] == "svc" for r in rows)


def test_metrics_spark_decode(spark):
    reqs = [
        (otel.encode_metrics_request({
            f"svc-{i}": [otel.encode_metric(
                "m", "1", "GAUGE",
                [otel.encode_number_point(i, i + 1, i * 1.5)],
            )]
        }),)
        for i in range(4)
    ]
    df = spark.createDataFrame(reqs, "payload binary").repartition(2)
    rows = otel.otel_metrics_decode(df).collect()
    assert len(rows) == 4
    assert sorted(r["value"] for r in rows) == [0.0, 1.5, 3.0, 4.5]


def test_logs_roundtrip():
    """encode_log_record → decode_logs_request: every field survives;
    string bodies pass through, non-string bodies JSON-encode; absent
    optional fields take proto3 defaults (0 / empty)."""
    rec1 = otel.encode_log_record(
        1_700_000_000_000_000_000, 9, "INFO", "hello world",
        trace_id=bytes.fromhex("00" * 15 + "2a"),
        span_id=bytes.fromhex("00" * 7 + "2a"),
        observed_ns=1_700_000_000_000_500_000,
        attrs={"b": "2", "a": "1"},
    )
    rec2 = otel.encode_log_record(5, 0, "", 42)          # int body, bare
    rec3 = otel.encode_log_record(6, 17, "ERROR", 2.5)   # double body
    req = otel.encode_logs_request({"web": [rec1, rec2], "db": [rec3]})
    rows = otel.decode_logs_request(req)
    assert len(rows) == 3
    by_body = {r["body"]: r for r in rows}
    r1 = by_body["hello world"]
    assert r1["service_name"] == "web"
    assert r1["severity_number"] == 9 and r1["severity_text"] == "INFO"
    assert r1["trace_id"].endswith("2a") and len(r1["trace_id"]) == 32
    assert r1["observed_time_unix_nano"] == 1_700_000_000_000_500_000
    assert r1["attributes_json"] == '{"a": "1", "b": "2"}'
    r2 = by_body["42"]  # non-string body JSON-encoded
    assert r2["severity_number"] == 0 and r2["trace_id"] == ""
    assert r2["attributes_json"] == "{}"
    assert by_body["2.5"]["service_name"] == "db"


def test_logs_spark_decode(spark):
    reqs = [
        (otel.encode_logs_request({
            f"svc-{i}": [otel.encode_log_record(i, 1 + i, "INFO", f"line {i}")]
        }),)
        for i in range(4)
    ]
    df = spark.createDataFrame(reqs, "payload binary").repartition(2)
    rows = otel.otel_logs_decode(df).collect()
    assert len(rows) == 4
    assert sorted(r["body"] for r in rows) == [f"line {i}" for i in range(4)]
    assert sorted(r["severity_number"] for r in rows) == [1, 2, 3, 4]


def test_metrics_roundtrip_summary_and_exponential():
    """The five-family completion (OTelMetricsRawProcessor.java:230-238):
    exponential_histogram materializes bucket bounds from scale/offset
    (base = 2^(2^-scale)), summary carries the quantile→value list."""
    e = otel.encode_metric(
        "lat2", "ms", "EXPONENTIAL_HISTOGRAM",
        [otel.encode_exp_hist_point(
            10, 20, 9, scale=1, zero_count=2, pos_offset=-2,
            pos_counts=[3, 4, 2], neg_offset=1, neg_counts=[5],
            sum_val=12.5,
        )],
        temporality=1,
    )
    m = otel.encode_metric(
        "rt", "s", "SUMMARY",
        [otel.encode_summary_point(10, 20, 100, 55.5,
                                   [(0.5, 1.0), (0.99, 9.0)])],
    )
    rows = otel.decode_metrics_request(
        otel.encode_metrics_request({"svc": [e, m]})
    )
    by_kind = {r["kind"]: r for r in rows}
    eh = by_kind["EXPONENTIAL_HISTOGRAM"]
    assert eh["value"] == 9.0 and eh["sum"] == 12.5
    assert eh["scale"] == 1 and eh["zero_count"] == 2
    assert eh["positive_offset"] == -2
    assert eh["bucket_counts"] == [3, 4, 2]
    base = 2.0 ** (2.0 ** -1)  # sqrt(2)
    assert eh["explicit_bounds"] == pytest.approx(
        [base ** i for i in range(-2, 2)]
    )
    assert eh["negative_offset"] == 1
    assert eh["negative_bucket_counts"] == [5]
    assert eh["aggregation_temporality"] == 1
    su = by_kind["SUMMARY"]
    assert su["value"] == 100.0 and su["sum"] == 55.5
    assert su["quantiles"] == [
        {"quantile": 0.5, "value": 1.0},
        {"quantile": 0.99, "value": 9.0},
    ]
    assert su["aggregation_temporality"] is None
    assert su["is_monotonic"] is None


def test_metrics_spark_decode_all_five_kinds(spark):
    ms = [
        otel.encode_metric("g", "1", "GAUGE",
                           [otel.encode_number_point(1, 2, 0.5)]),
        otel.encode_metric("s", "1", "SUM",
                           [otel.encode_number_point(1, 2, 7, as_int=True)]),
        otel.encode_metric("h", "ms", "HISTOGRAM",
                           [otel.encode_hist_point(1, 2, 3, [1, 2], [5.0])]),
        otel.encode_metric("e", "ms", "EXPONENTIAL_HISTOGRAM",
                           [otel.encode_exp_hist_point(
                               1, 2, 6, scale=0, zero_count=0,
                               pos_offset=0, pos_counts=[2, 4])]),
        otel.encode_metric("q", "s", "SUMMARY",
                           [otel.encode_summary_point(
                               1, 2, 10, 5.0, [(0.5, 2.0)])]),
    ]
    df = spark.createDataFrame(
        [(otel.encode_metrics_request({"svc": ms}),)], "payload binary"
    )
    got = {r["kind"]: r for r in otel.otel_metrics_decode(df).collect()}
    assert set(got) == {"GAUGE", "SUM", "HISTOGRAM",
                        "EXPONENTIAL_HISTOGRAM", "SUMMARY"}
    assert list(got["EXPONENTIAL_HISTOGRAM"]["explicit_bounds"]) == \
        [1.0, 2.0, 4.0]
    assert [q.asDict() for q in got["SUMMARY"]["quantiles"]] == \
        [{"quantile": 0.5, "value": 2.0}]
    assert got["HISTOGRAM"]["sum"] is None  # not encoded in this fixture
    assert got["GAUGE"]["quantiles"] is None
