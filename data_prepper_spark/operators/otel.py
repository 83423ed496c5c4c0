"""OTLP trace decode — ExportTraceServiceRequest bytes → span rows.

The reference's flagship trace-analytics entry point: its otel_trace
source receives OTLP protobuf over gRPC and OTelProtoCodec parses each
request into JacksonSpans (otel-proto-common/.../OTelProtoCodec.java:
261-291 parseSpan, 379-381 getTraceGroup).  No protobuf library exists
in this container, so this module carries a minimal PURE-PYTHON decoder
for the fixed, public OTLP trace wire format (opentelemetry-proto
trace/v1 + common/v1 — varint / length-delimited / fixed64 walking; the
schema is frozen by the OTLP spec, which is what makes a hand-rolled
walker safe).  Spark-side, decode runs as `mapInPandas` over a binary
payload column: one Arrow batch in, the concatenated span rows of its
requests out — the per-message Python loop is inherent to protobuf
(the reference's Java codec walks messages one-by-one too).

Field semantics mirror parseSpan exactly:
  - trace_id / span_id / parent_span_id: lowercase-hex strings
    (convertByteStringToString = Hex.encodeHexString);
  - kind: the enum NAME (SpanKind.name() — "SPAN_KIND_SERVER", ...);
  - service_name: resource attribute "service.name";
  - trace_group: root spans (empty parent) get their own name, others
    NULL (OTelProtoCodec.java:379-381) — trace_group_fill
    (operators/enrich.py) then propagates the root name trace-wide;
  - duration_nanos = end - start;
  - start/end stay as unix NANOS (int64, lossless); the reference
    renders ISO-8601 strings at sink time.
  - status_code: Status.code enum value (getSpanStatusAttributes).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SPAN_KIND_NAMES = [
    "SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL", "SPAN_KIND_SERVER",
    "SPAN_KIND_CLIENT", "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER",
]

SPAN_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, "
    "trace_state string, name string, kind string, service_name string, "
    "start_time_unix_nano long, end_time_unix_nano long, "
    "duration_nanos long, trace_group string, status_code int"
)


# ------------------------------------------------------- wire primitives

def _rd_varint(b: bytes, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        x = b[i]
        v |= (x & 0x7F) << shift
        i += 1
        if not (x & 0x80):
            return v, i
        shift += 7


def _fields(b: bytes) -> Iterator[tuple[int, int, object]]:
    """Walk one message's (field_no, wire_type, value) triples.
    wire 0 → int, wire 1 → 8 raw bytes, wire 2 → bytes, wire 5 → 4 raw
    bytes.  Unknown fields are yielded too (callers skip them) — forward
    compatibility, the same rule protobuf itself follows."""
    i, n = 0, len(b)
    while i < n:
        tag, i = _rd_varint(b, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _rd_varint(b, i)
        elif wt == 1:
            v, i = b[i : i + 8], i + 8
        elif wt == 2:
            ln, i = _rd_varint(b, i)
            v, i = b[i : i + ln], i + ln
        elif wt == 5:
            v, i = b[i : i + 4], i + 4
        else:  # groups (3/4) — not used by OTLP
            raise ValueError(f"unsupported wire type {wt}")
        if i > n:  # truncated length-delimited/fixed field
            raise ValueError("truncated protobuf payload")
        yield fno, wt, v


def _anyvalue(b: bytes):
    """common/v1 AnyValue → python scalar (string/bool/int/double);
    nested array/kvlist values are skipped (the reference JSON-encodes
    them — out of scope for the span columns we emit)."""
    for fno, wt, v in _fields(b):
        if fno == 1:
            return v.decode("utf-8")
        if fno == 2:
            return bool(v)
        if fno == 3:
            return v if v < (1 << 63) else v - (1 << 64)  # sint as 2c
        if fno == 4:
            return struct.unpack("<d", v)[0]
    return None


def _attrs(kvs: list[bytes]) -> dict:
    out = {}
    for kv in kvs:
        key, val = None, None
        for fno, wt, v in _fields(kv):
            if fno == 1:
                key = v.decode("utf-8")
            elif fno == 2:
                val = _anyvalue(v)
        if key is not None:
            out[key] = val
    return out


def _u64(v) -> int:
    """fixed64 bytes OR varint int → signed-int64-safe python int."""
    x = struct.unpack("<Q", v)[0] if isinstance(v, (bytes, bytearray)) else v
    return x if x < (1 << 63) else x - (1 << 64)


def _decode_span(b: bytes, service_name: str | None) -> dict:
    tid = sid = pid = b""
    state = ""
    name = ""
    kind = 0
    start = end = 0
    status_code = 0
    for fno, wt, v in _fields(b):
        if fno == 1:
            tid = v
        elif fno == 2:
            sid = v
        elif fno == 3:
            state = v.decode("utf-8")
        elif fno == 4:
            pid = v
        elif fno == 5:
            name = v.decode("utf-8")
        elif fno == 6:
            kind = v
        elif fno == 7:
            start = _u64(v)
        elif fno == 8:
            end = _u64(v)
        elif fno == 15:
            for f2, _, v2 in _fields(v):
                if f2 == 3:
                    status_code = v2
    return {
        "trace_id": tid.hex(),
        "span_id": sid.hex(),
        "parent_span_id": pid.hex(),
        "trace_state": state,
        "name": name,
        "kind": SPAN_KIND_NAMES[kind] if kind < 6 else str(kind),
        "service_name": service_name,
        "start_time_unix_nano": start,
        "end_time_unix_nano": end,
        "duration_nanos": end - start,
        # root spans carry their own name; children NULL until
        # trace_group_fill propagates (OTelProtoCodec.java:379-381)
        "trace_group": name if len(pid) == 0 else None,
        "status_code": int(status_code),
    }


def decode_trace_request(payload: bytes) -> list[dict]:
    """One ExportTraceServiceRequest → span row dicts (the pure-python
    core; OTelProtoCodec.parseExportTraceServiceRequest analog)."""
    rows: list[dict] = []
    for fno, wt, rs in _fields(payload):          # resource_spans = 1
        if fno != 1:
            continue
        service = None
        scope_spans: list[bytes] = []
        for f2, _, v2 in _fields(rs):
            if f2 == 1:                            # resource
                kvs = [v3 for f3, _, v3 in _fields(v2) if f3 == 1]
                service = _attrs(kvs).get("service.name")
            elif f2 == 2:                          # scope_spans
                scope_spans.append(v2)
        for ss in scope_spans:
            for f3, _, v3 in _fields(ss):
                if f3 == 2:                        # spans
                    rows.append(_decode_span(v3, service))
    return rows


def otel_trace_decode(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """OTLP trace requests (binary column) → one row per span, schema
    :data:`SPAN_SCHEMA` — the otel_trace source's decode stage as a
    distributed mapInPandas (payload partitioning is preserved; a
    request's spans never cross a task boundary, matching the
    reference's per-request parse)."""
    cols = [f.strip().split(" ")[0] for f in SPAN_SCHEMA.split(",")]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for payload in pdf[payload_col]:
                rows.extend(decode_trace_request(bytes(payload)))
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: [] for c in cols})
            )

    return df.mapInPandas(decode, schema=SPAN_SCHEMA)


# ------------------------------------------------------- metrics decode

METRIC_SCHEMA = (
    "name string, description string, unit string, kind string, "
    "service_name string, start_time_unix_nano long, time_unix_nano long, "
    "value double, is_monotonic boolean, aggregation_temporality int, "
    "bucket_counts array<long>, explicit_bounds array<double>, "
    "sum double, scale int, zero_count long, positive_offset int, "
    "negative_offset int, negative_bucket_counts array<long>, "
    "quantiles array<struct<quantile:double,value:double>>"
)

_METRIC_COLS = [f.strip().split(" ")[0] for f in METRIC_SCHEMA.split(", ")]

_AGG_TEMPORALITY = 2  # field in Sum/Histogram/ExponentialHistogram
_IS_MONOTONIC = 3

# every point decoder returns the FULL key set (None = not applicable for
# that metric kind) so the Arrow batch always carries typed nulls, never
# NaN-coerced columns
_POINT_DEFAULTS = {
    "start_time_unix_nano": 0, "time_unix_nano": 0, "value": None,
    "bucket_counts": None, "explicit_bounds": None, "sum": None,
    "scale": None, "zero_count": None, "positive_offset": None,
    "negative_offset": None, "negative_bucket_counts": None,
    "quantiles": None,
}


def _zz(u: int) -> int:
    """zigzag-decode a varint (sint32/sint64 wire form)."""
    return (u >> 1) ^ -(u & 1)


def _packed_varints(b: bytes) -> list[int]:
    out, i = [], 0
    while i < len(b):
        v, i = _rd_varint(b, i)
        out.append(v)
    return out


def _number_point(b: bytes) -> dict:
    start = t = 0
    val = None
    for fno, wt, v in _fields(b):
        if fno == 2:
            start = _u64(v)
        elif fno == 3:
            t = _u64(v)
        elif fno == 4:
            val = struct.unpack("<d", v)[0]
        elif fno == 6:
            val = float(struct.unpack("<q", v)[0])
    return {**_POINT_DEFAULTS, "start_time_unix_nano": start,
            "time_unix_nano": t, "value": val}


def _histogram_point(b: bytes) -> dict:
    start = t = 0
    total = hsum = None
    counts: list[int] = []
    bounds: list[float] = []
    for fno, wt, v in _fields(b):
        if fno == 2:
            start = _u64(v)
        elif fno == 3:
            t = _u64(v)
        elif fno == 4:  # count (fixed64)
            total = float(_u64(v))
        elif fno == 5:  # sum (double) — JacksonHistogram.sum
            hsum = struct.unpack("<d", v)[0]
        elif fno == 6:  # bucket_counts: packed fixed64
            counts.extend(
                struct.unpack(f"<{len(v) // 8}Q", bytes(v))
            )
        elif fno == 7:  # explicit_bounds: packed double
            bounds.extend(
                struct.unpack(f"<{len(v) // 8}d", bytes(v))
            )
    return {**_POINT_DEFAULTS, "start_time_unix_nano": start,
            "time_unix_nano": t, "value": total, "sum": hsum,
            "bucket_counts": [int(c) for c in counts],
            "explicit_bounds": list(bounds)}


def _exp_buckets(b: bytes) -> tuple[int, list[int]]:
    """ExponentialHistogramDataPoint.Buckets → (offset, counts).
    offset is sint32 (zigzag varint); counts are packed uint64 VARINTS
    (unlike Histogram's fixed64 bucket_counts)."""
    offset, counts = 0, []
    for fno, wt, v in _fields(b):
        if fno == 1:
            offset = _zz(int(v))
        elif fno == 2:
            counts = _packed_varints(bytes(v)) if wt == 2 else counts + [int(v)]
    return offset, counts


def _exp_histogram_point(b: bytes) -> dict:
    """metrics/v1 ExponentialHistogramDataPoint → row, with the bucket
    boundaries MATERIALIZED the way the reference does
    (OTelMetricsRawProcessor.java:230-238 / JacksonExponentialHistogram
    createExponentialBuckets): base = 2^(2^-scale); positive bucket i at
    offset o spans (base^(o+i), base^(o+i+1)] — explicit_bounds carries
    the n+1 boundaries of the n positive buckets, bucket_counts their
    counts; negative buckets kept raw (offset + counts)."""
    start = t = 0
    total = hsum = None
    scale = 0
    zero_count = 0
    pos = (0, [])
    neg = (0, [])
    for fno, wt, v in _fields(b):
        if fno == 2:
            start = _u64(v)
        elif fno == 3:
            t = _u64(v)
        elif fno == 4:
            total = float(_u64(v))
        elif fno == 5:
            hsum = struct.unpack("<d", v)[0]
        elif fno == 6:  # scale: sint32
            scale = _zz(int(v))
        elif fno == 7:  # zero_count: fixed64
            zero_count = _u64(v)
        elif fno == 8:
            pos = _exp_buckets(v)
        elif fno == 9:
            neg = _exp_buckets(v)
    base = 2.0 ** (2.0 ** -scale)
    bounds = [base ** (pos[0] + i) for i in range(len(pos[1]) + 1)]
    return {**_POINT_DEFAULTS, "start_time_unix_nano": start,
            "time_unix_nano": t, "value": total, "sum": hsum,
            "scale": scale, "zero_count": int(zero_count),
            "positive_offset": pos[0],
            "bucket_counts": [int(c) for c in pos[1]],
            "explicit_bounds": bounds,
            "negative_offset": neg[0],
            "negative_bucket_counts": [int(c) for c in neg[1]]}


def _summary_point(b: bytes) -> dict:
    """metrics/v1 SummaryDataPoint → row (JacksonSummary shape: count,
    sum, quantile→value list; no temporality/monotonic on Summary)."""
    start = t = 0
    total = hsum = None
    quants: list[dict] = []
    for fno, wt, v in _fields(b):
        if fno == 2:
            start = _u64(v)
        elif fno == 3:
            t = _u64(v)
        elif fno == 4:
            total = float(_u64(v))
        elif fno == 5:
            hsum = struct.unpack("<d", v)[0]
        elif fno == 6:  # ValueAtQuantile {quantile=1 double, value=2 double}
            q = val = 0.0
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    q = struct.unpack("<d", v2)[0]
                elif f2 == 2:
                    val = struct.unpack("<d", v2)[0]
            quants.append({"quantile": q, "value": val})
    return {**_POINT_DEFAULTS, "start_time_unix_nano": start,
            "time_unix_nano": t, "value": total, "sum": hsum,
            "quantiles": quants}


def _decode_metric(b: bytes, service_name: str | None) -> list[dict]:
    name = desc = unit = ""
    rows: list[dict] = []
    kind = None
    monotonic = None
    temporality = None
    points: list[dict] = []
    for fno, wt, v in _fields(b):
        if fno == 1:
            name = v.decode("utf-8")
        elif fno == 2:
            desc = v.decode("utf-8")
        elif fno == 3:
            unit = v.decode("utf-8")
        elif fno in (5, 7, 9, 10, 11):  # the five OTLP metric families
            kind = {5: "GAUGE", 7: "SUM", 9: "HISTOGRAM",
                    10: "EXPONENTIAL_HISTOGRAM", 11: "SUMMARY"}[fno]
            point_of = {5: _number_point, 7: _number_point,
                        9: _histogram_point, 10: _exp_histogram_point,
                        11: _summary_point}[fno]
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    points.append(point_of(v2))
                elif f2 == _AGG_TEMPORALITY and fno in (7, 9, 10):
                    temporality = int(v2)
                elif f2 == _IS_MONOTONIC and fno == 7:
                    monotonic = bool(v2)
    # proto3 scalar defaults: an absent field means false/0, not unknown
    if kind == "SUM" and monotonic is None:
        monotonic = False
    if kind in ("SUM", "HISTOGRAM", "EXPONENTIAL_HISTOGRAM") \
            and temporality is None:
        temporality = 0
    for p in points:
        rows.append({
            "name": name, "description": desc, "unit": unit, "kind": kind,
            "service_name": service_name, "is_monotonic": monotonic,
            "aggregation_temporality": temporality, **p,
        })
    return rows


def decode_metrics_request(payload: bytes) -> list[dict]:
    """One ExportMetricsServiceRequest → metric-point row dicts — all
    FIVE OTLP metric families (OTelMetricsRawProcessor.java:230-238
    mapGauge/mapSum/mapHistogram/mapExponentialHistogram/mapSummary):
    gauge, sum, histogram, exponential_histogram (bucket bounds
    materialized from scale/offset the way the reference's
    JacksonExponentialHistogram does), and summary (quantile→value
    list, JacksonSummary shape)."""
    rows: list[dict] = []
    for fno, wt, rm in _fields(payload):          # resource_metrics = 1
        if fno != 1:
            continue
        service = None
        scopes: list[bytes] = []
        for f2, _, v2 in _fields(rm):
            if f2 == 1:
                kvs = [v3 for f3, _, v3 in _fields(v2) if f3 == 1]
                service = _attrs(kvs).get("service.name")
            elif f2 == 2:                          # scope_metrics
                scopes.append(v2)
        for sm in scopes:
            for f3, _, v3 in _fields(sm):
                if f3 == 2:                        # metrics
                    rows.extend(_decode_metric(v3, service))
    return rows


def otel_metrics_decode(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """OTLP metrics requests (binary column) → one row per data point,
    schema :data:`METRIC_SCHEMA` — the otel_metrics processor as a
    distributed mapInPandas."""
    cols = _METRIC_COLS

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for payload in pdf[payload_col]:
                rows.extend(decode_metrics_request(bytes(payload)))
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: [] for c in cols})
            )

    return df.mapInPandas(decode, schema=METRIC_SCHEMA)


# ---------------------------------------------------------- logs decode

LOG_SCHEMA = (
    "time_unix_nano long, observed_time_unix_nano long, "
    "severity_number int, severity_text string, body string, "
    "service_name string, trace_id string, span_id string, "
    "attributes_json string"
)


def _decode_log_record(b: bytes, service_name: str | None) -> dict:
    """logs/v1 LogRecord → row dict (OTelProtoCodec log parsing /
    otel-logs-source's Log event shape).  Non-string bodies are
    JSON-encoded (the reference Jackson-serializes non-string bodies);
    attributes flatten to a sorted-key JSON object string."""
    import json

    t = obs = 0
    sev_no = 0
    sev_txt = ""
    body = None
    tid = sid = b""
    kvs: list[bytes] = []
    for fno, wt, v in _fields(b):
        if fno == 1:
            t = _u64(v)
        elif fno == 2:
            sev_no = int(v)
        elif fno == 3:
            sev_txt = v.decode("utf-8")
        elif fno == 5:
            body = _anyvalue(v)
        elif fno == 6:
            kvs.append(v)
        elif fno == 9:
            tid = v
        elif fno == 10:
            sid = v
        elif fno == 11:
            obs = _u64(v)
    if body is not None and not isinstance(body, str):
        body = json.dumps(body)
    return {
        "time_unix_nano": t,
        "observed_time_unix_nano": obs,
        "severity_number": sev_no,
        "severity_text": sev_txt,
        "body": body,
        "service_name": service_name,
        "trace_id": tid.hex(),
        "span_id": sid.hex(),
        "attributes_json": json.dumps(_attrs(kvs), sort_keys=True),
    }


def decode_logs_request(payload: bytes) -> list[dict]:
    """One ExportLogsServiceRequest → log-record row dicts (the third
    OTLP source, otel-logs-source/.../OTelLogsSource.java:49; wire shape
    resource_logs=1 { resource=1, scope_logs=2 { log_records=2 } })."""
    rows: list[dict] = []
    for fno, wt, rl in _fields(payload):          # resource_logs = 1
        if fno != 1:
            continue
        service = None
        scopes: list[bytes] = []
        for f2, _, v2 in _fields(rl):
            if f2 == 1:
                kvs = [v3 for f3, _, v3 in _fields(v2) if f3 == 1]
                service = _attrs(kvs).get("service.name")
            elif f2 == 2:                          # scope_logs
                scopes.append(v2)
        for sl in scopes:
            for f3, _, v3 in _fields(sl):
                if f3 == 2:                        # log_records
                    rows.append(_decode_log_record(v3, service))
    return rows


def otel_logs_decode(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """OTLP logs requests (binary column) → one row per log record,
    schema :data:`LOG_SCHEMA` — the otel_logs source's decode stage as a
    distributed mapInPandas (completes the OTLP triple with
    otel_trace_decode / otel_metrics_decode)."""
    cols = [
        "time_unix_nano", "observed_time_unix_nano", "severity_number",
        "severity_text", "body", "service_name", "trace_id", "span_id",
        "attributes_json",
    ]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for payload in pdf[payload_col]:
                rows.extend(decode_logs_request(bytes(payload)))
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: [] for c in cols})
            )

    return df.mapInPandas(decode, schema=LOG_SCHEMA)


# ------------------------------------------------- fixture/test ENCODER

def _wr_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        x = v & 0x7F
        v >>= 7
        if v:
            out.append(x | 0x80)
        else:
            out.append(x)
            return bytes(out)


def _fld(fno: int, wt: int, payload: bytes) -> bytes:
    head = _wr_varint((fno << 3) | wt)
    if wt == 2:
        return head + _wr_varint(len(payload)) + payload
    return head + payload


def _kv_str(key: str, val: str) -> bytes:
    av = _fld(1, 2, val.encode())
    return _fld(1, 2, key.encode()) + _fld(2, 2, av)


def encode_span(
    trace_id: bytes, span_id: bytes, parent_span_id: bytes, name: str,
    kind: int, start_ns: int, end_ns: int, status_code: int = 0,
) -> bytes:
    b = _fld(1, 2, trace_id) + _fld(2, 2, span_id)
    if parent_span_id:
        b += _fld(4, 2, parent_span_id)
    b += _fld(5, 2, name.encode())
    b += _fld(6, 0, _wr_varint(kind))
    b += _fld(7, 1, struct.pack("<Q", start_ns))
    b += _fld(8, 1, struct.pack("<Q", end_ns))
    if status_code:
        b += _fld(15, 2, _fld(3, 0, _wr_varint(status_code)))
    return b


def encode_number_point(
    start_ns: int, t_ns: int, value: float | int, as_int: bool = False
) -> bytes:
    b = _fld(2, 1, struct.pack("<Q", start_ns)) + _fld(3, 1, struct.pack("<Q", t_ns))
    if as_int:
        b += _fld(6, 1, struct.pack("<q", int(value)))
    else:
        b += _fld(4, 1, struct.pack("<d", float(value)))
    return b


def encode_hist_point(
    start_ns: int, t_ns: int, count: int,
    bucket_counts: list[int], bounds: list[float],
) -> bytes:
    b = _fld(2, 1, struct.pack("<Q", start_ns)) + _fld(3, 1, struct.pack("<Q", t_ns))
    b += _fld(4, 1, struct.pack("<Q", count))
    b += _fld(6, 2, struct.pack(f"<{len(bucket_counts)}Q", *bucket_counts))
    b += _fld(7, 2, struct.pack(f"<{len(bounds)}d", *bounds))
    return b


def _zz_enc(v: int) -> int:
    """zigzag-encode for sint32/sint64 varints."""
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def encode_exp_hist_point(
    start_ns: int, t_ns: int, count: int, scale: int, zero_count: int,
    pos_offset: int, pos_counts: list[int],
    neg_offset: int = 0, neg_counts: list[int] | None = None,
    sum_val: float | None = None,
) -> bytes:
    b = _fld(2, 1, struct.pack("<Q", start_ns))
    b += _fld(3, 1, struct.pack("<Q", t_ns))
    b += _fld(4, 1, struct.pack("<Q", count))
    if sum_val is not None:
        b += _fld(5, 1, struct.pack("<d", sum_val))
    b += _fld(6, 0, _wr_varint(_zz_enc(scale)))
    b += _fld(7, 1, struct.pack("<Q", zero_count))
    pos = _fld(1, 0, _wr_varint(_zz_enc(pos_offset)))
    pos += _fld(2, 2, b"".join(_wr_varint(c) for c in pos_counts))
    b += _fld(8, 2, pos)
    if neg_counts:
        neg = _fld(1, 0, _wr_varint(_zz_enc(neg_offset)))
        neg += _fld(2, 2, b"".join(_wr_varint(c) for c in neg_counts))
        b += _fld(9, 2, neg)
    return b


def encode_summary_point(
    start_ns: int, t_ns: int, count: int, sum_val: float,
    quantiles: list[tuple[float, float]],
) -> bytes:
    b = _fld(2, 1, struct.pack("<Q", start_ns))
    b += _fld(3, 1, struct.pack("<Q", t_ns))
    b += _fld(4, 1, struct.pack("<Q", count))
    b += _fld(5, 1, struct.pack("<d", sum_val))
    for q, v in quantiles:
        b += _fld(6, 2,
                  _fld(1, 1, struct.pack("<d", q))
                  + _fld(2, 1, struct.pack("<d", v)))
    return b


def encode_metric(
    name: str, unit: str, kind: str, points: list[bytes],
    description: str = "", monotonic: bool = False, temporality: int = 2,
) -> bytes:
    b = _fld(1, 2, name.encode()) + _fld(2, 2, description.encode())
    b += _fld(3, 2, unit.encode())
    inner = b"".join(_fld(1, 2, p) for p in points)
    if kind == "GAUGE":
        b += _fld(5, 2, inner)
    elif kind == "SUM":
        inner += _fld(2, 0, _wr_varint(temporality))
        inner += _fld(3, 0, _wr_varint(1 if monotonic else 0))
        b += _fld(7, 2, inner)
    elif kind == "HISTOGRAM":
        inner += _fld(2, 0, _wr_varint(temporality))
        b += _fld(9, 2, inner)
    elif kind == "EXPONENTIAL_HISTOGRAM":
        inner += _fld(2, 0, _wr_varint(temporality))
        b += _fld(10, 2, inner)
    elif kind == "SUMMARY":
        b += _fld(11, 2, inner)
    else:
        raise ValueError(kind)
    return b


def encode_metrics_request(metrics_by_service: dict[str, list[bytes]]) -> bytes:
    req = b""
    for service in sorted(metrics_by_service):
        resource = _fld(1, 2, _kv_str("service.name", service))
        scope = b"".join(_fld(2, 2, m) for m in metrics_by_service[service])
        rm = _fld(1, 2, resource) + _fld(2, 2, scope)
        req += _fld(1, 2, rm)
    return req


def encode_log_record(
    time_ns: int, severity_number: int, severity_text: str, body,
    trace_id: bytes = b"", span_id: bytes = b"",
    observed_ns: int = 0, attrs: dict[str, str] | None = None,
) -> bytes:
    import struct as _s

    b = _fld(1, 1, _s.pack("<Q", time_ns))
    if severity_number:
        b += _fld(2, 0, _wr_varint(severity_number))
    if severity_text:
        b += _fld(3, 2, severity_text.encode())
    if body is not None:
        if isinstance(body, str):
            av = _fld(1, 2, body.encode())
        elif isinstance(body, bool):
            av = _fld(2, 0, _wr_varint(1 if body else 0))
        elif isinstance(body, int):
            av = _fld(3, 0, _wr_varint(body & ((1 << 64) - 1)))
        else:
            av = _fld(4, 1, _s.pack("<d", float(body)))
        b += _fld(5, 2, av)
    for k in sorted(attrs or {}):
        b += _fld(6, 2, _kv_str(k, attrs[k]))
    if trace_id:
        b += _fld(9, 2, trace_id)
    if span_id:
        b += _fld(10, 2, span_id)
    if observed_ns:
        b += _fld(11, 1, _s.pack("<Q", observed_ns))
    return b


def encode_logs_request(logs_by_service: dict[str, list[bytes]]) -> bytes:
    req = b""
    for service in sorted(logs_by_service):
        resource = _fld(1, 2, _kv_str("service.name", service))
        scope = b"".join(_fld(2, 2, lr) for lr in logs_by_service[service])
        rl = _fld(1, 2, resource) + _fld(2, 2, scope)
        req += _fld(1, 2, rl)
    return req


def encode_trace_request(spans_by_service: dict[str, list[bytes]]) -> bytes:
    """{service_name: [encoded spans]} → ExportTraceServiceRequest bytes
    (one ResourceSpans per service, one ScopeSpans each) — deterministic
    fixture generator for tests and oracle entries."""
    req = b""
    for service in sorted(spans_by_service):
        resource = _fld(1, 2, _kv_str("service.name", service))
        scope = b"".join(
            _fld(2, 2, sp) for sp in spans_by_service[service]
        )
        rs = _fld(1, 2, resource) + _fld(2, 2, scope)
        req += _fld(1, 2, rs)
    return req
