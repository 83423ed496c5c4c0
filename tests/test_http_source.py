"""HTTP push-ingest source (sources/http_source.py) — the reference's
http-source semantics (HTTPSource.java:43, LogHTTPService.java:77-86):
POST /log/ingest JSON array → one event per element; 400 on corrupt or
non-array bodies; 408 when the buffer (spool backlog) is full; spooled
files are complete-on-rename so Spark's file source never reads a
partial batch."""

import json
import os
import urllib.error
import urllib.request

import pytest

from data_prepper_spark.sources.http_source import LogIngestServer, read_spool


def _post(url: str, body: bytes) -> int:
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        return e.code


@pytest.fixture()
def server(workdir, request):
    # workdir is session-scoped — give each test its own spool dir
    spool = os.path.join(workdir, f"http_spool_{request.node.name}")
    srv = LogIngestServer(spool).start()
    yield srv, spool
    srv.stop()


def test_ingest_array_one_event_per_element(spark, server):
    srv, spool = server
    batch1 = [{"log": "line-1", "n": 1}, {"log": "line-2", "n": 2}]
    batch2 = [{"log": "line-3", "n": 3}]
    assert _post(srv.url, json.dumps(batch1).encode()) == 200
    assert _post(srv.url, json.dumps(batch2).encode()) == 200
    files = [f for f in os.listdir(spool) if f.endswith(".ndjson")]
    assert len(files) == 2  # one spool file per accepted request
    df = read_spool(spark, spool, schema="log string, n long")
    rows = sorted(df.collect(), key=lambda r: r["n"])
    assert [r["log"] for r in rows] == ["line-1", "line-2", "line-3"]


def test_corrupt_and_non_array_bodies_rejected_400(server):
    srv, spool = server
    assert _post(srv.url, b"{not json") == 400
    assert _post(srv.url, json.dumps({"log": "x"}).encode()) == 400
    assert _post(srv.url, b"") == 400
    assert not [f for f in os.listdir(spool) if f.endswith(".ndjson")]


def test_wrong_path_404(server):
    srv, _ = server
    assert _post(srv.url.replace("/log/ingest", "/nope"), b"[]") == 404


def test_backlog_full_408(workdir):
    spool = os.path.join(workdir, "http_spool_408")
    srv = LogIngestServer(spool, max_pending=2).start()
    try:
        assert _post(srv.url, b"[{\"a\": 1}]") == 200
        assert _post(srv.url, b"[{\"a\": 2}]") == 200
        assert _post(srv.url, b"[{\"a\": 3}]") == 408  # buffer full
        # consuming the spool (reader deletes/moves) reopens ingest
        for f in os.listdir(spool):
            if f.endswith(".ndjson"):
                os.remove(os.path.join(spool, f))
        assert _post(srv.url, b"[{\"a\": 4}]") == 200
    finally:
        srv.stop()


def test_streaming_reads_spool(spark, server):
    """The spool dir IS a Spark streaming source (complete-on-rename):
    availableNow drain sees exactly the posted events."""
    import tempfile

    srv, spool = server
    for i in range(3):
        assert _post(
            srv.url, json.dumps([{"log": f"s-{i}", "n": i}]).encode()
        ) == 200
    out = tempfile.mkdtemp(prefix="http_sink_")
    q = (
        spark.readStream.schema("log string, n long").json(spool)
        .writeStream.format("parquet")
        .option("path", os.path.join(out, "data"))
        .option("checkpointLocation", os.path.join(out, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(os.path.join(out, "data")).collect()
    assert sorted(r["n"] for r in rows) == [0, 1, 2]
