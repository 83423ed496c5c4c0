"""HTTP push-ingest source — the reference's http-source, stdlib-only.

Data Prepper's HTTP source (http-source/.../HTTPSource.java:43) exposes
``POST /log/ingest`` taking a JSON ARRAY body; LogHTTPService.java:77-86
parses it into one event per array element, returns 400 on a
non-array/corrupt body, and 408 REQUEST_TIMEOUT when the buffer can't
accept the batch.  This module implements those semantics with the
stdlib ``http.server`` (no framework dependency), decoupled from Spark
through a SPOOL DIRECTORY:

  HTTP POST → parse/validate → one NDJSON file per accepted request,
  written to a temp name and atomically renamed into the spool dir.

Atomic rename is the contract Spark's file streaming source needs —
a reader (batch ``read_spool`` or ``spark.readStream.schema(...)
.json(spool_dir)``) only ever sees complete files.  This is the same
producer/consumer split the reference runs (Armeria server thread →
blocking buffer → pipeline worker threads), with the spool dir playing
the buffer: the 408 path maps to a bounded backlog of unconsumed spool
files.

Scale shape: the server is a test/edge fixture (one node); at fleet
scale the same spool contract is S3/Kafka — the Spark side is identical
(file/ndjson codec readers, sources/codecs.py).
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

DEFAULT_PATH = "/log/ingest"


class LogIngestServer:
    """Threaded HTTP ingest endpoint writing accepted batches to a spool
    directory as NDJSON (LogHTTPService semantics: array body → one
    event per element; 400 corrupt/non-array; 408 when the spool
    backlog exceeds ``max_pending`` unconsumed files; 404 other paths).
    """

    def __init__(self, spool_dir: str, host: str = "127.0.0.1",
                 port: int = 0, path: str = DEFAULT_PATH,
                 max_pending: int | None = None):
        self.spool_dir = spool_dir
        self.path = path
        self.max_pending = max_pending
        os.makedirs(spool_dir, exist_ok=True)
        self._seq = 0
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                if self.path != outer.path:
                    self.send_response(404)
                    self.end_headers()
                    return
                if outer.max_pending is not None:
                    backlog = sum(
                        1 for f in os.listdir(outer.spool_dir)
                        if f.endswith(".ndjson")
                    )
                    if backlog >= outer.max_pending:
                        self.send_response(408)  # buffer full → timeout
                        self.end_headers()
                        return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                try:
                    events = json.loads(body)
                    if not isinstance(events, list):
                        raise ValueError("body must be a JSON array")
                except (ValueError, json.JSONDecodeError):
                    self.send_response(400)
                    self.end_headers()
                    return
                outer._spool(events)
                self.send_response(200)
                self.end_headers()

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}{self.path}"

    def _spool(self, events: list) -> None:
        with self._lock:
            self._seq += 1
            seq = self._seq
        name = f"batch-{seq:08d}-{uuid.uuid4().hex[:8]}.ndjson"
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        with open(tmp, "w") as f:
            for ev in events:
                f.write(json.dumps(ev, sort_keys=True))
                f.write("\n")
        os.rename(tmp, os.path.join(self.spool_dir, name))  # atomic commit

    def start(self) -> "LogIngestServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def read_spool(spark, spool_dir: str, schema: str | None = None):
    """Batch-read every spooled batch (one row per ingested event).
    For streaming, point ``spark.readStream.schema(s).json(spool_dir)``
    at the same directory — files are complete-on-rename."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(os.path.join(spool_dir, "*.ndjson"))
