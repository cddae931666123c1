"""S7: HTTP listener as a stream source (ingress adapter).

Reference: ``HttpListener::bind(domain, port)`` exposes each connection
as a framed byte stream (system/userland/src/net.rs:277-303; host
driver subsystem/net-hyper/src/driver.rs). SURVEY §2.1 maps this to an
*out-of-engine ingress adapter*: something terminates HTTP and appends
request rows to a stream table; the engine then consumes the table like
any channel.

This adapter is that something, minimally: a threaded stdlib HTTP
server that frames each request as one row (HTTP_REQUEST schema +
body) and appends batches of rows as parquet files into the stream
directory — each flush is one "frame batch", immediately visible to
``readStream`` consumers. Arrow writes the files; Spark is not involved
on the ingest path (at scale this role is played by Kafka/Kinesis +
a connector; the engine-side contract — a growing file/offset stream
with a fixed schema — is identical).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pyarrow.parquet as pq

ARROW_SCHEMA = pa.schema(
    [
        ("request_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("method", pa.string()),
        ("path", pa.string()),
        ("client_ip", pa.string()),
        ("body", pa.string()),
    ]
)


class HttpIngest:
    """Bind -> accumulate request rows -> flush parquet frame-batches."""

    def __init__(self, stream_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.stream_dir = stream_dir
        self._rows: list[dict] = []
        self._lock = threading.Lock()
        self._seq = 0
        self._flushes = 0
        adapter = self

        class Handler(BaseHTTPRequestHandler):
            def _ingest(self, method: str) -> None:
                length = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(length).decode("utf-8", "replace") if length else ""
                with adapter._lock:
                    rid = adapter._seq
                    adapter._seq += 1
                    adapter._rows.append(
                        {
                            "request_id": rid,
                            "ts": int(time.time() * 1_000_000),
                            "method": method,
                            "path": self.path,
                            "client_ip": self.client_address[0],
                            "body": body,
                        }
                    )
                payload = json.dumps({"accepted": rid}).encode()
                self.send_response(202)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):  # noqa: N802
                self._ingest("GET")

            def do_POST(self):  # noqa: N802
                self._ingest("POST")

            def log_message(self, *args):  # silence
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_port
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "HttpIngest":
        self._thread.start()
        return self

    def flush(self) -> int:
        """Write accumulated rows as one parquet file (one frame batch);
        returns rows flushed."""
        with self._lock:
            rows, self._rows = self._rows, []
        if not rows:
            return 0
        table = pa.Table.from_pylist(
            [
                {**r, "ts": r["ts"]}
                for r in rows
            ],
            schema=ARROW_SCHEMA,
        )
        out = f"{self.stream_dir}/batch_{self._flushes:06d}_{int(time.time()*1000)}.parquet"
        pq.write_table(table, out)
        self._flushes += 1
        return len(rows)

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "HttpIngest":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.flush()
        self.stop()
