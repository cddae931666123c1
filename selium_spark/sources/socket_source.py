"""S7 live mode: a TCP line server driving a Spark socket stream.

The HTTP/QUIC listeners (system/userland/src/net.rs:277-303) surface
each connection as a framed byte stream. `http_ingest.py` renders that
as a file-backed stream table (the at-scale shape); this module is the
*live* demo path: Spark's built-in ``socket`` source consumes a raw
TCP line stream directly — no files, sub-second latency, test/demo
only (the socket source is not fault-tolerant and is documented as
such upstream; production ingress goes through kafka.py or
http_ingest.py).
"""

from __future__ import annotations

import socket
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def socket_lines(spark: SparkSession, host: str, port: int, include_ts: bool = True) -> DataFrame:
    """One frame per line, with an ingest timestamp (≙ FrameMeta ts)."""
    df = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .option("includeTimestamp", "true" if include_ts else "false")
        .load()
    )
    return df.withColumnRenamed("timestamp", "ingest_ts") if include_ts else df


class LineServer:
    """Minimal line-oriented TCP server: accepts one consumer (the
    Spark socket source) and pushes queued lines to it. The test-side
    stand-in for a live log emitter."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(1)
        self.host, self.port = self._srv.getsockname()
        self._conn: socket.socket | None = None
        self._ready = threading.Event()
        self._thread = threading.Thread(target=self._accept, daemon=True)

    def _accept(self) -> None:
        try:
            self._conn, _ = self._srv.accept()
            self._ready.set()
        except OSError:
            pass  # server closed before a consumer attached

    def start(self) -> "LineServer":
        self._thread.start()
        return self

    def wait_consumer(self, timeout_s: float = 30.0) -> bool:
        return self._ready.wait(timeout_s)

    def send_lines(self, lines: list[str]) -> None:
        assert self._conn is not None, "no consumer attached"
        payload = "".join(line + "\n" for line in lines).encode()
        self._conn.sendall(payload)

    def stop(self) -> None:
        for s in (self._conn, self._srv):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass

    def __enter__(self) -> "LineServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
