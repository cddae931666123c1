"""S7 HTTP ingest adapter + capability catalog tests."""

from __future__ import annotations

import json
import urllib.request

import pytest

from selium_spark.catalog import CapabilityError, StreamCatalog
from selium_spark.sources.http_ingest import HttpIngest


def test_http_ingest_to_stream_table(spark, tmp_path):
    stream_dir = str(tmp_path / "http_requests")
    (tmp_path / "http_requests").mkdir()
    with HttpIngest(stream_dir) as srv:
        for i in range(3):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/api/item/{i}",
                data=json.dumps({"n": i}).encode(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=5) as resp:
                assert resp.status == 202
                assert json.loads(resp.read())["accepted"] == i
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/health", timeout=5
        ) as resp:
            assert resp.status == 202
        assert srv.flush() == 4

    df = spark.read.parquet(stream_dir)
    rows = {r.request_id: r for r in df.collect()}
    assert len(rows) == 4
    assert rows[1].method == "POST" and rows[1].path == "/api/item/1"
    assert json.loads(rows[2].body) == {"n": 2}
    assert rows[3].method == "GET" and rows[3].body == ""
    # the adapter's table is a normal streaming source
    stream = spark.readStream.schema(df.schema).parquet(stream_dir)
    assert stream.isStreaming


def test_capability_catalog(spark, catalog):
    restricted = catalog.restrict(["sel://testdata/events", "sel://testdata/nation"])
    assert restricted.read("sel://testdata/events").count() > 0
    with pytest.raises(CapabilityError):
        restricted.read("sel://testdata/lineitem")
    with pytest.raises(CapabilityError):
        restricted.read_stream("sel://testdata/orders")
    # pattern lookup only surfaces granted entries
    assert {e.uri for e in restricted.lookup("sel://testdata/*")} == {
        "sel://testdata/events",
        "sel://testdata/nation",
    }


def test_capability_catalog_works_with_engine(spark, catalog, tmp_path):
    from selium_spark import Engine

    restricted = catalog.restrict(["sel://testdata/events"])
    eng = Engine(spark, catalog)
    df = restricted.read_stream("sel://testdata/events")
    handle = eng.start(
        "capq", df.select("event_id"), checkpoint=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    handle.query.awaitTermination(120)
    assert spark.table("capq").count() > 0
    if handle.query.isActive:
        handle.stop()
