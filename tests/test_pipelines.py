"""End-to-end engine programs == the reference's four examples
(SURVEY §7.5: 'the log-analyser, data-pipeline, waf, and orchestrator
example pipelines are reproduced as engine programs')."""

from __future__ import annotations

from pyspark.sql import functions as F

from selium_spark import pipelines
from selium_spark.sources.generator import lcg_values


def test_log_analyser_pipeline(spark, tmp_path):
    # two producers (atlas pattern match), bursts that cross thresholds
    rows_a = [("2024-01-01 00:%02d:00" % i, "Error") for i in range(10)]  # 10 errors hr 0
    rows_b = [("2024-01-01 01:%02d:00" % i, "Warn") for i in range(3)]  # quiet hr 1
    mk = lambda rows: spark.createDataFrame(rows, "ts STRING, level STRING").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = pipelines.run_log_analyser(
        spark, str(tmp_path), {"svc_a": mk(rows_a), "svc_b": mk(rows_b)}
    )
    alerts = out.collect()
    assert len(alerts) == 1
    assert alerts[0].errors == 10
    assert alerts[0].message == "10 errors observed in window"


def test_data_pipeline_stages(spark, tmp_path):
    outs = pipelines.run_data_pipeline(spark, str(tmp_path), n=100)
    gen = {r.seq: r.value for r in outs["gen"].collect()}
    doubled = {r.seq: r.value for r in outs["doubled"].collect()}
    ref = lcg_values(100)
    assert gen[0] == ref[0] and gen[99] == ref[99]
    assert doubled[3] == ((gen[3] * 2 + 2**31) % 2**32) - 2**31
    assert all(r.value % 2 == 0 for r in outs["even"].collect())


def test_waf_pipeline_routes(spark, tmp_path):
    reqs = spark.createDataFrame(
        [(1, "/admin/panel"), (2, "/home"), (3, "/admin/api"), (4, "/about")],
        "request_id LONG, path STRING",
    )
    outs = pipelines.run_waf(spark, str(tmp_path), reqs)
    assert outs["audit"].count() == 4  # every verdict audited
    blocked = sorted(r.request_id for r in outs["alerts"].collect())
    assert blocked == [1, 3]


def test_orchestrator_pipeline(spark, tmp_path):
    work = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10"), (2, "2024-01-01 00:00:30")], "id LONG, ts STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    config = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05", 3), (2, "2024-01-01 00:00:20", 7)],
        "version INT, ts STRING, multiplier INT",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = pipelines.run_orchestrator(spark, str(tmp_path), work, config)
    got = {r.id: (r.version_asof, r.multiplier_asof) for r in out.collect()}
    assert got == {1: ("1", "3"), 2: ("2", "7")}


def test_load_balancer_pipeline(spark, tmp_path):
    """Fanout + concurrent-consume: every connection handled exactly
    once by exactly one worker; complete requests get ok, broken ones
    bad request (examples/load-balancer/src/lib.rs:21-61)."""
    ok = "GET / HTTP/1.1\r\nHost: x\r\nContent-Length: 2\r\n\r\nhi"
    no_terminator = "GET / HTTP/1.1\r\nHost: x"
    short_body = "POST / HTTP/1.1\r\nContent-Length: 10\r\n\r\nabc"
    conns = spark.createDataFrame(
        [(i, ok) for i in range(8)] + [(100, no_terminator), (101, short_body)],
        "conn_id LONG, raw STRING",
    )
    out = pipelines.run_load_balancer(spark, str(tmp_path), conns, n_workers=3)
    rows = out["responses"].collect()
    # exactly one response per connection (exactly-one-consumer)
    assert sorted(r.conn_id for r in rows) == sorted(list(range(8)) + [100, 101])
    by_conn = {r.conn_id: r for r in rows}
    assert all(by_conn[i].status_code == 200 and by_conn[i].body == "ok" for i in range(8))
    assert by_conn[100].status_code == 400 and by_conn[100].body == "bad request"
    assert by_conn[101].status_code == 400
    # the fanout used every worker slot deterministically
    assert {r.worker for r in rows} <= {0, 1, 2}
    assert len({r.worker for r in rows}) > 1


def test_rest_api_pipeline(spark, tmp_path):
    """Framing + parse/validate + reply build
    (examples/rest-api/src/lib.rs:52-130): chunked frames reassemble in
    seq order; password match -> status true, mismatch -> false,
    unparseable -> 400 with the reference's error body."""
    good = '{"password": "It\'s an illusion, Michael!"}'
    alt = '{"password": "Its an illusion, Michael!"}'
    wrong = '{"password": "wrong"}'
    mk = lambda body: f"POST /auth HTTP/1.1\r\nContent-Length: {len(body)}\r\n\r\n{body}"
    frames = []
    # conn 1: good password split across 3 frames
    r1 = mk(good)
    frames += [(1, 0, r1[:10]), (1, 1, r1[10:25]), (1, 2, r1[25:])]
    # conn 2: alt password, single frame; conn 3: wrong password
    frames += [(2, 0, mk(alt)), (3, 0, mk(wrong))]
    # conn 4: not JSON; conn 5: no header terminator at all
    frames += [(4, 0, mk("not json")), (5, 0, "POST /auth HTTP/1.1\r\nAccept: x")]
    df = spark.createDataFrame(frames, "conn_id LONG, seq INT, payload STRING")
    out = {r.conn_id: r for r in pipelines.run_rest_api(spark, str(tmp_path), df).collect()}
    assert out[1].status_code == 200 and out[1].body == '{"status":true}'
    assert out[2].status_code == 200 and out[2].body == '{"status":true}'
    assert out[3].status_code == 200 and out[3].body == '{"status":false}'
    assert out[4].status_code == 400 and out[4].body == '{"error":"invalid request"}'
    assert out[5].status_code == 400
    # the response is byte-built like build_response (lib.rs:32-51)
    assert out[1].response == (
        'HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n'
        'Content-Length: 15\r\nConnection: close\r\n\r\n{"status":true}'
    )


def test_echo_pipeline(spark, tmp_path):
    """Client/Server round-trip (examples/echo/src/lib.rs:29-60): every
    request comes back with its own message and no error."""
    msgs = spark.createDataFrame(
        [(1, "Hello, world!"), (2, "moo"), (3, "cow")], "request_id LONG, msg STRING"
    )
    out = pipelines.run_echo(spark, str(tmp_path), msgs)
    rt = {r.request_id: r for r in out["roundtrip"].collect()}
    assert set(rt) == {1, 2, 3}
    assert all(r.echoed == r.msg and r.error is None for r in rt.values())
