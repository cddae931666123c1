"""The reference's four example pipelines as engine programs.

Each function reproduces one selium example end-to-end on this engine —
catalog-registered stream tables in, Engine-managed streaming queries,
stream tables out — the operational proof that a selium user can run
their pipelines here (SURVEY §7.5).

| reference example | function | operators exercised |
|---|---|---|
| examples/log-analyser | run_log_analyser | union-by-pattern (W6/M2), tumbling window + threshold (W1/W2), Drop-mode alert publish (M1) |
| examples/data-pipeline | run_data_pipeline | LCG generator (S10), map x2/+5 (T1), even filter (T2), chained publish (T7) |
| examples/waf | run_waf | classify (T4), routing fan-out audit/alerts (W4) in one pass |
| examples/orchestrator | run_orchestrator | latest-value config enrich (W3) via applyInPandasWithState |
| examples/load-balancer | run_load_balancer | atlas insert (M6), Fanout exactly-one-consumer (M3), HTTP framing scan (T11), streaming publish (M1) |
| examples/rest-api | run_rest_api | frame reassembly + byte-protocol scan (T11), JSON parse/validate (T10), response build (M4 reply shape) |
| examples/echo | run_echo | Client/Server request-reply round-trip (M4) over atlas-registered channels (M6) |
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import StreamCatalog
from .engine import Engine
from .operators import stateful, transforms, windows


def _mkdirs(base: str, *names: str) -> dict[str, str]:
    out = {}
    for n in names:
        p = os.path.join(base, n)
        os.makedirs(p, exist_ok=True)
        out[n] = p
    return out


def run_log_analyser(
    spark: SparkSession,
    workdir: str,
    sources: dict[str, DataFrame],
    window: str = "1 hour",
    error_threshold: int = 5,
    warn_threshold: int = 6,
) -> DataFrame:
    """examples/log-analyser/src/lib.rs:35-72: subscribe to every
    source matching a pattern, window, count error/warn, publish alerts
    when thresholds trip.

    ``sources``: name -> log DataFrame with (ts TIMESTAMP, level STRING)
    columns; each is registered as sel://logs/<name> and the analyser
    subscribes by pattern — the atlas.lookup merge."""
    dirs = _mkdirs(workdir, *(f"src_{n}" for n in sources), "alerts", "ckpt")
    cat = StreamCatalog(spark)
    for name, df in sources.items():
        df.write.mode("overwrite").parquet(dirs[f"src_{name}"])
        cat.insert(f"sel://logs/{name}", dirs[f"src_{name}"])
    engine = Engine(spark, cat)

    logs = cat.subscribe_pattern("sel://logs/*")
    alerts = windows.window_threshold_alerts(
        logs,
        "ts",
        window,
        conds={
            "errors": F.col("level") == "Error",
            "warnings": F.col("level") == "Warn",
        },
        alert_when=(F.col("errors") > error_threshold)
        | (F.col("warnings") > warn_threshold),
        watermark="0 seconds",
    ).select(
        F.col("window.start").alias("window_start"),
        "errors",
        "warnings",
        F.format_string("%d errors observed in window", F.col("errors")).alias("message"),
    )

    handle = engine.start(
        "log_analyser",
        alerts,
        sink_uri=None,  # memory sink named 'log_analyser'
        checkpoint=os.path.join(dirs["ckpt"], "analyser"),
        output_mode="complete",
        trigger_available_now=True,
    )
    handle.query.awaitTermination(300)
    return spark.table("log_analyser")


def run_data_pipeline(spark: SparkSession, workdir: str, n: int = 1000) -> dict[str, DataFrame]:
    """examples/data-pipeline/src/lib.rs: generator -> double -> add_five
    -> even consumer, each stage published to its own channel."""
    from .sources.generator import lcg_generator

    dirs = _mkdirs(workdir, "gen", "doubled", "plus_five", "even")
    cat = StreamCatalog(spark)

    def wrap32(col: F.Column) -> F.Column:
        return (
            (col.cast("bigint") + F.lit(2**31)) % F.lit(2**32) + F.lit(2**32)
        ) % F.lit(2**32) - F.lit(2**31)

    gen = lcg_generator(spark, n)
    gen.write.mode("overwrite").parquet(dirs["gen"])
    cat.insert("sel://pipe/gen", dirs["gen"])

    src = cat.read("sel://pipe/gen")
    doubled = transforms.map_rows(
        src, value=wrap32(F.col("value").cast("bigint") * F.lit(2)).cast("int")
    )
    doubled.write.mode("overwrite").parquet(dirs["doubled"])
    cat.insert("sel://pipe/doubled", dirs["doubled"])

    plus_five = transforms.map_rows(
        cat.read("sel://pipe/doubled"),
        value=wrap32(F.col("value").cast("bigint") + F.lit(5)).cast("int"),
    )
    plus_five.write.mode("overwrite").parquet(dirs["plus_five"])
    cat.insert("sel://pipe/plus_five", dirs["plus_five"])

    even = transforms.where(cat.read("sel://pipe/gen"), F.col("value") % 2 == 0)
    even.write.mode("overwrite").parquet(dirs["even"])
    cat.insert("sel://pipe/even", dirs["even"])

    return {name: cat.read(f"sel://pipe/{name}") for name in ("gen", "doubled", "plus_five", "even")}


def run_waf(spark: SparkSession, workdir: str, requests: DataFrame) -> dict[str, DataFrame]:
    """examples/waf/src/lib.rs: classify each request (block /admin
    paths), route every verdict to audit and blocked ones to alerts in
    a single foreachBatch pass (result_router, lib.rs:216-233)."""
    dirs = _mkdirs(workdir, "requests", "audit", "alerts", "ckpt")
    requests.write.mode("overwrite").parquet(dirs["requests"])
    cat = StreamCatalog(spark)
    cat.insert("sel://waf/requests", dirs["requests"])
    engine = Engine(spark, cat)

    verdicts_schema = None
    verdicts = transforms.classify(
        cat.read_stream("sel://waf/requests"),
        out_col="decision",
        rules=[(F.col("path").contains("/admin"), "block")],
        default="allow",
        reason_col="reason",
        reasons=["path contains /admin"],
    )
    _ = verdicts_schema
    for name in ("audit", "alerts"):
        # seed empty dirs with the verdict schema for catalog registration
        empty = spark.createDataFrame([], verdicts.schema)
        empty.write.mode("overwrite").parquet(dirs[name])
        cat.insert(f"sel://waf/{name}", dirs[name])

    handle = engine.foreach_batch_routes(
        "waf_router",
        verdicts,
        routes={
            "audit": (None, "sel://waf/audit"),
            "alerts": (lambda df: df.where(F.col("decision") == "block"), "sel://waf/alerts"),
        },
        checkpoint=os.path.join(dirs["ckpt"], "router"),
    )
    handle.query.processAllAvailable()
    handle.stop()
    return {
        "audit": cat.read("sel://waf/audit"),
        "alerts": cat.read("sel://waf/alerts"),
    }


def run_orchestrator(
    spark: SparkSession,
    workdir: str,
    work_items: DataFrame,
    config_updates: DataFrame,
) -> DataFrame:
    """examples/orchestrator/src/lib.rs:244-287: workers process items
    under the most recent config (latest-wins); output carries the
    config version each item was processed under."""
    dirs = _mkdirs(workdir, "tagged")
    tagged = stateful.tag_union(
        work_items.withColumn("k", F.lit(1)),
        config_updates.withColumn("k", F.lit(1)),
        "ts",
        ["k"],
    )
    tagged.write.mode("overwrite").parquet(dirs["tagged"])
    schema = spark.read.parquet(dirs["tagged"]).schema

    from .streaming.replay import replay_to_memory

    def transform(stream: DataFrame) -> DataFrame:
        return stateful.latest_enrich_stream(
            stream,
            key_cols=["k"],
            ts="ts",
            config_cols=["version", "multiplier"],
            work_cols=["id"],
            output_schema="id long, version_asof string, multiplier_asof string",
        )

    return replay_to_memory(spark, dirs["tagged"], schema, transform)


def run_load_balancer(
    spark: SparkSession,
    workdir: str,
    connections: DataFrame,
    n_workers: int = 4,
) -> dict[str, DataFrame]:
    """examples/load-balancer/src/lib.rs:21-61: the HTTP listener
    forwards every accepted connection into a Fanout registered in the
    atlas at sel://example.org/web/prod/api; conn_handler workers each
    receive EXACTLY ONE copy of a connection (for_each_concurrent(50))
    and answer ``ok`` / ``bad request``.

    Engine rendering: ``connections`` rows are the row-framed accepted
    connections (conn_id, raw request text). The stream is fanned out
    to ``n_workers`` deterministic partitions (messaging.fanout — the
    exactly-one-consumer contract, SURVEY §7.4.2; the reference's
    CONCURRENT_REQUESTS bound maps to Spark's task slots per worker),
    validated with the same framing rules as lib.rs:63-104 (header
    terminator present, 3-part request line, content-length satisfied),
    and the per-connection response is published to a reply channel.
    """
    from .operators import messaging, transforms

    dirs = _mkdirs(workdir, "conns", "responses", "ckpt")
    connections.write.mode("overwrite").parquet(dirs["conns"])
    cat = StreamCatalog(spark)
    lb_uri = "sel://example.org/web/prod/api"
    cat.insert(lb_uri, dirs["conns"])

    incoming = cat.read_stream(lb_uri)
    assigned = messaging.fanout(incoming, n_workers)
    scanned = transforms.scan_http_frames(assigned, "raw")
    complete = (
        (F.instr("raw", "\r\n\r\n") > 0)
        & (F.size(F.split(F.substring_index(F.col("raw"), "\r\n", 1), " ")) == 3)
        & (
            F.col("content_length").isNull()
            | (F.length(F.coalesce(F.col("body"), F.lit(""))) >= F.col("content_length"))
        )
    )
    responses = scanned.select(
        "conn_id",
        "worker",
        F.when(complete, F.lit(200)).otherwise(F.lit(400)).alias("status_code"),
        F.when(complete, F.lit("ok")).otherwise(F.lit("bad request")).alias("body"),
    )

    empty = spark.createDataFrame([], responses.schema)
    empty.write.mode("overwrite").parquet(dirs["responses"])
    cat.insert("sel://example.org/web/prod/responses", dirs["responses"])
    q = messaging.publish(
        cat,
        responses,
        "sel://example.org/web/prod/responses",
        checkpoint=os.path.join(dirs["ckpt"], "lb"),
    )
    q.processAllAvailable()
    q.stop()
    return {"responses": cat.read("sel://example.org/web/prod/responses")}


def run_rest_api(spark: SparkSession, workdir: str, frames: DataFrame) -> DataFrame:
    """examples/rest-api/src/lib.rs:52-130: reassemble each
    connection's byte frames, locate the header terminator, honor
    Content-Length, JSON-parse the body's ``password`` field, and build
    the exact response the reference builds (200 {"status":true|false}
    on a parseable request, 400 {"error":"invalid request"} otherwise).

    ``frames``: (conn_id, seq, payload) — the recv() loop's chunks,
    row-framed. Reassembly is one groupBy (collect frames, order by
    seq, concatenate); everything after is JVM string surgery shared
    with transforms.scan_http_frames. Output one response row per
    connection.
    """
    from .operators import transforms

    password_ok = F.col("_pw").isin(
        "It's an illusion, Michael!", "Its an illusion, Michael!"
    )
    raw = frames.groupBy("conn_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "payload"))),
                lambda s: s["payload"],
            ),
            "",
        ).alias("raw")
    )
    scanned = transforms.scan_http_frames(raw, "raw")
    # the reference truncates the body at Content-Length before parsing
    body = F.when(
        F.col("content_length").isNotNull(),
        F.substring(F.col("body"), 1, F.col("content_length").cast("int")),
    ).otherwise(F.col("body"))
    parsed = scanned.select(
        "conn_id",
        "raw",
        F.from_json(body, "password STRING").getField("password").alias("_pw"),
    )
    bad = F.col("_pw").isNull()  # unframed, empty, or unparseable body
    response_body = (
        F.when(bad, F.lit('{"error":"invalid request"}'))
        .when(password_ok, F.lit('{"status":true}'))
        .otherwise(F.lit('{"status":false}'))
    )
    status = F.when(bad, F.lit(400)).otherwise(F.lit(200))
    reason = F.when(bad, F.lit("Bad Request")).otherwise(F.lit("OK"))
    out = parsed.select(
        "conn_id",
        status.alias("status_code"),
        reason.alias("reason"),
        response_body.alias("body"),
    )
    return out.withColumn(
        "response",
        F.concat(
            F.lit("HTTP/1.1 "),
            F.col("status_code").cast("string"),
            F.lit(" "),
            F.col("reason"),
            F.lit("\r\nContent-Type: application/json\r\nContent-Length: "),
            F.length("body").cast("string"),
            F.lit("\r\nConnection: close\r\n\r\n"),
            F.col("body"),
        ),
    )


def run_echo(spark: SparkSession, workdir: str, messages: DataFrame) -> dict[str, DataFrame]:
    """examples/echo/src/lib.rs:29-60: a Client publishes EchoMsg
    requests to the atlas-registered sel://moo/cow endpoint; the Server
    consumes each request and sends the SAME message back through the
    responder; the client reads its reply.

    Engine rendering: requests channel + reply channel in the catalog;
    the server is messaging.request_reply_stream with the identity
    handler (the FlatResult envelope carries the echoed payload); the
    client round-trip is the join of requests to replies on request_id.
    """
    from .operators import messaging

    dirs = _mkdirs(workdir, "requests", "replies", "ckpt")
    messages.write.mode("overwrite").parquet(dirs["requests"])
    cat = StreamCatalog(spark)
    cat.insert("sel://moo/cow", dirs["requests"])
    empty = spark.createDataFrame([], "request_id LONG, payload BINARY, error STRING")
    empty.write.mode("overwrite").parquet(dirs["replies"])
    cat.insert("sel://moo/cow/replies", dirs["replies"])

    q = messaging.request_reply_stream(
        cat,
        cat.read_stream("sel://moo/cow"),
        handler=lambda df: df.select("request_id", F.col("msg").alias("payload")),
        reply_uri="sel://moo/cow/replies",
        checkpoint=os.path.join(dirs["ckpt"], "echo"),
    )
    q.processAllAvailable()
    q.stop()

    replies = cat.read("sel://moo/cow/replies")
    roundtrip = (
        cat.read("sel://moo/cow")
        .join(replies, "request_id")
        .select(
            "request_id",
            "msg",
            F.col("payload").cast("string").alias("echoed"),
            "error",
        )
    )
    return {"replies": replies, "roundtrip": roundtrip}
