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
