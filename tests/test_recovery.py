"""Exactly-once / recovery semantics: the Park-mode contract.

Selium's strong reader is lossless at-least-once within process
lifetime; Spark checkpointing upgrades that to exactly-once per sink —
verified here by killing a query between micro-batches and restarting
from the same checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from selium_spark.catalog import StreamCatalog


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    # two frame-batches (files): the first run consumes only one
    spark.range(0, 10).select(F.col("id")).coalesce(1).write.mode("append").parquet(src)
    spark.range(10, 20).select(F.col("id")).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def start():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", sink)
            .start()
        )

    q = start()
    # stop after the first committed batch (terminate, not drain)
    import time

    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if any(p for p in [q.lastProgress] if p and p["numInputRows"] > 0):
            break
        time.sleep(0.2)
    q.stop()
    first_count = spark.read.parquet(sink).count()
    assert 0 < first_count < 20  # partial consumption

    # restart from the same checkpoint: picks up where it left off
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    rows = [r.id for r in spark.read.parquet(sink).collect()]
    assert sorted(rows) == list(range(20))  # all rows, no duplicates


def test_catalog_save_load_roundtrip(spark, catalog, tmp_path):
    path = str(tmp_path / "catalog.json")
    catalog.save(path)
    loaded = StreamCatalog.load(spark, path)
    assert set(loaded.uris()) == set(catalog.uris())
    for uri in catalog.uris():
        assert loaded.get(uri).hash == catalog.get(uri).hash
        assert loaded.get(uri).mode == catalog.get(uri).mode
    assert loaded.read("sel://testdata/nation").count() > 0
