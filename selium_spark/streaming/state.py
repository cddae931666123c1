"""State-store provider selection + state metrics (SURVEY §8 TODO 2).

Spark's streaming state (window aggs, dropDuplicates*,
applyInPandasWithState) lives in per-shuffle-partition state stores.
The default HDFS-backed provider keeps every versioned key in executor
heap — fine for test SFs, an OOM at 100 TB key cardinalities. The
RocksDB provider (bundled with Spark >= 3.2) spills state to local SSD
with bounded memory, and changelog checkpointing keeps commit cost
proportional to the delta, not the store size. At scale: RocksDB +
changelog checkpointing is THE configuration for large stateful
queries; the provider is a session conf captured at query START, so we
set/restore it around each run.

State observability mirrors the reference's loss accounting
(ChannelError::ReaderBehind, subsystem/messaging/src/lib.rs:107-109):
selium surfaces how far a reader lags; we surface rows/bytes of live
state, so unbounded-state bugs (a forgotten watermark) are visible
before they are OOMs.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
CHANGELOG_CONF = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}


@contextmanager
def state_store_provider(spark: SparkSession, provider: str):
    """Temporarily select the state-store provider ('hdfs' | 'rocksdb'
    | a fully-qualified provider class). The conf is read when a
    streaming query starts, so the context must span query start."""
    cls = PROVIDERS.get(provider, provider)
    prev = spark.conf.get(PROVIDER_CONF, None)
    prev_cl = spark.conf.get(CHANGELOG_CONF, None)
    spark.conf.set(PROVIDER_CONF, cls)
    if provider == "rocksdb":
        # commit cost ∝ changed keys, not store size — essential once
        # state outgrows a micro-batch's delta
        spark.conf.set(CHANGELOG_CONF, "true")
    try:
        yield
    finally:
        for key, val in ((PROVIDER_CONF, prev), (CHANGELOG_CONF, prev_cl)):
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)


def state_metrics(progress) -> list[dict]:
    """Normalize a StreamingQueryProgress's stateOperators into plain
    dicts: rows in state, memory used, rows removed by watermark.
    Accepts a StreamingQueryProgress object or its json-dict form."""
    if progress is None:
        return []
    if isinstance(progress, dict):
        ops = progress.get("stateOperators", [])
    else:
        ops = [
            {
                "operatorName": so.operatorName,
                "numRowsTotal": so.numRowsTotal,
                "numRowsUpdated": so.numRowsUpdated,
                "numRowsRemoved": so.numRowsRemoved,
                "memoryUsedBytes": so.memoryUsedBytes,
            }
            for so in (progress.stateOperators or [])
        ]
    return [
        {
            "operator": so.get("operatorName"),
            "rows_total": so.get("numRowsTotal"),
            "rows_updated": so.get("numRowsUpdated"),
            "rows_removed": so.get("numRowsRemoved"),
            "memory_used_bytes": so.get("memoryUsedBytes"),
        }
        for so in ops
        if so is not None
    ]
