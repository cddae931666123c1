"""SparkSession factory tuned for the selium_spark engine.

Local testing runs on ``local[N]``; the configs below are chosen so the
same code scales to a 1000-executor cluster against ~100 TB:

- AQE on (runtime coalesce, skew-join splitting) so shuffle partition
  counts self-correct at any scale factor.
- ``spark.sql.shuffle.partitions`` defaults to 2x local cores; on a real
  cluster this is overridden (or left to AQE's initialPartitionNum).
- Arrow enabled for every Python<->JVM exchange (Pandas UDFs are the
  only Python hot path we allow).
- Session timezone pinned to UTC so results are comparable with the
  DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "selium_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Scale notes (100 TB design): every setting here is either
    scale-neutral or an AQE knob that lets Spark re-plan at runtime.
    Nothing below hard-codes data sizes.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # parquet scans: split files ~128MB like a real cluster would
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and normalize in sources.tables
        # (ns -> us truncation, matching DuckDB's timestamp semantics).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.shuffle.spill.compress", "true")
        # Generated-class cache (r12): the default 100 entries thrash
        # under this engine's operator mix — a 127-query sweep emits
        # ~2.6k codegen'd sources, so every repeated execution in a
        # long-lived session re-runs janino + JIT for classes the
        # session already built (measured: 2597 recompiles and 678.5 s
        # for a warm full-headline sweep at the default vs 43 and
        # 395.6 s at 10000 — 1.7x; cold sweeps equal within box noise).
        # Entries are compiled-class references (~10 KB bytecode each),
        # so the ceiling is ~100 MB of metaspace at full fill —
        # scale-neutral driver state, env-tunable for small drivers.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "10000"),
        )
        # PySpark's per-call error-context capture (r13 session 2):
        # with dataFrameDebugging on (the default), EVERY decorated
        # DataFrame/Column API call pays a Python stack walk plus py4j
        # round trips (conf read + PySparkCurrentOrigin.set/clear) —
        # pure driver-side construction overhead on every query build,
        # at any scale. Off, errors lose the user-code call-site
        # decoration; results are unchanged. Env-escape for debugging
        # sessions: SPARK_GRAFT_DF_DEBUGGING=true.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUGGING", "false"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # getOrCreate() silently returns the EXISTING session when one is
    # already live in this JVM, ignoring builder configs that are
    # static (codegen cache, driver memory, master). Read the
    # static-at-startup ones back and warn on mismatch so an A/B
    # script (or a second get_spark with different env) cannot run
    # with a stale value while appearing configured (r12 ADVICE).
    requested = {
        "spark.sql.codegen.cache.maxEntries": os.environ.get(
            "SPARK_GRAFT_CODEGEN_CACHE", "10000"
        ),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        **{
            k: v
            for k, v in (extra_conf or {}).items()
            if k.startswith(("spark.driver.", "spark.sql.codegen.cache."))
        },
    }
    for key, want in requested.items():
        try:
            got = spark.conf.get(key)
        except Exception:
            continue
        if got != want:
            import warnings

            warnings.warn(
                f"get_spark: {key}={got!r} in the live session; the "
                f"requested {want!r} was ignored because a SparkSession "
                "already exists in this process (static conf). Stop the "
                "session (or a fresh process) to apply it.",
                RuntimeWarning,
                stacklevel=2,
            )
    return spark
