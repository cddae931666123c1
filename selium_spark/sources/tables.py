"""Canonical loaders for the driver testdata tables.

One normalization: ``events.ts`` is written as parquet TIMESTAMP(NANOS),
which Spark's reader surfaces as a nanosecond long (with
``spark.sql.legacy.parquet.nanosAsLong=true``). We truncate to
microseconds (integer ``div 1000`` — no double round-trip, lossless for
the int64 range) to match DuckDB's microsecond timestamps, so oracle
comparisons agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def ensure_nanos_as_long(spark: SparkSession) -> None:
    """Runtime-settable conf required to scan TIMESTAMP(NANOS) parquet
    (events.ts) on sessions not built by selium_spark.session.get_spark."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    if name == "events":
        ensure_nanos_as_long(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # NOTE: no blanket repartition here. Joins/aggs shuffle on their own
    # keys anyway, so a round-robin exchange ahead of them is a wasted
    # extra shuffle (measured: q2 2x slower). CPU-per-row operators that
    # DO deserve the fan-out call sources.layout.fan_out at their own
    # entry points, where it's gated to be a no-op at real scale.
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (for the SQL surface)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
