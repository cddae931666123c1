"""Data-layout writers: Hive-style time-partitioned parquet.

At 100 TB the single biggest scan lever is not reading the data at
all: a time-partitioned layout turns every time-range predicate into
partition PRUNING (the files are never opened, never listed into
tasks). This module writes the layout and the test suite pins the
evidence — the scan's ``PartitionFilters`` carries the predicate and
selected-partition count drops.

Partition-column choice follows the usual cardinality rule: one
directory per day (or hour) keeps the partition count in the
thousands for years of data; finer grains belong INSIDE the files as
sorted row groups (parquet min/max pruning), not in the directory
tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FMT = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd-HH", "month": "yyyy-MM"}


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    granularity: str = "day",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` partitioned by the truncated timestamp (Hive-style
    ``p_date=.../`` directories). The partition value is a string so
    the layout round-trips identically everywhere."""
    if granularity not in _FMT:
        raise ValueError(f"granularity must be one of {sorted(_FMT)}")
    part = F.date_format(
        F.date_trunc(granularity, F.col(ts_col)), _FMT[granularity]
    ).alias("p_date")
    (
        df.withColumn("p_date", part)
        .write.mode(mode)
        .partitionBy("p_date")
        .parquet(path)
    )


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the layout back. Filters on ``p_date`` prune partitions at
    planning time (check ``.explain``'s PartitionFilters)."""
    return spark.read.parquet(path)
