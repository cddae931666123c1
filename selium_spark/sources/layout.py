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


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions ahead of CPU-heavy per-row work.

    A small/compacted parquet input (one file, one row group) scans as
    ONE task, so a downstream operator that burns CPU per row (minhash,
    simhash, fingerprinting, embedding math) runs on one core no matter
    how wide the cluster is. A row-count-proportional operator is worth
    one cheap round-robin shuffle of its input to unlock N-way
    parallelism.

    Gated: when the scan already has >= target partitions (any real
    100 TB input does — thousands of row-group splits), this is a
    no-op and adds NO shuffle. Streaming inputs are returned untouched
    (micro-batch partitioning is the trigger's business).
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


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


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (hash-clustered) table: rows are pre-shuffled
    into ``n_buckets`` files by ``keys`` at WRITE time, so every later
    join/agg on those keys skips its Exchange — the shuffle is paid
    once, not per query. This is the 100 TB trick for any table that is
    joined repeatedly on the same key (a dedup content-hash index, a
    dimension keyed by id): the scan itself reports the hash
    partitioning and Catalyst drops the shuffle on that side.

    Bucketing requires the session catalog (saveAsTable) — parquet
    directories can't carry the bucket metadata.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata rides the catalog)."""
    return spark.table(table)


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    sort_keys: list[str],
    target_file_mb: int = 128,
) -> int:
    """Compact a directory of small parquet files into range-sorted
    ~target-size files. Small-file sprawl is the classic streaming-sink
    disease (one file per micro-batch per partition): it bloats the
    NameNode/listing, defeats row-group pruning, and caps scan
    parallelism at file granularity. Compaction = one repartitionByRange
    on the sort keys + sortWithinPartitions, so every output file covers
    a tight key range and min/max stats prune whole FILES for key
    predicates.

    Returns the number of output files. File count = ceil(input_bytes /
    target); range partitioning keeps them near-equal by ROWS (byte
    equality is close enough when rows are similar width). The size
    probe goes through the Hadoop FileSystem API, so ``src_path`` may
    be a local path or any supported URI (HDFS, s3a) alike.
    """
    import math

    from ..fsutil import fs_bytes

    total = fs_bytes(spark, src_path)
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    (
        df.repartitionByRange(n_files, *[F.col(k) for k in sort_keys])
        .sortWithinPartitions(*sort_keys)
        .write.mode("overwrite")
        .parquet(dst_path)
    )
    return n_files


def zorder_key(
    col_x,
    col_y,
    min_x,
    max_x,
    min_y,
    max_y,
    bits: int = 8,
):
    """Z-order (Morton) interleave of two numeric columns as a single
    sortable key — the multi-dimensional clustering device behind
    Delta/Iceberg OPTIMIZE ZORDER: sorting by the interleaved key
    keeps rows close in BOTH dimensions close in the file order, so
    parquet min/max stats prune files for predicates on EITHER column
    (a single-column sort only prunes its own column).

    Each value is first mapped to a ``bits``-bit cell index with exact
    integer arithmetic — ``(v - min) * 2^bits div (max - min + 1)`` —
    then the two cell indices interleave bit-by-bit (x even bits, y
    odd). All JVM expressions (a Python loop BUILDS the expression
    tree; nothing per-row runs in Python), fully deterministic, and
    cheap: 2·bits shift/mask terms inside whole-stage codegen.

    Bounds are passed in, not computed — at 100 TB the min/max come
    from table stats or a cheap column-pruned agg the caller already
    has; keeping them out makes the function a pure column expression
    usable in ``repartitionByRange(zkey)`` writers.
    """
    cx = F.expr(
        f"CAST(({col_x} - {min_x}) * {1 << bits} AS BIGINT) "
        f"div CAST({max_x} - {min_x} + 1 AS BIGINT)"
    )
    cy = F.expr(
        f"CAST(({col_y} - {min_y}) * {1 << bits} AS BIGINT) "
        f"div CAST({max_y} - {min_y} + 1 AS BIGINT)"
    )
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(
                F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z


def zorder_sql(
    col_x: str,
    col_y: str,
    min_x: int,
    max_x: int,
    min_y: int,
    max_y: int,
    bits: int = 8,
) -> str:
    """The identical Morton key as an ANSI-SQL string (for oracles and
    engines without the expression API). Same arithmetic, same bit
    layout as :func:`zorder_key`."""
    cx = (
        f"(CAST(({col_x} - {min_x}) * {1 << bits} AS BIGINT) "
        f"// CAST({max_x} - {min_x} + 1 AS BIGINT))"
    )
    cy = (
        f"(CAST(({col_y} - {min_y}) * {1 << bits} AS BIGINT) "
        f"// CAST({max_y} - {min_y} + 1 AS BIGINT))"
    )
    terms = []
    for i in range(bits):
        terms.append(f"((({cx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({cy} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
