"""Filesystem probes via the JVM Hadoop FileSystem API.

``os.path`` probes silently see nothing when a path is an object-store
or HDFS URI (ADVICE r2) — everything here resolves the FileSystem for
the path's scheme, so local paths, ``hdfs://`` and ``s3a://`` behave
identically. Driver-side only; never called per-row.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path``."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _hadoop_fs(spark, path)
    return bool(fs.exists(p))


def fs_mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _hadoop_fs(spark, path)
    fs.mkdirs(p)


def fs_touch(spark: SparkSession, path: str) -> None:
    fs, p = _hadoop_fs(spark, path)
    fs.create(p, True).close()


def fs_bytes(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Total bytes of files under ``path`` whose name ends in
    ``suffix`` (recursive). One listing RPC stream, no data read."""
    fs, p = _hadoop_fs(spark, path)
    if not fs.exists(p):
        return 0
    it = fs.listFiles(p, True)
    total = 0
    while it.hasNext():
        status = it.next()
        if status.getPath().getName().endswith(suffix):
            total += int(status.getLen())
    return total
