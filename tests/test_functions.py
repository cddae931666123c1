from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from selium_spark.functions import (
    clamp_min,
    contains,
    eq_ignore_case,
    hex_decode,
    split_once,
    wasm_pandas_udf,
)
from selium_spark.sources.generator import lcg_values


def test_scalar_surface(spark):
    df = spark.createDataFrame(
        [("/admin/x", "Content-Type: json", "AbC", 0, "4142")],
        "path STRING, header STRING, s STRING, n INT, hx STRING",
    )
    row = df.select(
        contains("path", "/admin").alias("blocked"),
        split_once("header", ": ").alias("kv"),
        eq_ignore_case("s", F.lit("abc")).alias("eq"),
        clamp_min("n", 1).alias("clamped"),
        hex_decode("hx").alias("decoded"),
    ).first()
    assert row.blocked is True
    assert (row.kv.head, row.kv.rest) == ("Content-Type", "json")
    assert row.eq is True
    assert row.clamped == 1
    assert bytes(row.decoded) == b"AB"


def test_lcg_matches_reference_recurrence():
    vals = lcg_values(3, seed=-1)
    # state0 = -1 -> -1*1103515245 + 12345 wrapped
    s = ((-1 * 1103515245 + 12345 + 2**31) % 2**32) - 2**31
    assert vals[0] == s


def test_wasm_udf_rejects_bad_module_and_requires_some_impl():
    with pytest.raises(ValueError):  # truncated binary fails fast on driver
        wasm_pandas_udf(b"\x00asm", "f", "long")
    with pytest.raises(NotImplementedError):  # nothing to execute
        wasm_pandas_udf(None, "f", "long")


def test_wasm_udf_plumbing_with_fallback(spark):
    udf = wasm_pandas_udf(None, "double_it", "long", fallback=lambda x: x * 2)
    df = spark.range(5).select(udf(F.col("id")).alias("out"))
    assert [r.out for r in df.orderBy("out").collect()] == [0, 2, 4, 6, 8]
