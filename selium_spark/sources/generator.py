"""S10: the data-pipeline demo generator, bit-reproducible.

Reference: ``generator(ctx)`` emits a pseudo-random i32 every 500 ms
from the LCG ``state = state * 1103515245 + 12345`` (wrapping i32,
seeded -1) — examples/data-pipeline/src/lib.rs:17-33.

Batch twin: the LCG is inherently sequential, i.e. a single-writer
channel — so the generator runs in ONE partition via ``mapInPandas``
(numpy int32 wrap), exactly like one selium writer owning the stream.
Downstream operators repartition freely. Streaming twin: Spark's rate
source stamped through the same recurrence per micro-batch.

Oracle: a DuckDB RECURSIVE CTE computing the same signed-32-bit wrap.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LCG_A = 1103515245
LCG_C = 12345


def lcg_values(n: int, seed: int = -1) -> np.ndarray:
    # pure-Python ints (numpy raises on int32 overflow instead of
    # wrapping); signed-i32 wrap = shift to unsigned, mod 2^32, shift back
    state = seed
    out = np.empty(n, dtype=np.int32)
    for i in range(n):
        state = ((state * LCG_A + LCG_C + 2**31) % 2**32) - 2**31
        out[i] = state
    return out


def lcg_generator(spark: SparkSession, n: int, seed: int = -1) -> DataFrame:
    """Batch generator: (seq BIGINT, value INT), single sequential
    partition (single-writer semantics)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _ in batches:
            vals = lcg_values(n, seed)
            yield pd.DataFrame({"seq": np.arange(n, dtype=np.int64), "value": vals})

    return (
        spark.range(1)
        .coalesce(1)
        .mapInPandas(gen, schema="seq long, value int")
    )


def sql_lcg_oracle(n: int, seed: int = -1) -> str:
    """DuckDB recursive-CTE twin of :func:`lcg_values` (signed i32
    wrap in BIGINT arithmetic)."""
    return f"""
WITH RECURSIVE g(seq, value) AS (
  SELECT CAST(0 AS BIGINT) AS seq,
         CAST((({seed} * {LCG_A} + {LCG_C} + 2147483648) % 4294967296 + 4294967296)
              % 4294967296 - 2147483648 AS BIGINT) AS value
  UNION ALL
  SELECT seq + 1,
         CAST(((value * {LCG_A} + {LCG_C} + 2147483648) % 4294967296 + 4294967296)
              % 4294967296 - 2147483648 AS BIGINT)
  FROM g WHERE seq < {n - 1}
)
SELECT seq, CAST(value AS INT) AS value FROM g
"""
