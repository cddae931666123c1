"""Sequence packing for training-batch construction (north star).

Concat-and-chunk packing, the standard GPT-style pretraining shape:
documents are laid end-to-end in a deterministic order and cut into
fixed token-budget bins; `bin_id = floor(exclusive_cumsum / budget)`.
A document whose tokens straddle a boundary belongs to the bin where
it STARTS (real pipelines splice the straddling tokens; bin membership
of the document is what the batch manifest records).

Scale story: the cumulative sum is windowed PER PARTITION KEY (source,
shard, date...) — each key's prefix-sum runs independently in one
task, so 100 TB packs as thousands of parallel per-shard scans with a
single hash shuffle on the key, never a global total order. A global
`Window.orderBy` (no partition) would serialize the corpus through one
task and is deliberately not offered.

Reference analogue: selium's bounded consume / counting-until-N
(examples/orchestrator/src/lib.rs:153-176) — budgeted grouping of a
stream — generalized to token budgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str,
    partition_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each row a `bin_id` within its partition key: documents
    are packed in `order_col` order until the token budget is crossed.
    Adds `bin_id` (0-based) and `cum_tokens` (inclusive prefix sum)."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return df.withColumn("cum_tokens", cum).withColumn(
        "bin_id", F.floor((F.col("cum_tokens") - F.col(token_col)) / F.lit(budget))
    )


def pack_summary(
    packed: DataFrame,
    budget: int,
    token_col: str,
    partition_col: str = "source",
) -> DataFrame:
    """Per-bin manifest: document count, token total, and fill ratio
    against the budget (>1.0 means the last doc straddles the
    boundary — expected for concat-and-chunk)."""
    return packed.groupBy(partition_col, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("total_tokens"),
        F.round(F.sum(token_col) / F.lit(float(budget)), 9).alias("fill_ratio"),
    )
