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


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-token-budget chunks with
    ``overlap`` carried tokens between consecutive chunks (the standard
    long-context training cut: stride = chunk_tokens - overlap).

    Chunk start positions are 0, stride, 2*stride, ... while the start
    still contributes NEW tokens (start < n_tokens - overlap; a doc
    shorter than one chunk yields exactly one chunk). Entirely map-side
    array expressions + one posexplode — no shuffle, no UDF; 100 TB
    chunks as a linear scan.

    Output: one row per chunk with ``chunk_id`` (0-based per doc),
    ``chunk_text``, ``n_chunk_tokens``.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    from .text import tokens

    toks = df.withColumn("_toks", tokens(text_col)).withColumn(
        "_n", F.size(F.col("_toks"))
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("_n") - F.lit(overlap) - 1, F.lit(0)),
        F.lit(stride),
    )
    exploded = toks.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_chunk_tokens"),
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic shuffle-and-shard manifest for training input:
    shard = md5-hash bucket of the id (uniform, content-blind), seq =
    rank of the id's hash WITHIN the shard — together a reproducible
    global permutation without any global sort.

    Scale shape: one hash shuffle on the shard key, then a per-shard
    sort that runs independently in each task (this is the map from
    'shuffle the corpus' to 'thousands of independent shard sorts'
    that makes 100 TB shuffling tractable). Same move as
    messaging.fanout's worker assignment, rendered for batch manifests.
    """
    h = F.md5(F.col(id_col).cast("string"))
    # first 4 hex chars -> 0..65535 bucket (conv = JVM-side hex parse);
    # 64k buckets folds uniformly onto any practical shard count while
    # staying cheap to mirror in a SQL oracle
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
    assigned = df.withColumn("shard_id", (bucket % n_shards).cast("int")).withColumn(
        "_h", h
    )
    w = Window.partitionBy("shard_id").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return assigned.withColumn("seq", F.row_number().over(w) - 1).drop("_h")


def pack_nextfit(
    df: DataFrame,
    capacity: int,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """NO-SPLIT next-fit-decreasing sequence packing — the
    padding-efficiency shape of "packing without cross-document
    contamination" (Krell et al. 2021, arXiv:2107.02027): documents are
    never spliced across sequences (unlike :func:`pack_sequences`'
    concat-and-chunk); each doc joins the open sequence unless it would
    overflow ``capacity``, which opens a new one. Scanning in
    token-count-DESC order (doc_id tiebreak) is the decreasing variant
    that bounds wasted padding. A doc longer than ``capacity`` occupies
    a sequence alone.

    Scale: the (seq_id, fill) scan is inherently sequential, so docs
    are salted into ``n_shards`` md5 buckets (shard_assign's device)
    and each shard packs independently via applyInPandas — one hash
    shuffle on the shard key, thousands of parallel shard scans at
    100 TB, no global order. The per-shard scan is a Python loop over
    the shard's DOC COUNT (a reset-cumsum is not vectorizable), which
    is manifest-sized, not token-sized — the token work (counting)
    stayed JVM-side upstream.

    Output: one row per doc — (id_col, n_tokens, shard_id, seq_id).
    """
    import pandas as pd

    from .text import token_count

    h = F.md5(F.col(id_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
    base = df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        (bucket % n_shards).cast("int").alias("shard_id"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        toks = pdf["n_tokens"].to_list()
        seq_ids = []
        seq = 0
        fill = None
        for t in toks:
            if fill is None:
                fill = t
            elif fill + t <= capacity:
                fill += t
            else:
                seq += 1
                fill = t
            seq_ids.append(seq)
        pdf["seq_id"] = seq_ids
        return pdf[[id_col, "n_tokens", "shard_id", "seq_id"]]

    return base.groupBy("shard_id").applyInPandas(
        pack,
        schema=f"{id_col} long, n_tokens int, shard_id int, seq_id long",
    )
