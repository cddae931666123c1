"""Approximate-analytics sketches for 100 TB-scale cardinality and
join pruning (north-star extension; complements dedup.py/similarity.py).

At 100 TB, exact ``COUNT(DISTINCT)`` shuffles every distinct key and a
fact-dim join shuffles the whole fact table. These operators trade a
bounded, tunable error for plans whose shuffled bytes are *constant* in
the input size:

- **KMV (k-minimum-values) distinct estimator**: keep the k smallest
  md5 hashes of the key. Distributed as a per-partition top-k merge
  (``ORDER BY h LIMIT k`` = Spark TakeOrderedAndProject — no full
  shuffle, k rows cross the wire per partition). Estimate
  ``(k-1) / U_k`` where ``U_k`` is the k-th smallest hash scaled to
  (0,1]; relative error ~ 1/sqrt(k).
- **Deterministic HyperLogLog (m=64 registers)**: bucket = first hex
  byte of md5 mod m, rank = leading-zero count of the next 52 bits + 1
  (computed as ``53 - length(bin(v))`` — identical in Spark and DuckDB).
  Registers merge with ``max`` (associative, order-free); the register
  *sum* is kept in integer space (``sum(2^(52 - M_j))`` as BIGINT, each
  term exact) so the final estimate is one double division — bit-exact
  across engines, immune to float-summation order.
- **Bloom-filter semi-join pruning**: j=2 md5-derived bit positions per
  dim key; the probe side keeps rows whose positions are all present.
  On Spark this is two *broadcast* left-semi joins on the tiny position
  set — the 100 TB fact table is pruned map-side, before any shuffle,
  which is exactly what Spark's own runtime bloom-filter join
  (spark.sql.optimizer.runtime.bloomFilter) does; this operator makes
  the construction explicit, deterministic, and oracle-checkable.

Everything hashes with md5 (the one hash both engines share) and all
float arithmetic is a single division of exactly-represented integers,
so the DuckDB oracles reproduce every stage bit-for-bit.

Reference parity: the reference engine exposes count-distinct only as
exact hash aggregation (selium/src/...); sketches are the scale path the
driver mandate adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 13 hex chars = 52 bits: fits a double's mantissa AND a BIGINT in both
# engines, so every hash-derived integer is exactly representable
# everywhere it travels.
_HEX_BITS = 52
_HEX_CHARS = 13


def hash52(col: Column, offset: int = 1) -> Column:
    """md5-derived 52-bit integer, identical in Spark and DuckDB
    (``CAST('0x' || substr(md5(x), offset, 13) AS BIGINT)``)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), offset, _HEX_CHARS), 16, 10
    ).cast("long")


# -- KMV -----------------------------------------------------------------
def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame: KMV estimate of ``count(distinct col)``
    alongside the exact count (for error reporting).

    Scale plan: the ``LIMIT k`` over sorted hashes is TakeOrdered —
    each partition ships at most k 8-byte hashes; no shuffle of the
    distinct-key set. If fewer than k distinct hashes exist the
    estimator IS the exact count (small-range branch).
    """
    hashes = (
        df.select(hash52(F.col(col)).alias("hv"))
        .where(F.col("hv").isNotNull())
        .distinct()
    )
    top = (
        hashes.orderBy("hv")
        .limit(k)
        .agg(F.max("hv").alias("kth"), F.count(F.lit(1)).alias("n_top"))
    )
    truth = df.agg(F.count_distinct(F.col(col)).alias("true_distinct"))
    scale = float((k - 1) * (1 << _HEX_BITS))
    return (
        top.crossJoin(truth)
        .select(
            F.lit(k).alias("k"),
            F.col("kth").alias("kth_hash"),
            F.when(F.col("n_top") < k, F.col("n_top").cast("double"))
            .otherwise(F.lit(scale) / F.col("kth").cast("double"))
            .alias("est_distinct"),
            F.col("true_distinct"),
        )
    )


# -- HyperLogLog ---------------------------------------------------------
HLL_M = 64
# alpha_64 = 0.7213 / (1 + 1.079/64) — written as the standard rounded
# constant so both engines parse the identical double literal.
HLL_ALPHA = 0.709


def hll_register_updates(df: DataFrame, col: str) -> DataFrame:
    """Observed HLL registers for ``col``: (b, mj), only buckets that
    saw a value. This is the *incremental* stage: pure groupBy/max, so
    it runs unchanged inside Structured Streaming (complete/update
    mode) — the register state is 64 longs regardless of input size."""
    h = F.md5(F.col(col).cast("string"))
    bucket = (F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % HLL_M).alias("b")
    v = F.conv(F.substring(h, 3, _HEX_CHARS), 16, 10).cast("long")
    # rank = leading zeros of the 52-bit value + 1; bin() drops leading
    # zeros in both engines so rank = 53 - length(bin(v)). v = 0 maps to
    # 52 (prob 2^-52; deterministic either way).
    rank = (F.lit(_HEX_BITS + 1) - F.length(F.bin(v))).alias("r")
    return df.select(bucket, rank).groupBy("b").agg(F.max("r").alias("mj"))


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """All 64 HLL registers for ``col``: (b, mj). Missing buckets are
    materialized as 0 so register math is total. Merge-able across
    partitions/frames with ``max`` (the whole point of HLL)."""
    observed = hll_register_updates(df, col)
    buckets = df.sparkSession.range(HLL_M).select(F.col("id").alias("b"))
    return (
        buckets.join(observed, "b", "left")
        .select("b", F.coalesce("mj", F.lit(0)).alias("mj"))
    )


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """One-row DataFrame: deterministic-HLL estimate vs exact distinct.

    The register sum stays integer (``sum(2^(52-mj))`` — exact BIGINT,
    order-independent); the estimate is alpha * m^2 * 2^52 / S, one
    double division of exactly-shared operands. No small-range linear
    counting branch: it needs ln(), whose last ulp differs across libm
    builds — out of scope for a bit-exact oracle (documented trade)."""
    regs = hll_registers(df, col)
    s = regs.agg(
        F.sum(F.expr(f"shiftleft(1L, {_HEX_BITS} - mj)")).alias("s_int"),
        F.sum(F.when(F.col("mj") == 0, 1).otherwise(0)).alias("empty_regs"),
    )
    truth = df.agg(F.count_distinct(F.col(col)).alias("true_distinct"))
    return s.crossJoin(truth).select(
        F.lit(HLL_M).alias("m"),
        F.col("s_int"),
        F.col("empty_regs"),
        (
            F.lit(HLL_ALPHA)
            * F.lit(float(HLL_M * HLL_M))
            * F.lit(float(1 << _HEX_BITS))
            / F.col("s_int").cast("double")
        ).alias("est_distinct"),
        F.col("true_distinct"),
    )


# -- Count-min sketch ----------------------------------------------------
CMS_D = 4  # independent hash rows, salted md5("d:" || value)


def _cms_pos(col: Column, d: int, w: int) -> Column:
    """Row-d counter address: salted md5 keeps the d hash functions
    independent (same salt scheme in the DuckDB oracle)."""
    return hash52(F.concat(F.lit(f"{d}:"), col.cast("string"))) % w


def cms_table(df: DataFrame, col: str, w: int = 256, by: tuple[str, ...] = ()) -> DataFrame:
    """Count-min sketch table: (*by, row, pos, cnt) — d=4 rows of w
    counters per ``by`` group (d·w longs each, additively mergeable,
    streaming-able; ``by`` is typically a time window for windowed
    sketches). One wide groupBy on a constant key space per group;
    map-side combine collapses every partition to <= d·w rows before
    the shuffle, so the shuffled bytes are constant in the input size."""
    rows = [
        df.select(
            *[F.col(b) for b in by],
            F.lit(d).alias("row"),
            _cms_pos(F.col(col), d, w).alias("pos"),
        )
        for d in range(CMS_D)
    ]
    unioned = rows[0]
    for r in rows[1:]:
        unioned = unioned.unionAll(r)
    return unioned.groupBy(*by, "row", "pos").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    table: DataFrame,
    keys: DataFrame,
    col: str,
    w: int = 256,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """Point-lookup the sketch for each key in ``keys``: est = min over
    the d rows of the addressed counter (classic count-min upper
    bound: est >= true, overshoot only from collisions). With ``by``,
    keys probe their own group's counters (e.g. per-window). The
    sketch table is tiny — every join here is broadcast."""
    out = keys
    for d in range(CMS_D):
        t = table.where(F.col("row") == d).select(
            *[F.col(b) for b in by],
            F.col("pos").alias(f"_p{d}"),
            F.col("cnt").alias(f"_c{d}"),
        )
        out = out.withColumn(f"_p{d}", _cms_pos(F.col(col), d, w)).join(
            F.broadcast(t), [*by, f"_p{d}"], "left"
        )
    est = F.least(*[F.col(f"_c{d}") for d in range(CMS_D)])
    return out.select(*by, col, est.alias("est_count"))
def histogram_quantiles(
    df: DataFrame,
    col: str,
    width: float,
    n_bins: int,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    lo: float = 0.0,
) -> DataFrame:
    """Quantile estimates from a fixed-bin histogram: (q, est_quantile,
    exact_quantile) per requested quantile.

    The sketch is ``n_bins`` counters — one groupBy on a constant-size
    key space (map-side combine collapses each partition to <= n_bins
    rows before the shuffle), mergeable by addition, and streaming-able.
    The estimate places the ceil(q*N)-th value in its bin by uniform
    interpolation. Pick ``width`` a power of two: the bin division is
    then exact in IEEE doubles, so bin assignment (and the oracle) is
    deterministic. The exact percentile rides along for error
    reporting (Spark ``percentile`` == DuckDB ``quantile_cont``
    bit-for-bit)."""
    from pyspark.sql import Window

    c = F.col(col)
    b = (
        F.least(
            F.greatest(F.floor((c - F.lit(lo)) / F.lit(float(width))), F.lit(0)),
            F.lit(n_bins - 1),
        )
        .cast("long")
        .alias("b")
    )
    bins = df.select(b).groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    # 256-row window: unpartitioned ORDER BY is fine forever — the
    # histogram is constant-size no matter the input
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        bins.select("b", "c", F.sum("c").over(w).alias("cum"))
        .withColumn("before", F.col("cum") - F.col("c"))
        .crossJoin(df.agg(F.count(F.lit(1)).alias("n_total")))
    )
    # ALL quantiles in one plan (no per-q jobs, no persist): explode the
    # q list against the 256-row cumulative table, keep each q's first
    # bin with cum >= ceil(q*N) via min_by, and ride the exact
    # percentiles along as ONE array-typed aggregate.
    # constant q-list row from range(1), NOT a global agg over df —
    # Catalyst doesn't prune a global aggregate's child, so the agg
    # form re-scanned the whole input just to emit one row (ADVICE r2)
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    qrows = df.sparkSession.range(1).select(F.posexplode(qarr).alias("qi", "q"))
    hit = (
        qrows.crossJoin(cum)
        .withColumn("k", F.ceil(F.col("q") * F.col("n_total")))
        .where(F.col("cum") >= F.col("k"))
        .groupBy("qi", "q")
        .agg(
            F.min_by(
                F.struct("b", "c", "before", "k"), F.col("b")
            ).alias("s")
        )
    )
    est = (
        F.lit(lo)
        + F.col("s.b").cast("double") * F.lit(float(width))
        + (
            (F.col("s.k") - F.col("s.before")).cast("double")
            / F.col("s.c").cast("double")
        )
        * F.lit(float(width))
    )
    exact_rows = df.agg(F.percentile(c, qarr).alias("_ex")).select(
        F.posexplode("_ex").alias("qi", "exact_quantile")
    )
    return (
        hit.join(exact_rows, "qi")
        .select("q", est.alias("est_quantile"), "exact_quantile")
        .orderBy("q")
    )


# -- Bloom-filter join pruning -------------------------------------------
def bloom_positions(dim: DataFrame, key: str, m: int = 1024) -> DataFrame:
    """The filter itself: the distinct set of j=2 bit positions over
    the dim keys. Size <= 2·|dim| rows of one long — broadcastable for
    any dim that is broadcastable, i.e. always when bloom pruning is
    the right plan."""
    kc = F.col(key)
    p1 = (hash52(kc, 1) % m).alias("pos")
    p2 = (hash52(kc, 1 + _HEX_CHARS) % m).alias("pos")
    return dim.select(p1).union(dim.select(p2)).distinct()


def bloom_prune(
    fact: DataFrame, key: str, positions: DataFrame, m: int = 1024
) -> DataFrame:
    """Keep fact rows whose j=2 positions are all set. Two broadcast
    left-semi joins: the fact table is filtered map-side with ZERO
    shuffle of the fact — at 100 TB this runs inside the scan stage,
    upstream of whatever join/agg follows (false positives are then
    removed by the real join; correctness never depends on the filter).
    """
    kc = F.col(key)
    probed = fact.withColumn("_bf_p1", hash52(kc, 1) % m).withColumn(
        "_bf_p2", hash52(kc, 1 + _HEX_CHARS) % m
    )
    pos = positions.select(F.col("pos"))
    return (
        probed.join(
            F.broadcast(pos.withColumnRenamed("pos", "_bf_p1")), "_bf_p1", "left_semi"
        )
        .join(
            F.broadcast(pos.withColumnRenamed("pos", "_bf_p2")), "_bf_p2", "left_semi"
        )
        .drop("_bf_p1", "_bf_p2")
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    split_cond: Column,
    lo: float,
    hi: float,
    n_bins: int = 10,
    round_to: int = 9,
) -> DataFrame:
    """Population Stability Index between the reference population
    (``split_cond`` true) and the current one (false): per fixed-width
    bin, ``psi_term = (q - p) * ln(q / p)`` with 0.5-smoothed bin
    shares — the standard drift monitor a training-data pipeline runs
    between snapshots before trusting a refreshed corpus.

    One constant-keyspace groupBy (n_bins x 2 cells, map-side combined
    to <= 2*n_bins rows per partition before the shuffle) — the same
    mergeable-histogram shape as :func:`histogram_quantiles`, so a
    100 TB scan reduces to a KB-sized table before any shuffle. The
    PSI total sums the ROUNDED per-bin terms as DECIMAL, so it is
    order-free and engine-exact.

    Out-of-range values clamp into the edge bins (a drift monitor must
    count tail mass somewhere — silently dropping it would hide
    exactly the drift it exists to catch).
    """
    width = (hi - lo) / n_bins
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))),
    ).cast("int")
    cells = (
        df.select(bin_col.alias("bin"), split_cond.cast("int").alias("is_ref"))
        .groupBy("bin")
        .agg(
            F.sum(F.col("is_ref")).alias("ref_n"),
            F.sum(F.lit(1) - F.col("is_ref")).alias("cur_n"),
        )
    )
    # dense bin axis: bins with no rows at all still contribute (their
    # smoothed shares differ from zero)
    axis = df.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    # materialize the n_bins-row cell table ONCE: the totals branch and
    # the psi-total branch would otherwise each re-derive it -- i.e.
    # re-scan the full input (2 extra corpus scans at 100 TB for a
    # KB-sized intermediate)
    from .dedup import _truncate_lineage

    cells = _truncate_lineage(
        axis.join(cells, "bin", "left")
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    tot = cells.agg(
        F.sum("ref_n").alias("_tr"), F.sum("cur_n").alias("_tc")
    )
    j = cells.crossJoin(F.broadcast(tot))
    p = (F.col("ref_n") + F.lit(0.5)) / (F.col("_tr") + F.lit(0.5) * n_bins)
    q = (F.col("cur_n") + F.lit(0.5)) / (F.col("_tc") + F.lit(0.5) * n_bins)
    term = F.round((q - p) * F.log(q / p), round_to)
    out = j.select("bin", "ref_n", "cur_n", term.alias("psi_term"))
    total = out.agg(
        F.sum(F.col("psi_term").cast(f"decimal(18,{round_to})"))
        .cast("double")
        .alias("psi_total")
    )
    return out.crossJoin(F.broadcast(total))

