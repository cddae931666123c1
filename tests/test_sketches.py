"""Sketch operators (operators/sketches.py): pure-Python reference
models pin the exact md5-derived arithmetic, and plan checks pin the
scale properties (broadcast pruning, no fact-side shuffle)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from selium_spark.operators import sketches


def _md5(x) -> str:
    return hashlib.md5(str(x).encode()).hexdigest()


def _h52(x, off: int = 0) -> int:
    # off is 0-based here; sketches._hash52 uses 1-based substr
    return int(_md5(x)[off : off + 13], 16)


# -- KMV -----------------------------------------------------------------
def test_kmv_matches_python_model(spark):
    n, k = 1000, 256
    df = spark.range(n)
    row = sketches.kmv_distinct(df, "id", k=k).collect()[0]
    hashes = sorted({_h52(i) for i in range(n)})
    kth = hashes[k - 1]
    assert row.k == k
    assert row.kth_hash == kth
    assert row.est_distinct == (k - 1) * (1 << 52) / kth
    assert row.true_distinct == n
    # the estimator should actually be in the right ballpark
    assert abs(row.est_distinct - n) / n < 0.2


def test_kmv_exact_branch_below_k(spark):
    df = spark.range(100)
    row = sketches.kmv_distinct(df, "id", k=256).collect()[0]
    assert row.est_distinct == 100.0
    assert row.true_distinct == 100


# -- HLL -----------------------------------------------------------------
def _hll_model(values):
    regs = [0] * sketches.HLL_M
    for x in values:
        h = _md5(x)
        b = int(h[:2], 16) % sketches.HLL_M
        v = int(h[2:15], 16)
        rank = 53 - len(bin(v)[2:]) if v > 0 else 52
        regs[b] = max(regs[b], rank)
    return regs


def test_hll_registers_match_python_model(spark):
    n = 500
    regs = {
        r.b: r.mj
        for r in sketches.hll_registers(spark.range(n), "id").collect()
    }
    model = _hll_model(range(n))
    assert regs == {b: mj for b, mj in enumerate(model)}


def test_hll_estimate_formula_and_merge(spark):
    n = 2000
    row = sketches.hll_distinct(spark.range(n), "id").collect()[0]
    model = _hll_model(range(n))
    s_int = sum(1 << (52 - mj) for mj in model)
    assert row.s_int == s_int
    assert row.empty_regs == sum(1 for mj in model if mj == 0)
    assert row.est_distinct == 0.709 * 4096.0 * float(1 << 52) / s_int
    assert row.true_distinct == n
    # HLL with m=64 has ~13% stddev; allow 3 sigma
    assert abs(row.est_distinct - n) / n < 0.4
    # register-level mergeability: union of two halves == whole
    a = sketches.hll_registers(spark.range(0, 1000), "id")
    b = sketches.hll_registers(spark.range(1000, 2000), "id")
    merged = {
        r.b: r.mj
        for r in a.union(b).groupBy("b").agg(F.max("mj").alias("mj")).collect()
    }
    assert merged == {b_: mj for b_, mj in enumerate(model)}


# -- Bloom ---------------------------------------------------------------
def test_bloom_no_false_negatives_and_plan(spark):
    dim = spark.range(50).select(F.col("id").alias("k"))
    fact = spark.range(1000).select(F.col("id").alias("k"))
    pos = sketches.bloom_positions(dim, "k", m=256)
    passed = sketches.bloom_prune(fact, "k", pos, m=256)
    got = {r.k for r in passed.collect()}
    assert set(range(50)) <= got  # no false negatives, ever
    assert len(got) < 1000  # the filter actually prunes
    plan = passed._jdf.queryExecution().executedPlan().toString()
    # both probes must be broadcast left-semi joins: fact side never
    # shuffles (the whole point at 100 TB)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftSemi" in plan
    # the only shuffle allowed is the tiny position-set distinct; any
    # other hashpartitioning exchange means the fact side shuffled
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "pos#" in line


def test_bloom_positions_match_python_model(spark):
    dim = spark.range(20).select(F.col("id").alias("k"))
    got = {r.pos for r in sketches.bloom_positions(dim, "k", m=512).collect()}
    model = set()
    for i in range(20):
        model.add(_h52(i, 0) % 512)
        model.add(_h52(i, 13) % 512)
    assert got == model


# -- Histogram quantiles -------------------------------------------------
def test_histogram_quantiles_model_and_bounds(spark):
    import math

    n = 5000
    df = spark.range(n).select((F.col("id") * F.lit(1.0)).alias("x"))
    rows = {
        r.q: r
        for r in sketches.histogram_quantiles(
            df, "x", width=64.0, n_bins=128, qs=(0.5, 0.9)
        ).collect()
    }
    vals = list(range(n))
    for q in (0.5, 0.9):
        # python model of the same interpolation
        bins = [0] * 128
        for v in vals:
            bins[min(max(int(v // 64), 0), 127)] += 1
        k = math.ceil(q * n)
        cum = 0
        for b, c in enumerate(bins):
            if cum + c >= k:
                est = 0.0 + b * 64.0 + ((k - cum) / c) * 64.0
                break
            cum += c
        assert rows[q].est_quantile == est
        # estimate is within one bin width of the exact quantile
        assert abs(rows[q].est_quantile - rows[q].exact_quantile) <= 64.0


# -- Count-min -----------------------------------------------------------
def test_cms_upper_bound_and_model(spark):
    # skewed data: key i appears (i+1) times, i in 0..49
    rows = [(i,) for i in range(50) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k LONG")
    table = sketches.cms_table(df, "k", w=64)
    keys = df.select("k").distinct()
    est = {r.k: r.est_count for r in sketches.cms_estimate(table, keys, "k", w=64).collect()}

    # python model of the same salted-md5 addressing
    counters = [[0] * 64 for _ in range(sketches.CMS_D)]
    for (i,) in rows:
        for d in range(sketches.CMS_D):
            counters[d][int(_md5(f"{d}:{i}")[:13], 16) % 64] += 1
    for i in range(50):
        model = min(
            counters[d][int(_md5(f"{d}:{i}")[:13], 16) % 64]
            for d in range(sketches.CMS_D)
        )
        assert est[i] == model
        assert est[i] >= i + 1  # count-min never undercounts
