"""Physical-plan regression tests: the scale properties the engine
promises (pushdown, pruning, broadcast, no gratuitous shuffles) are
asserted here so a refactor can't silently lose them."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from selium_spark.suite import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filters_push_to_parquet(spark):
    p = plan_of(spark, "q6_revenue_forecast")
    assert "PushedFilters" in p
    assert "GreaterThanOrEqual(l_shipdate" in p
    # column pruning: only the 4 referenced columns are read
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema
    assert "l_extendedprice" in read_schema


def test_q5_dims_broadcast(spark):
    p = plan_of(spark, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in p  # nation/region never shuffle the fact side


def test_t1_map_is_shuffle_free(spark):
    p = plan_of(spark, "t1_map_chain")
    assert "Exchange" not in p  # narrow transform: no shuffle at any scale
    assert "codegen id" in p  # whole-stage codegen covers the projection


def test_w1_single_shuffle_with_partial_agg(spark):
    p = plan_of(spark, "w1_tumbling_daily")
    # one exchange for the windowed groupBy; HashAggregate appears both
    # before (partial) and after (final) it -> map-side combine
    exchanges = [l for l in p.splitlines() if l.strip().startswith("(") and "Exchange" in l]
    assert len([l for l in p.splitlines() if "+- Exchange" in l or "Exchange (" in l]) >= 1
    assert p.count("HashAggregate") >= 2


def test_ann_bruteforce_is_take_ordered(spark):
    p = plan_of(spark, "ann_bruteforce_topk")
    assert "TakeOrderedAndProject" in p  # per-partition top-k, no global sort


def test_asof_join_single_sort_no_range_explosion(spark):
    p = plan_of(spark, "w3_latest_enrich")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "WindowExec" in p or "Window" in p  # the union+window formulation
