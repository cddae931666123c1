"""Smoke: every suite query executes end-to-end at sf0.001 and returns
a well-formed result. The DuckDB oracle gate (scripts/check_correctness)
checks values; this guard makes plain pytest catch a query that a
refactor broke before the gate ever runs."""

from __future__ import annotations

import pytest

from selium_spark.suite import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"

# quadratic all-pairs and slow streaming queries get a smaller seat
# at the smoke table: execute but only count
EXPECTED_NONEMPTY = {
    "q1_pricing_summary",
    "w1_tumbling_daily",
    "t1_map_chain",
    "text_token_stats",
    "dedup_exact_docs",
    "ann_bruteforce_topk",
    "mm_decode_features",
    "s10_lcg_pipeline",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_executes(spark, name):
    df = QUERIES[name](spark, SF)
    n = df.count()
    assert n >= 0
    if name in EXPECTED_NONEMPTY:
        assert n > 0, f"{name} unexpectedly empty at sf0.001"
    assert len(df.columns) > 0


def test_registry_alignment():
    assert set(ORACLES) <= set(QUERIES)
    # every suite query carries a value oracle (zero rows-only entries)
    assert sorted(set(QUERIES) - set(ORACLES)) == []
