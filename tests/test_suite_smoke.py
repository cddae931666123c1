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


def test_bench_retime_suspects_emits_both_readings():
    """Round-5 verdict #6: a contaminated sweep (simulated by an
    injected loadavg attribution far above the core count) triggers a
    standalone re-time of exactly the suspect queries; both readings
    surface and the published timing becomes the min — a phantom
    regression cannot survive into BENCH_r0N."""
    import bench

    timings = {"q_contaminated": 5.0, "q_clean": 1.0, "q_errored": -1.0}
    load = {"q_contaminated": 99.0, "q_clean": 10.0, "q_errored": 88.0}
    calls = []

    def runner(name):
        calls.append(name)
        return 2.0

    retimes = bench.retime_suspects(timings, load, runner, cpus=32, reps=2)
    assert retimes == {"q_contaminated": {"benched": 5.0, "retimed": 2.0}}
    assert timings["q_contaminated"] == 2.0  # min of both readings
    assert calls == ["q_contaminated", "q_contaminated"]
    assert timings["q_clean"] == 1.0  # untouched: below threshold
    assert timings["q_errored"] == -1.0  # errored queries never re-run

    # a re-time that is WORSE keeps the sweep's reading but still
    # reports both numbers
    timings2 = {"q_x": 1.5}
    retimes2 = bench.retime_suspects(
        timings2, {"q_x": 80.0}, lambda n: 9.9, cpus=32, reps=1
    )
    assert retimes2 == {"q_x": {"benched": 1.5, "retimed": 9.9}}
    assert timings2["q_x"] == 1.5
