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


def test_bench_round_over_round_canary_normalized(tmp_path):
    """Round-10 verdict task #3: BENCH recorded the canary but the
    round-over-round comparison was still raw seconds. bench.py now
    computes the like-for-like delta itself, both raw and
    canary-normalized (divide out box speed), against the newest
    BENCH_r*.json — including the driver's wrapped format where
    `parsed` is null and queries must be scraped from a truncated
    `tail` string."""
    import json

    import bench

    # plain format (a full bench stdout line)
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"queries": {"a": 2.0, "b": 4.0, "gone": 1.0}, "canary_sec": 2.0})
    )
    # like-for-like: 'gone' missing now, 'new' missing before
    out = bench.round_over_round(
        {"a": 1.0, "b": 2.0, "new": 9.0}, canary_sec=1.0, repo_dir=str(tmp_path)
    )
    assert out["prev_round"] == 7
    assert out["shared_queries"] == 2
    assert out["delta_raw"] == 0.5  # 3.0 / 6.0
    # box got 2x faster (canary 2.0 -> 1.0), so code-level delta is 1.0
    assert out["delta_canary_norm"] == 1.0

    # newest round wins; driver-wrapped format with truncated tail
    tail = '"b": 4.0, "c": 1.0}, "canary_sec": 3.0, "loadavg_start": [1.0]}'
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"parsed": None, "tail": tail})
    )
    out2 = bench.round_over_round(
        {"b": 2.0, "c": 1.0}, canary_sec=1.5, repo_dir=str(tmp_path)
    )
    assert out2["prev_round"] == 8
    # loadavg_start etc. never collide: intersection is on query names
    assert out2["shared_queries"] == 2
    assert out2["delta_raw"] == 0.6  # 3.0 / 5.0
    assert out2["delta_canary_norm"] == 1.2  # 0.6 * (3.0 / 1.5)

    # errored queries (-1) drop from both sides
    out3 = bench.round_over_round(
        {"b": -1.0, "c": 1.0}, canary_sec=3.0, repo_dir=str(tmp_path)
    )
    assert out3["shared_queries"] == 1 and out3["delta_raw"] == 1.0

    # no prior BENCH at all
    empty = tmp_path / "empty"
    empty.mkdir()
    assert bench.round_over_round({"a": 1.0}, 1.0, repo_dir=str(empty)) is None
