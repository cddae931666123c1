"""Why do the late-headline streaming twins bench 4-10x their isolated
cost? (r13: stream_attr_last_touch benched 19.1 s in r12 / 8.3 s today
at position ~120 of 127, but ABABs at 1.8-1.9 s in a fresh session at
EITHER state-partition count.)

Protocol: time the three attribution twins + two controls in a fresh
session, then AGE the session by running the bench's other streaming
twins (the ~15 replays that precede them in the headline order) twice,
then re-time. Also samples JVM-side counters that plausibly accumulate
(loaded state-store providers, total listener count, block-manager
block count) before/after, so a degradation points at its mechanism.

    python scripts/stream_aging_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selium_spark import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

PROBES = [
    "stream_attr_last_touch",
    "stream_attr_multi_touch",
    "stream_attr_position_touch",
    "stream_cusum_alarms",      # control: pinned-8 fold, early in list
    "stream_window_counts",     # control: plain agg twin, early in list
]

AGERS = [
    "stream_scd2_history",
    "stream_gapfill_locf",
    "stream_gapfill_watermark_fill",
    "stream_funnel_abandoned",
    "stream_lsh_pairs",
    "stream_cusum_alarms",
    "stream_ewma_level",
    "stream_session_windows",
    "stream_interval_join",
    "stream_dq_expectations",
    "stream_static_enrich",
    "stream_left_interval_join",
    "stream_weekly_ohlc",
    "stream_gapfill_interp",
    "stream_weekly_ohlc_closed",
    "stream_daily_ohlc_closed",
    "stream_ivfpq_encode",
    "stream_bpe_tokenize",
]


def jvm_counters(spark) -> dict:
    out = {}
    try:
        jvm = spark.sparkContext._jvm
        ss = jvm.org.apache.spark.sql.execution.streaming.state.StateStore
        out["loaded_state_providers"] = ss.numStateStoreProviders()
    except Exception as e:
        out["loaded_state_providers"] = f"n/a ({type(e).__name__})"
    try:
        status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
        out["executors"] = status.size()
    except Exception:
        pass
    try:
        jsparkSession = spark._jsparkSession
        out["listeners"] = jsparkSession.streams().listListeners().length
    except Exception as e:
        out["listeners"] = f"n/a ({type(e).__name__})"
    try:
        rdds = spark.sparkContext._jsc.getPersistentRDDs()
        out["persistent_rdds"] = rdds.size()
    except Exception:
        pass
    return out


def time_probe(spark, queries, label):
    from selium_spark.suite import QUERIES

    res = {}
    for name in PROBES:
        t0 = time.time()
        QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
        res[name] = round(time.time() - t0, 2)
    print(label, res, flush=True)
    return res


def main() -> None:
    from selium_spark.suite import QUERIES

    spark = get_spark(app_name="stream_aging", cpus=32, shuffle_partitions=32)
    # warm-up pass (codegen, parquet footers) — not measured
    time_probe(spark, PROBES, "warmup  ")
    print("counters@fresh:", jvm_counters(spark), flush=True)
    fresh = time_probe(spark, PROBES, "fresh   ")

    t0 = time.time()
    for sweep in range(2):
        for name in AGERS:
            QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
        print(f"aging sweep {sweep} done @{round(time.time()-t0,1)}s", flush=True)
    print("counters@aged:", jvm_counters(spark), flush=True)
    aged = time_probe(spark, PROBES, "aged    ")

    # does the bench's session_trim recover it?
    import gc

    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    trimmed = time_probe(spark, PROBES, "trimmed ")
    print("counters@trimmed:", jvm_counters(spark), flush=True)
    print({
        "fresh": fresh, "aged": aged, "trimmed": trimmed,
    })


if __name__ == "__main__":
    main()
