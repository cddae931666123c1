"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (count() would let
column pruning skip projection work for map-only queries).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from selium_spark import get_spark  # noqa: E402
from selium_spark.suite import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: one per operator family; heavy all-pairs ops are covered
# by their scale-path variants (LSH / IVF), not brute force.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "wasm_udf_lcg_bucket",
    "q_window_rank_customers",
    "q_range_join_quantity",
    "w1c_session_windows",
    "t1_map_chain",
    "t4_classify_waf",
    "t11_http_scan",
    "w1_tumbling_daily",
    "w2_threshold_alerts",
    "w3_latest_enrich",
    "m3_fanout_assign",
    "text_quality",
    "text_fingerprints",
    "dedup_exact_docs",
    "dedup_lsh_candidates",
    "dedup_simhash_docs",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "mm_decode_features",
    "pipeline_data_prep",
    "stream_window_counts",
    "sketch_kmv_distinct",
    "sketch_hll_distinct",
    "sketch_bloom_prune",
    "sketch_histogram_quantiles",
    "sketch_cms_heavy_hitters",
    "rollup_hierarchical",
    "dedup_incremental",
    "pack_chunks",
    "url_domain_caps",
    "pack_shard_manifest",
    "funnel_steps",
    "cohort_retention_weekly",
    "zscore_value_outliers",
    "mix_weighted_sample",
    "mix_split_assign",
    "text_bigram_lm",
    "dedup_pagerank_canonical",
    "w_gapfill_locf_daily",
    "q_scd2_user_state",
    "q_rolling_7d_features",
    # round 4: hourly gapfill grain, streaming time-series twins,
    # f32+call_indirect wasm guest
    "w_gapfill_locf_hourly",
    "stream_scd2_history",
    "stream_gapfill_locf",
    "wasm_udf_route_scale",
    # round 5: toolchain-built (rustc) wasm guest, watermark-timeout
    # gapfill twin
    "wasm_udf_toolchain_mix",
    "wasm_udf_toolchain_table",
    "wasm_udf_toolchain_dispatch",
    "stream_gapfill_watermark_fill",
    "stream_funnel_abandoned",
    # round 5 late: LLVM loop codegen on the masked-lane vectorized
    # tier; DSIR importance resampling
    "wasm_udf_toolchain_loop",
    "text_dsir_select",
    "wasm_udf_toolchain_table_scale",
    # round 6: byte-stream guests on the vectorized row-memory tier,
    # real-bytes header decode, graded streaming LSH
    "wasm_udf_text_fnv",
    "wasm_udf_guest_tokens",
    "mm_header_decode",
    "stream_lsh_pairs",
    "text_bigram_ppl",
    "w_gapfill_locf_weekly",
    "pack_nextfit_manifest",
    "ts_series_corr_topk",
    "cep_match_sequence",
    "w_gapfill_interp_daily",
    "ts_ewma_level",
    "ts_cusum_alarms",
    "stream_cusum_alarms",
    "stream_ewma_level",
    "graph_copurchase_triangles",
    "drift_psi_value",
    "seq_transition_matrix",
    "mad_daily_outliers",
    "rank_global_curriculum",
    "text_pmi_collocations",
    "layout_zorder_cluster",
    "stream_session_windows",
    "text_remove_dup_spans",
    "text_budget_head",
    "attr_last_touch",
    "stream_interval_join",
    "mm_dhash_neardup",
    "dq_expectations",
    "stream_dq_expectations",
    "attr_first_touch",
    "stream_static_enrich",
    "stream_left_interval_join",
    "lang_confusion",
    "attr_multi_touch",
    "ts_weekly_ohlc",
    "emb_minmax_normalized",
    "stream_weekly_ohlc",
    "emb_int8_quantized",
    "seq_top_paths",
    # round 7: hot-bucket star branch, interp streaming twin,
    # append-mode OHLC, U-shaped attribution
    "dedup_simhash_hamming_star",
    "stream_gapfill_interp",
    "stream_weekly_ohlc_closed",
    "attr_position_touch",
    # round 8: the repo's most expensive batch query joins the bench
    # (r7 verdict task #4 — was scale-set-only, invisible to BENCH),
    # plus the daily-grain candlestick pair (r7 verdict task #8)
    "dedup_lsh_recall",
    "ts_daily_ohlc",
    "stream_daily_ohlc_closed",
    "q_asof_forward_enrich",
    "q_asof_nearest_enrich",
    # round 9: keyless as-of (bucketed two-phase device), alarms-only
    # CUSUM emission (batch + streaming twins), and the value-graded
    # xxhash64 exact-dedup production path
    "q_asof_keyless_market",
    "ts_cusum_alarms_only",
    "stream_cusum_alarms_only",
    "dedup_exact_docs_xxhash64",
    # round 10: keyless as-of nearest (both carry tables live), and the
    # spread-mode MAD path rides the existing mad_daily_outliers entry
    "q_asof_keyless_nearest",
    # round 11: IVFADC composite ANN (coarse probe x PQ residual
    # codes) + its streaming ingest twin and recall@10 metric
    "ann_ivfpq_topk",
    "ann_ivfpq_recall",
    "stream_ivfpq_encode",
    "emb_kmeans_assign",
    "emb_hard_negatives",
    "stream_attr_last_touch",
    "stream_attr_multi_touch",
    "stream_attr_position_touch",
    # round 12: materialized-index ANN probes, BPE tokenizer training
    # + its streaming apply twin
    "ann_ivf_index_topk",
    "ann_ivfpq_index_topk",
    "text_bpe_merges",
    "text_bpe_tokenize",
    "stream_bpe_tokenize",
]


#: Full sweeps over the whole headline list. Separating a query's
#: samples in time (a full sweep apart, minutes) is what actually
#: suppresses multi-minute co-tenant steal — min-of-3 back-to-back
#: sits entirely inside one noisy window (the BENCH_r04 failure mode:
#: 49.1 s recorded for an engine whose adjudicated cost was ~33 s).
SWEEPS = int(os.environ.get("SPARK_GRAFT_BENCH_SWEEPS", "2"))
#: Extra back-to-back reps for sub-second queries, where single-run
#: jitter (JIT/GC) is the same magnitude as the query itself.
FAST_QUERY_S = 1.0
FAST_EXTRA_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_FAST_REPS", "4"))


#: max 1-min loadavg observed around each query's samples — a query
#: whose loadavg peak is far above CPUS was timed under co-tenant steal
#: and its reading is suspect (attributes contamination to specific
#: queries instead of tainting the whole run).
_query_load: dict[str, float] = {}

#: max hypervisor steal% observed across each query's samples. loadavg
#: only sees LOCAL runnable tasks; on this (VM) box the co-tenant
#: signal that actually moves multi-core stage times is /proc/stat
#: steal — measured at 11.9% under a full 32-way burn on a
#: loadavg-quiet box (r12), i.e. a ~12% parallel-throughput haircut
#: invisible to every pre-r12 suspect heuristic. The canary absorbs
#: steal sub-proportionally (its ~35 ms tasks leave much of its wall to
#: driver/scheduler overhead), so steal is recorded directly, per query
#: and run-wide.
_query_steal: dict[str, float] = {}


def _stat_jiffies() -> tuple[int, int] | None:
    """(steal, total) jiffies from the aggregate /proc/stat cpu line."""
    try:
        with open("/proc/stat") as f:
            vals = [int(v) for v in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return None


def _steal_pct(before, after) -> float | None:
    if not before or not after or after[1] <= before[1]:
        return None
    return round(100.0 * (after[0] - before[0]) / (after[1] - before[1]), 1)


def run_one(spark, name: str) -> float:
    _query_load[name] = max(_query_load.get(name, 0.0), os.getloadavg()[0])
    j0 = _stat_jiffies()
    t0 = time.time()
    df = QUERIES[name](spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    _query_load[name] = max(_query_load[name], os.getloadavg()[0])
    sp = _steal_pct(j0, _stat_jiffies())
    if sp is not None:
        _query_steal[name] = max(_query_steal.get(name, 0.0), sp)
    return dt


#: extra reps a suspect (contaminated) query gets at the end of the run
RETIME_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_RETIME_REPS", "3"))


def canary_once(spark) -> float:
    """Box-speed canary (r10, judge task #2): a FIXED synthetic
    workload — pure PySpark builtins over ``spark.range``, zero repo
    operators, zero testdata — timed at every sweep boundary.

    Round-over-round BENCH deltas were uninterpretable (the r9 bench
    read 1.20x slower on ~flat code; a judge worktree A/B was needed
    to clear it): this box's epoch-to-epoch speed swings ~2x. The
    canary gives every BENCH_rN a recorded normalizer measured IN the
    same session, same minutes, as the queries: compare
    ``value * (canary_ref / canary_sec)`` across rounds, or just
    check whether the canary moved with the headline number (box) or
    stayed put (code).

    DO NOT EDIT this workload — its only value is being identical
    across rounds. It exercises the three cost centers the suite
    leans on: shuffle agg (groupBy on 100k keys), a window sort, and
    whole-stage-codegen expression work over 20M rows.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t0 = time.time()
    df = spark.range(0, 20_000_000, 1, 32)
    agg = (
        df.withColumn("k", F.pmod(F.xxhash64("id"), F.lit(100_000)))
        .withColumn("v", (F.col("id") % 997).cast("double"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy(F.pmod(F.col("k"), F.lit(64))).orderBy(
        F.col("s").desc(), F.col("k")
    )
    out = agg.withColumn("r", F.row_number().over(w)).where(F.col("r") <= 10)
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def canary32_once(spark) -> float:
    """Second box-speed canary (r13, judge task #2): a FIXED,
    embarrassingly-parallel 32-task workload with NO shuffle beyond the
    singleton final aggregate — pure per-core JVM compute, so its wall
    tracks 32-way throughput (and hypervisor steal) proportionally,
    which the original canary's ~35 ms tasks under-weight. It is also
    insensitive to codegen-cache effects by construction: its one plan
    compiles on the warm-up invocation and stays cached (the r12
    cache fix invalidated `delta_canary_norm` because the ORIGINAL
    canary's classes were being evicted and recompiled per sweep).

    DO NOT EDIT this workload — its only value is being identical
    across rounds.
    """
    from pyspark.sql import functions as F

    t0 = time.time()
    df = spark.range(0, 256_000_000, 1, 32)
    h = F.xxhash64(F.col("id"))
    # every term is pmod-bounded BEFORE the sum so the aggregate can
    # never overflow a long under ANSI (256M rows x <1e6 < 2^63)
    out = df.select(
        F.sum(F.pmod(F.xxhash64(h, F.lit(1)), F.lit(1_000_003))).alias("a"),
        F.sum(F.pmod(F.xxhash64(h, F.lit(2)), F.lit(999_983))).alias("b"),
        F.sum(F.pmod(h, F.lit(997))).alias("c"),
    )
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def session_trim(spark) -> None:
    """Between-sweep session-aging mitigation (r10, judge task #5):
    clear the SQL cache and nudge BOTH collectors. Long single-session
    sweeps accumulate block-manager blocks (every localCheckpoint pin
    lives until its DataFrame is GC'd Python-side AND the JVM context
    cleaner runs) plus JIT/GC pressure that inflated sub-second
    queries 2-7x by sweep end (r9). Python gc.collect() drops the
    DataFrame refs, System.gc() lets the ContextCleaner actually free
    the blocks."""
    import gc

    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def retime_suspects(
    timings: dict,
    query_load: dict,
    runner,
    cpus: int = 32,
    reps: int = RETIME_REPS,
    threshold: float = 1.25,
) -> dict:
    """Auto re-time queries whose surrounding loadavg peaked above
    ``cpus * threshold`` (co-tenant steal) — round-5 verdict task #6.

    Each suspect gets ``reps`` fresh back-to-back runs at the END of
    the sweep (minutes after the contaminated window); BOTH readings
    are returned ({name: {benched, retimed}}) and ``timings`` is
    updated in place with the better (min) one, so a contaminated
    sweep can inflate a query's published number only if the re-time
    was contaminated too — and the JSON says so either way.
    """
    retimes: dict = {}
    for name, peak in sorted(query_load.items()):
        if peak <= cpus * threshold or timings.get(name, -1.0) < 0:
            continue
        samples = []
        for _ in range(reps):
            try:
                samples.append(runner(name))
            except Exception:
                break
        if not samples:
            continue
        best = round(min(samples), 3)
        retimes[name] = {"benched": timings[name], "retimed": best}
        if best < timings[name]:
            timings[name] = best
    return retimes


def round_over_round(
    timings: dict,
    canary_sec: float,
    repo_dir: str | None = None,
    canary32_sec: float | None = None,
) -> dict | None:
    """Canary-normalized round-over-round delta (r11, judge task #3 —
    BENCH_r10 recorded the canary but the comparison was still raw
    seconds, leaving manual adjudication to the judge).

    Finds the highest-numbered ``BENCH_r*.json`` in the repo root (the
    previous round's recorded line), intersects its query set with this
    run's (both readings >= 0 — like-for-like, since the headline list
    grows every round), and reports:

    - ``delta_raw``        = lfl_now / lfl_prev  (raw seconds ratio)
    - ``delta_canary_norm``= delta_raw * canary_prev / canary_now —
      the code-level ratio after dividing out box speed, valid because
      the canary is a FIXED workload timed in the same session minutes
      as the queries on both sides. < 1 means the code got faster.

    Returns None when no prior BENCH exists; ``delta_canary_norm`` is
    None when the prior round predates the canary (r1-r9).
    """
    import glob
    import re

    repo_dir = repo_dir or os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), p))
    if not rounds:
        return None
    rn, path = max(rounds)
    try:
        with open(path) as f:
            prev = json.load(f)
    except Exception:
        return None
    # The driver's BENCH_rN.json wraps bench stdout: {"parsed": <the
    # JSON line or null>, "tail": "<last N chars of stdout>"}. When
    # parsed is null (tail truncated mid-line), scrape "name": secs
    # pairs from the tail — the intersection with THIS run's query
    # names below filters out non-query keys, and a query that fell
    # off the truncated front just drops out of the like-for-like set.
    if "queries" not in prev and prev.get("parsed"):
        prev = prev["parsed"]
    if "queries" not in prev and isinstance(prev.get("tail"), str):
        tail = prev["tail"]
        scraped = {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"(\w+)": (-?\d+(?:\.\d+)?)', tail)
        }
        cm = re.search(r'"canary_sec": (\d+(?:\.\d+)?)', tail)
        cm32 = re.search(r'"canary32_sec": (\d+(?:\.\d+)?)', tail)
        prev = {
            "queries": scraped,
            "canary_sec": float(cm.group(1)) if cm else None,
            "canary32_sec": float(cm32.group(1)) if cm32 else None,
        }
    prev_q = prev.get("queries") or {}
    shared = sorted(
        n
        for n, t in timings.items()
        if t is not None
        and t >= 0
        and prev_q.get(n) is not None
        and prev_q[n] >= 0  # `or -1` would drop an exact-0.0 reading
    )
    if not shared:
        return None
    lfl_now = sum(timings[n] for n in shared)
    lfl_prev = sum(prev_q[n] for n in shared)
    out = {
        "prev_round": rn,
        "shared_queries": len(shared),
        "lfl_now_sec": round(lfl_now, 3),
        "lfl_prev_sec": round(lfl_prev, 3),
        "delta_raw": round(lfl_now / lfl_prev, 4) if lfl_prev > 0 else None,
        "canary_prev_sec": prev.get("canary_sec"),
        "delta_canary_norm": None,
        # r13: second normalizer from the compile-free 32-way canary —
        # immune to codegen-cache effects and weights multi-core
        # throughput proportionally (judge task #2). None until the
        # previous round's line carries canary32_sec.
        "canary32_prev_sec": prev.get("canary32_sec"),
        "delta_canary32_norm": None,
    }
    prev_canary = prev.get("canary_sec")
    if prev_canary and canary_sec and lfl_prev > 0:
        out["delta_canary_norm"] = round(
            (lfl_now / lfl_prev) * (prev_canary / canary_sec), 4
        )
    prev_c32 = prev.get("canary32_sec")
    if prev_c32 and canary32_sec and lfl_prev > 0:
        out["delta_canary32_norm"] = round(
            (lfl_now / lfl_prev) * (prev_c32 / canary32_sec), 4
        )
    return out


def main() -> None:
    spark = get_spark(app_name="selium_bench", cpus=CPUS, shuffle_partitions=CPUS)
    load_start = os.getloadavg()
    steal_run_start = _stat_jiffies()
    # warm the JVM: parquet reader, codegen'd agg + join paths (JIT cost
    # lands here, not in the first measured query)
    from pyspark.sql import functions as F

    region = spark.read.parquet(f"{SF_DIR}/region.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)), F.sum(F.col("n_nationkey").cast("decimal(18,2)")))
        .collect()
    )
    # Warm-min protocol (BASELINE.md "Round-4 standalone re-timings"):
    # sweep 0 is each query's warm-up (first touch pays codegen +
    # parquet-footer reads and is NEVER the engine's cost); the min is
    # taken over the later sweeps, which are a full suite pass apart
    # in time, plus extra back-to-back reps for sub-second queries.
    samples: dict[str, list[float]] = {n: [] for n in HEADLINE}
    errors: set[str] = set()
    # box-speed canary at every sweep boundary (r10): one warm-up,
    # then a sample before each sweep and after the last
    canary_samples: list[float] = []
    canary32_samples: list[float] = []
    canary_once(spark)
    canary32_once(spark)  # warm-up: compiles+caches its one plan
    for sweep in range(SWEEPS + 1):
        canary_samples.append(round(canary_once(spark), 3))
        canary32_samples.append(round(canary32_once(spark), 3))
        for name in HEADLINE:
            if name in errors:
                continue
            try:
                samples[name].append(run_one(spark, name))
            except Exception as exc:  # keep the line parseable even on failure
                errors.add(name)
                print(f"bench error {name}: {exc}", file=sys.stderr)
        session_trim(spark)
    canary_samples.append(round(canary_once(spark), 3))
    canary32_samples.append(round(canary32_once(spark), 3))
    for name in HEADLINE:
        post_warm = samples[name][1:]
        if name in errors or not post_warm:
            continue
        if min(post_warm) < FAST_QUERY_S:
            for _ in range(FAST_EXTRA_REPS):
                try:
                    samples[name].append(run_one(spark, name))
                except Exception as exc:
                    errors.add(name)
                    print(f"bench error {name}: {exc}", file=sys.stderr)
                    break
    timings: dict[str, float] = {}
    for name in HEADLINE:
        post_warm = samples[name][1:]
        if name in errors or not post_warm:
            timings[name] = -1.0
        else:
            timings[name] = round(min(post_warm), 3)
    # contaminated readings get a fresh standalone re-time, minutes
    # after the noisy window; both readings land in the JSON below
    suspects_now = {
        q: v for q, v in _query_load.items() if v > CPUS * 1.25
    }
    retimes = (
        retime_suspects(
            timings, suspects_now, lambda n: run_one(spark, n), cpus=CPUS
        )
        if suspects_now
        else {}
    )
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    # streaming replay throughput (rows/s through the windowed pipeline)
    stream_rps = None
    t_stream = timings.get("stream_window_counts", -1)
    if t_stream and t_stream > 0:
        n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
        stream_rps = round(n_events / t_stream)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time",
                "value": round(sum(t for t in timings.values() if t >= 0), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "protocol": f"warm-up + min over {SWEEPS} time-separated sweeps"
                            f" (+{FAST_EXTRA_REPS} reps for sub-{FAST_QUERY_S}s queries)"
                            " + box-speed canary + between-sweep session trim",
                # box-speed normalizer (r10): a FIXED synthetic workload
                # (canary_once — never edit it) timed at each sweep
                # boundary. Cross-round comparisons should normalize by
                # canary_sec or at least check it moved with the
                # headline number (box) vs stayed put (code).
                "canary_sec": round(min(canary_samples), 3),
                "canary_samples": canary_samples,
                # r13 second canary (judge task #2): compile-free,
                # shuffle-free, 32 equal tasks — proportional to
                # multi-core throughput and immune to codegen-cache
                # effects. DO NOT EDIT canary32_once.
                "canary32_sec": round(min(canary32_samples), 3),
                "canary32_samples": canary32_samples,
                # like-for-like vs the previous round's recorded line,
                # both raw and canary-normalized (r11): the normalized
                # ratio divides out box speed — < 1 means code faster
                "round_over_round": round_over_round(
                    timings,
                    min(canary_samples),
                    canary32_sec=min(canary32_samples),
                ),
                "stream_rows_per_sec": stream_rps,
                # a contaminated run self-identifies: loadavg >> 32
                # means co-tenant steal, and the numbers are suspect
                "loadavg_start": [round(x, 1) for x in load_start],
                "loadavg_end": [round(x, 1) for x in os.getloadavg()],
                # hypervisor steal over the WHOLE run (r12): the
                # co-tenant signal loadavg cannot see. >~5% means every
                # multi-core stage time in this line carries roughly
                # that haircut; compare rounds' steal_pct before
                # reading delta_canary_norm as a code movement.
                "steal_pct": _steal_pct(steal_run_start, _stat_jiffies()),
                # per-query spikes (max over the query's samples; only
                # readings above the run-wide background are listed)
                "steal_spikes": {
                    q: v
                    for q, v in sorted(_query_steal.items())
                    if v >= 15.0
                },
                # per-query attribution: queries whose surrounding 1-min
                # loadavg peaked well above our own core count ran under
                # co-tenant steal — discount THOSE readings, not the run
                "suspect_queries": {
                    q: round(v, 1)
                    for q, v in sorted(suspects_now.items())
                },
                # both readings for every suspect: the sweep's number
                # and the end-of-run standalone re-time (the published
                # per-query value is the min of the two)
                "suspect_retimes": retimes,
            }
        )
    )


if __name__ == "__main__":
    main()
