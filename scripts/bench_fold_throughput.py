"""Fold-throughput microbench for the streaming stateful operators.

Measures rows/s through ONE applyInPandasWithState batch fold on a
100k-row key group (pure pandas — no Spark session, so the number
isolates the fold itself, which is what the per-key inner loop costs
at streaming rates). The vectorized folds (stateful._enrich_fold,
_funnel_fold, _gapfill_fold) are compared against the round-4
iterrows reference implementations, inlined below verbatim so the
ratio stays reproducible after the originals are gone.

Usage: python scripts/bench_fold_throughput.py [rows]
Prints one JSON line per fold: {"fold": ..., "rows": N,
"vectorized_s": ..., "iterrows_s": ..., "speedup": ...}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from selium_spark.operators.stateful import (  # noqa: E402
    _enrich_fold,
    _funnel_fold,
    _gapfill_fold,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
rng = np.random.default_rng(42)


def timeit(f, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------- enrich
base_ts = pd.Timestamp("2024-01-01").value // 1000  # us
ts_us = base_ts + np.sort(rng.integers(0, 86_400_000_000 * 30, N))
is_cfg = rng.random(N) < 0.01  # slowly-changing config side
enrich_pdf = pd.DataFrame(
    {
        "ts": pd.to_datetime(ts_us, unit="us"),
        "_side": np.where(is_cfg, "config", "work"),
        "id": np.arange(N),
        "mult": np.where(is_cfg, rng.integers(1, 100, N).astype(str), None),
    }
)


def enrich_iterrows(pdf, current, ts, config_cols, work_cols):
    """round-4 reference fold (stateful.py@03a6344:88-107)."""
    out = []
    pdf = pdf.sort_values([ts, "_side"]).reset_index(drop=True)
    for _, row in pdf.iterrows():
        if row["_side"] == "config":
            current = {c: (None if pd.isna(row[c]) else row[c]) for c in config_cols}
        else:
            rec = {c: row[c] for c in work_cols}
            for c in config_cols:
                rec[f"{c}_asof"] = current[c]
            out.append(rec)
    return pd.DataFrame(out), current


cur0 = {"mult": None}
t_vec = timeit(lambda: _enrich_fold(enrich_pdf, cur0, "ts", ["mult"], ["id"]))
t_itr = timeit(lambda: enrich_iterrows(enrich_pdf, dict(cur0), "ts", ["mult"], ["id"]), reps=1)
a, _ = _enrich_fold(enrich_pdf, cur0, "ts", ["mult"], ["id"])
b, _ = enrich_iterrows(enrich_pdf, dict(cur0), "ts", ["mult"], ["id"])
assert a["mult_asof"].fillna("-").tolist() == b["mult_asof"].fillna("-").tolist()
print(json.dumps({"fold": "latest_enrich", "rows": N,
                  "vectorized_s": round(t_vec, 4), "iterrows_s": round(t_itr, 4),
                  "vectorized_rows_per_s": int(N / t_vec),
                  "speedup": round(t_itr / t_vec, 1)}))

# ---------------------------------------------------------------- funnel
steps = ["signup", "click", "purchase"]
funnel_pdf = pd.DataFrame(
    {
        "ts": pd.to_datetime(ts_us, unit="us"),
        "event_type": rng.choice(["signup", "click", "purchase", "view"], N),
    }
)


def funnel_iterrows(pdf, step, t_prev_us, type_col, ts_col, steps):
    """round-4 reference fold (stateful.py@03a6344:199-215)."""
    pdf = pdf.sort_values(ts_col).reset_index(drop=True)
    for _, row in pdf.iterrows():
        if step >= len(steps):
            break
        ts_v = int(row[ts_col].value // 1000)
        if row[type_col] == steps[step] and (
            step == 0 or (t_prev_us is not None and ts_v > t_prev_us)
        ):
            step += 1
            t_prev_us = ts_v
    return step, t_prev_us


t_vec = timeit(lambda: _funnel_fold(funnel_pdf, 0, None, "event_type", "ts", steps))
t_itr = timeit(lambda: funnel_iterrows(funnel_pdf, 0, None, "event_type", "ts", steps), reps=1)
assert _funnel_fold(funnel_pdf, 0, None, "event_type", "ts", steps) == funnel_iterrows(
    funnel_pdf, 0, None, "event_type", "ts", steps
)
print(json.dumps({"fold": "funnel", "rows": N,
                  "vectorized_s": round(t_vec, 4), "iterrows_s": round(t_itr, 4),
                  "vectorized_rows_per_s": int(N / t_vec),
                  "speedup": round(t_itr / t_vec, 1)}))

# --------------------------------------------------------------- gapfill
gap_pdf = pd.DataFrame(
    {
        "ts": pd.to_datetime(ts_us, unit="us"),
        "event_id": np.arange(N),
        "value": rng.random(N) * 100,
    }
)
PERIOD_US = 86_400_000_000


def gapfill_iterrows(pdf, st, ts_col, tb_col, val_col, period_us):
    """round-4 reference fold (stateful.py@03a6344:355-383)."""
    cur_p, cur_ts_us, cur_tb, cur_val = st
    out = []
    pdf = pdf.sort_values([ts_col, tb_col]).reset_index(drop=True)
    for _, row in pdf.iterrows():
        ts_v = int(row[ts_col].value // 1000)
        tb = int(row[tb_col])
        val = float(row[val_col])
        p = ts_v // period_us
        if cur_p is None:
            cur_p, cur_ts_us, cur_tb, cur_val = p, ts_v, tb, val
            out.append((p, val, False, ts_v, tb))
        elif p > cur_p:
            for hole in range(cur_p + 1, p):
                out.append((hole, cur_val, True, cur_ts_us, cur_tb))
            cur_p, cur_ts_us, cur_tb, cur_val = p, ts_v, tb, val
            out.append((p, val, False, ts_v, tb))
        elif p == cur_p and (ts_v, tb) > (cur_ts_us, cur_tb):
            cur_ts_us, cur_tb, cur_val = ts_v, tb, val
            out.append((p, val, False, ts_v, tb))
    return out, (cur_p, cur_ts_us, cur_tb, cur_val)


st0 = (None, None, None, None)
t_vec = timeit(lambda: _gapfill_fold(gap_pdf, st0, "ts", "event_id", "value", PERIOD_US))
t_itr = timeit(lambda: gapfill_iterrows(gap_pdf, st0, "ts", "event_id", "value", PERIOD_US), reps=1)
out_v, st_v, _ = _gapfill_fold(gap_pdf, st0, "ts", "event_id", "value", PERIOD_US)
out_i, st_i = gapfill_iterrows(gap_pdf, st0, "ts", "event_id", "value", PERIOD_US)
assert st_v == st_i
# collapse both to the max_by winner per period (the reader's view)
win_i = {}
for p, val, fill, s_ts, s_tb in out_i:
    if p not in win_i or (s_ts, s_tb) > win_i[p][2:]:
        win_i[p] = (val, fill, s_ts, s_tb)
win_v = {
    int(p): (v, bool(f), int(s), int(t))
    for p, v, f, s, t in zip(*out_v)
}
assert win_v == {int(p): (v[0], v[1], int(v[2]), int(v[3])) for p, v in win_i.items()}
print(json.dumps({"fold": "gapfill_locf", "rows": N,
                  "vectorized_s": round(t_vec, 4), "iterrows_s": round(t_itr, 4),
                  "vectorized_rows_per_s": int(N / t_vec),
                  "speedup": round(t_itr / t_vec, 1)}))
