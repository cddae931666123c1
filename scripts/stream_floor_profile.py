"""Decompose the streaming twins' per-trigger floor (r13, verdict task
#4): where do the 2-4.7 s of a stateful availableNow replay go, vs the
0.6-1.0 s identity floor?

For each probed twin the script runs the replay and captures every
micro-batch's StreamingQueryProgress durationMs breakdown
(triggerExecution / queryPlanning / getBatch / latestOffset / walCommit
/ addBatch / commitOffsets) plus stateOperators commit times, via a
listener. Run it on a quiet box AFTER the bench:

    python scripts/stream_floor_profile.py [sf_dir] [reps]

Prints one JSON block per query: wall, n_batches, summed durationMs per
phase, state commit ms. The decomposition is the evidence for either a
targeted fix (a phase we control) or a recorded floor (Spark-owned).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selium_spark import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

PROBES = [
    "stream_window_counts",      # agg twin (append)
    "stream_dq_expectations",    # stateless checks + agg
    "stream_attr_last_touch",    # applyInPandasWithState fold (update)
    "stream_attr_multi_touch",   # applyInPandasWithState fold (update)
    "stream_cusum_alarms",       # fold twin
    "stream_ivfpq_encode",       # stateless encode (append, no state)
    "stream_gapfill_interp",     # heaviest gapfill twin
]


def main() -> None:
    from pyspark.sql.streaming import StreamingQueryListener

    from selium_spark.suite import QUERIES

    spark = get_spark(app_name="stream_floor", cpus=32, shuffle_partitions=32)

    progresses: list = []

    class Rec(StreamingQueryListener):
        def onQueryStarted(self, e):  # noqa: N802
            pass

        def onQueryProgress(self, e):  # noqa: N802
            progresses.append(json.loads(e.progress.json))

        def onQueryTerminated(self, e):  # noqa: N802
            pass

        def onQueryIdle(self, e):  # noqa: N802
            pass

    rec = Rec()
    spark.streams.addListener(rec)

    results = {}
    for name in PROBES:
        fn = QUERIES[name]
        fn(spark, SF)  # warm-up (codegen, parquet footers)
        best = None
        for _ in range(REPS):
            progresses.clear()
            t0 = time.time()
            df = fn(spark, SF)
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            # listener events arrive async; give the bus a beat
            time.sleep(0.5)
            phases: dict[str, int] = {}
            state_ms = 0
            state_rows = 0
            for p in progresses:
                for k, v in (p.get("durationMs") or {}).items():
                    phases[k] = phases.get(k, 0) + int(v)
                for so in p.get("stateOperators") or []:
                    state_ms += int(so.get("allUpdatesTimeMs") or 0)
                    state_ms += int(so.get("commitTimeMs") or 0)
                    state_rows += int(so.get("numRowsTotal") or 0)
            snap = {
                "wall_s": round(wall, 3),
                "n_batches": len(progresses),
                "durationMs": phases,
                "state_update_plus_commit_ms": state_ms,
                "state_rows_total_lastsum": state_rows,
            }
            if best is None or snap["wall_s"] < best["wall_s"]:
                best = snap
        results[name] = best
        print(name, json.dumps(best), flush=True)
    spark.streams.removeListener(rec)
    print(json.dumps({"sf": SF, "results": results}))


if __name__ == "__main__":
    main()
