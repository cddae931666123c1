"""Round-end whole-engine timing sweep (the r8 device that found the
20.5 s and 16.5 s stragglers hiding outside BENCH, kept as a per-round
gate per the r8 verdict): run EVERY suite query at sf0.1 in one
session, warm-min-of-2, and print the slowest first so any straggler
above the 3 s bar gets a profile before the round ends.

Usage: python scripts/engine_sweep.py [sf_dir] [threshold_s]
Prints one line per query plus a JSON summary tail:
{"total_s": ..., "n": ..., "over_threshold": [...]}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from selium_spark import get_spark  # noqa: E402
from selium_spark.suite import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    spark = get_spark(app_name="engine_sweep", cpus=32, shuffle_partitions=32)
    times: dict[str, float] = {}
    t_start = time.time()
    for name, fn in QUERIES.items():
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 2)
        print(f"{times[name]:8.2f}  {name}", file=sys.stderr, flush=True)
    total = round(time.time() - t_start, 1)
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{t:8.2f}  {name}")
    over = {k: v for k, v in times.items() if v > thresh}
    print(json.dumps({"total_s": total, "n": len(times),
                      "sum_warm_min_s": round(sum(times.values()), 1),
                      "over_threshold": over}))


if __name__ == "__main__":
    main()
