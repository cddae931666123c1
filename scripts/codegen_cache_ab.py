"""A/B the generated-class cache size across bench-like sweeps (r12).

The aging probe showed identical 40-query batches dropping 159 -> 40 s
within one session while cumulative JIT time grew by ~360 s: with 127
headline queries emitting several codegen'd stages each, the default
100-entry `spark.sql.codegen.cache.maxEntries` thrashes, so every sweep
re-generates, re-compiles (janino) and re-JITs classes the session has
already built — exactly the cost the bench's warm-up sweep exists to
retire, and the cost any long-lived production driver pays per query.

Runs ONE session, sweeps the batch headline set twice, and prints per
sweep: wall seconds, cumulative source-gen/compile counts and times from
org.apache.spark.metrics.source.CodegenMetrics, cumulative JVM JIT time,
and the canary. Run once per config:

  python scripts/codegen_cache_ab.py 100
  python scripts/codegen_cache_ab.py 10000
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import HEADLINE, canary_once, session_trim, _stat_jiffies, _steal_pct  # noqa: E402
from selium_spark import get_spark  # noqa: E402
from selium_spark.suite import QUERIES  # noqa: E402

SF = "/root/testdata/sf0.1"


def codegen_stats(spark):
    jvm = spark.sparkContext._jvm
    cm = jvm.org.apache.spark.metrics.source.CodegenMetrics
    mf = jvm.java.lang.management.ManagementFactory
    return {
        "gen_class_count": cm.METRIC_GENERATED_CLASS_BYTECODE_SIZE().getCount(),
        "compile_count": cm.METRIC_COMPILATION_TIME().getCount(),
        "source_count": cm.METRIC_SOURCE_CODE_SIZE().getCount(),
        "jit_ms": mf.getCompilationMXBean().getTotalCompilationTime(),
    }


def main() -> None:
    entries = sys.argv[1] if len(sys.argv) > 1 else "100"
    spark = get_spark(
        app_name=f"codegen_ab_{entries}",
        cpus=32,
        shuffle_partitions=32,
        extra_conf={"spark.sql.codegen.cache.maxEntries": entries},
    )
    print(
        "maxEntries =", spark.conf.get("spark.sql.codegen.cache.maxEntries"),
        flush=True,
    )
    canary_once(spark)
    results = []
    for sweep in range(2):
        j0 = _stat_jiffies()
        t0 = time.time()
        errs = 0
        for name in HEADLINE:
            try:
                QUERIES[name](spark, SF).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                errs += 1
                print(f"err {name}: {exc}", file=sys.stderr)
        wall = round(time.time() - t0, 1)
        row = {
            "sweep": sweep,
            "wall_s": wall,
            "steal_pct": _steal_pct(j0, _stat_jiffies()),
            "canary_s": round(canary_once(spark), 3),
            "errs": errs,
            **codegen_stats(spark),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        session_trim(spark)
    print("RESULT " + json.dumps({"maxEntries": entries, "sweeps": results}))


if __name__ == "__main__":
    main()
