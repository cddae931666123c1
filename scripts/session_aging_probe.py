"""Diagnose in-session degradation of a long multi-query session (r12).

BENCH_r12 baseline showed the box-speed canary degrading 1.23 -> 7.95 s
across one bench session (loadavg quiet, steal 1.5% run-wide) — every
late-sweep reading is inflated by whatever this is. This probe runs the
canary between batches of real suite queries in ONE session and records,
per canary sample: wall, hypervisor-steal% during the sample, cumulative
JVM GC time, JIT compilation time, and heap used — enough to tell apart
co-tenant steal, GC/heap growth (status-store retention, block-manager
pins) and JIT/codegen effects.

Usage: python scripts/session_aging_probe.py [trim|notrim] [lean|fat]
  trim   -> run bench.session_trim between batches (the bench protocol)
  lean   -> status-store retention cut to near-zero (the candidate fix)
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


def jvm_stats(spark):
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = sum(
        b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans()
    )
    jit_ms = mf.getCompilationMXBean().getTotalCompilationTime()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    return gc_ms, jit_ms, heap.getUsed() // (1 << 20)


def main() -> None:
    do_trim = "trim" in sys.argv[1:]
    lean = "lean" in sys.argv[1:]
    extra = {}
    if lean:
        extra = {
            "spark.sql.ui.retainedExecutions": "4",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "100",
            "spark.ui.retainedTasks": "1000",
            "spark.sql.pyspark.jvmStacktrace.enabled": "false",
            "spark.appStateStore.asyncTracking.enable": "true",
        }
    spark = get_spark(
        app_name="aging_probe", cpus=32, shuffle_partitions=32, extra_conf=extra
    )
    batch = [n for n in HEADLINE if not n.startswith("stream_")][:40]
    canary_once(spark)  # warm
    out = []
    for i in range(4):
        j0 = _stat_jiffies()
        c = canary_once(spark)
        sp = _steal_pct(j0, _stat_jiffies())
        gc_ms, jit_ms, heap_mb = jvm_stats(spark)
        out.append(
            {
                "round": i,
                "canary_s": round(c, 3),
                "steal_pct": sp,
                "gc_ms": gc_ms,
                "jit_ms": jit_ms,
                "heap_mb": heap_mb,
            }
        )
        print(json.dumps(out[-1]), flush=True)
        if i == 3:
            break
        t0 = time.time()
        for name in batch:
            try:
                QUERIES[name](spark, SF).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                print(f"err {name}: {exc}", file=sys.stderr)
        print(f"batch {i}: {time.time() - t0:.1f}s", flush=True)
        if do_trim:
            session_trim(spark)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
