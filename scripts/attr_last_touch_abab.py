"""Adjudicate the r12 stream_attr_last_touch 32-core anomaly (r13,
verdict task #3): 19.06 s at 32 cores vs 1.64 s at 8 cores on the same
code, a 0.09 scaling ratio the recorded 21.6% steal spike cannot
explain alone. Suspect: the replay runs with the SESSION's
shuffle.partitions (= CPUS in the bench session) as its state-store
partition count, unlike the other ~15 twins which pin
shuffle_partitions=8 in replay_to_memory.

Interleaved ABAB in ONE 32-core session:
  A = the shipped query (state partitions = session default = 32)
  B = identical transform, replay pinned to 8 state partitions

    python scripts/attr_last_touch_abab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selium_spark import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def run(spark, pin8: bool) -> float:
    from pyspark.sql import DataFrame

    from selium_spark.sources.tables import ensure_nanos_as_long
    from selium_spark.streaming.replay import replay_to_memory
    from selium_spark.suite import _norm_stream_ts

    ensure_nanos_as_long(spark)
    schema = spark.read.parquet(f"{SF}/events.parquet").schema

    def transform(stream: DataFrame) -> DataFrame:
        from selium_spark.operators.stateful import streaming_last_touch as op

        ev = _norm_stream_ts(stream, schema)
        return op(
            ev, "user_id", "event_type", "ts", "event_id",
            touch_type="click", conv_type="purchase", max_gap_s=3600,
            state_buckets=256,
        )

    t0 = time.time()
    snap = replay_to_memory(
        spark, f"{SF}/events.parquet", schema, transform,
        output_mode="update",
        **({"shuffle_partitions": 8} if pin8 else {}),
    )
    out = snap.na.fill({"touch_id": -1, "gap_s": -1})
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark(app_name="attr_abab", cpus=32, shuffle_partitions=32)
    run(spark, True)  # warm-up
    a, b = [], []
    for i in range(REPS):
        a.append(round(run(spark, False), 3))
        b.append(round(run(spark, True), 3))
        print(f"rep{i}: A(session=32 parts)={a[-1]}  B(pinned 8)={b[-1]}",
              flush=True)
    print({"A_32part": a, "B_8part": b, "A_min": min(a), "B_min": min(b)})


if __name__ == "__main__":
    main()
