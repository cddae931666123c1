"""Scaling evidence: replicate sf0.1 N-fold with key remapping (so join
fan-outs stay linear, not quadratic) and measure headline queries at
both scales. A plan that "would survive 100x" should show ~linear wall
time here; a super-linear query indicates a shuffle/skew problem.

Usage: python scripts/scale_stress.py [N]   (default 10)
Writes the scaled dataset under /root/repo/tmp/scaled_sfX/ (gitignored).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from selium_spark import get_spark  # noqa: E402
from selium_spark.sources.tables import load_table  # noqa: E402
from selium_spark.suite import QUERIES  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
QUERY_SET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_revenue_forecast",
    "w1_tumbling_daily",
    "w2_threshold_alerts",
    "w3_latest_enrich",
    "m3_fanout_assign",
    "dedup_exact_docs",
    # sketches: rows x N with constant key cardinality — wall should
    # scale with rows while state/output stays constant-size
    "sketch_kmv_distinct",
    "sketch_hll_distinct",
    "sketch_cms_heavy_hitters",
    "rollup_hierarchical",
    # round 2: incremental dedup (delta-vs-index joins), chunking
    # (narrow map-side), shard manifests (single hash shuffle) — each
    # should scale linearly in rows
    "dedup_incremental",
    "pack_chunks",
    "pack_shard_manifest",
    "url_domain_caps",
]


def build_scaled(spark, n_copies: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    copies = spark.range(n_copies).withColumnRenamed("id", "_copy")

    def replicate(df, key_cols, ts_cols=()):
        maxes = {c: df.agg(F.max(c)).first()[0] + 1 for c in key_cols}
        out = df.crossJoin(F.broadcast(copies))
        for c in key_cols:
            out = out.withColumn(c, F.col(c) + F.col("_copy") * F.lit(maxes[c]))
        for c in ts_cols:
            # shift each copy by 40 days so windows spread instead of stacking
            out = out.withColumn(
                c, F.col(c) + F.make_interval(days=F.col("_copy").cast("int") * 40)
            )
        return out.drop("_copy")

    li = load_table(spark, BASE_SF, "lineitem")
    orders = load_table(spark, BASE_SF, "orders")
    events = load_table(spark, BASE_SF, "events")
    docs = load_table(spark, BASE_SF, "documents")

    replicate(li, ["l_orderkey"]).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    replicate(orders, ["o_orderkey"]).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    replicate(events, ["event_id"], ts_cols=["ts"]).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )
    replicate(docs, ["doc_id"]).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    # small dims unchanged
    for name in ("customer", "supplier", "part", "nation", "region", "embeddings"):
        shutil.copy(f"{BASE_SF}/{name}.parquet", f"{out_dir}/{name}.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in QUERY_SET:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = f"/root/repo/tmp/scaled_x{n}"
    spark = get_spark(app_name="scale_stress", cpus=32, shuffle_partitions=64)
    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        print(f"building {n}x dataset at {out_dir} ...", file=sys.stderr)
        build_scaled(spark, n, out_dir)
    base = time_queries(spark, BASE_SF)
    scaled = time_queries(spark, out_dir)
    report = {
        name: {
            "base_s": base[name],
            f"x{n}_s": scaled[name],
            "ratio": round(scaled[name] / max(base[name], 0.01), 1),
        }
        for name in QUERY_SET
    }
    print(json.dumps({"n_copies": n, "queries": report}, indent=2))


if __name__ == "__main__":
    main()
