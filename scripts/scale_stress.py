"""Scaling evidence: replicate sf0.1 N-fold with key remapping (so join
fan-outs stay linear, not quadratic) and measure headline queries at
both scales. A plan that "would survive 100x" should show ~linear wall
time here; a super-linear query indicates a shuffle/skew problem.

Usage: python scripts/scale_stress.py [N]          (default 10)
       python scripts/scale_stress.py [N] --skew   (skewed-corpus mode)

--skew builds a SECOND Nx documents table where one domain carries 30%
of all rows and the same 30% share ONE boilerplate text (hot LSH band
buckets + hot content hash — the realistic web-corpus worst case), then
times the skew-sensitive document queries on uniform-Nx vs skewed-Nx.
Bounded ratios are the evidence that the salted top-k (urls.domain_cap),
the LSH hot-band cap, and the star-edge grouping hold under skew.

Writes the scaled dataset under /root/repo/tmp/scaled_xN/ (gitignored).
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
        # Spread the SMALL base table over 64 partitions BEFORE the
        # replicating cross-join: the join inherits that partitioning,
        # so the writer emits 64 splittable files. Without this the
        # base's single-file scan partitioning makes ONE writer task
        # pack the whole Nx table into ONE parquet row group — an
        # unsplittable file that serializes every downstream scan on a
        # single task (a layout no real 100 TB table has). Shuffling
        # the base costs MB; shuffling the replicated output (the
        # obvious post-hoc fix) moves N*base and stalls the driver.
        out = df.repartition(64).crossJoin(F.broadcast(copies))
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


# Queries that group/join on corpus-driven document keys — the set the
# --skew mode times on uniform vs skewed data.
SKEW_QUERY_SET = [
    "url_domain_caps",      # salted top-k vs 30%-hot domain
    "dedup_exact_docs",     # groupBy content hash (map-side combinable)
    "dedup_lsh_candidates", # hot-band cap vs 30%-hot band buckets
    "dedup_groups",         # star edges vs quadratic pair blowup
    "dedup_pagerank_canonical",  # checkpointed iterations over capped pairs
    "pipeline_data_prep",   # composite: quality -> dedup window
    # DSIR: bucket distributions are B=1024 rows regardless of skew;
    # the per-doc aggregate keys on unique doc_id. In the skewed corpus
    # the 'en' target balloons to the 30%-hot boilerplate (a far larger
    # target side than uniform's 1% slice), so the ratio is conservative
    "text_dsir_select",
]


def build_doc_corpus(spark, n_rows: int, out_dir: str, hot_frac: float) -> None:
    """Synthetic documents table (schema-identical to the testdata one)
    where skew is the ONLY variable: hot_frac == 0 gives every row a
    unique (lang, source) bucket and unique 12-word text; hot_frac > 0
    reroutes that fraction to ONE (lang, source) pair — making
    url_domain_caps' synthesized domain hot — and ONE boilerplate text
    (hot LSH band buckets + hot content hash). The Nx-replicated
    dataset can't serve here: replication makes EVERY doc an N-fold
    duplicate, so its 'uniform' corpus is already degenerate for
    content-keyed operators."""
    os.makedirs(out_dir, exist_ok=True)
    hot = (F.abs(F.xxhash64("doc_id")) % 100) < int(hot_frac * 100)
    boiler = (
        "the same cookie consent banner text appears on every single page "
        "of this very large site template"
    )
    uniq_text = F.concat_ws(
        " ", *[F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"#w{i}")))
               for i in range(12)]
    )
    docs = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.when(hot, F.lit(boiler)).otherwise(uniq_text).alias("text"),
        # uniform corpora still carry a ~1% 'en' slice so target-corpus
        # operators (text_dsir_select) have a non-empty target on BOTH
        # sides of the skew comparison
        F.when(hot | (F.col("id") % 97 == 0), F.lit("en"))
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 97).cast("string")))
        .alias("lang"),
        F.when(hot, F.lit("megahost"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 1013).cast("string")))
        .alias("source"),
    ).withColumn("n_chars", F.length("text"))
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    for name in ("customer", "supplier", "part", "nation", "region", "embeddings"):
        if not os.path.exists(f"{out_dir}/{name}.parquet"):
            shutil.copy(f"{BASE_SF}/{name}.parquet", f"{out_dir}/{name}.parquet")


def time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    out = {}
    for name in names:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skew_mode = "--skew" in sys.argv
    n = int(args[0]) if args else 10
    out_dir = f"/root/repo/tmp/scaled_x{n}"
    spark = get_spark(app_name="scale_stress", cpus=32, shuffle_partitions=64)
    if not skew_mode and not os.path.exists(f"{out_dir}/lineitem.parquet"):
        print(f"building {n}x dataset at {out_dir} ...", file=sys.stderr)
        build_scaled(spark, n, out_dir)
    if skew_mode:
        n_docs = n * 50_000  # N=10 -> 500k unique docs
        uni_dir = f"/root/repo/tmp/docs_uniform_{n_docs}"
        skew_dir = f"/root/repo/tmp/docs_skewed_{n_docs}"
        for d, frac in ((uni_dir, 0.0), (skew_dir, 0.3)):
            if not os.path.exists(f"{d}/documents.parquet"):
                print(f"building {n_docs}-doc corpus (hot_frac={frac}) at {d} ...",
                      file=sys.stderr)
                build_doc_corpus(spark, n_docs, d, frac)
        uniform = time_queries(spark, uni_dir, SKEW_QUERY_SET)
        skewed = time_queries(spark, skew_dir, SKEW_QUERY_SET)
        report = {
            name: {
                "uniform_s": uniform[name],
                "skewed_s": skewed[name],
                "ratio": round(skewed[name] / max(uniform[name], 0.01), 2),
            }
            for name in SKEW_QUERY_SET
        }
        print(json.dumps({"n_copies": n, "mode": "skew", "hot_frac": 0.3,
                          "queries": report}, indent=2))
        return
    base = time_queries(spark, BASE_SF, QUERY_SET)
    scaled = time_queries(spark, out_dir, QUERY_SET)
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
