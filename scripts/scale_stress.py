"""Scaling evidence: replicate sf0.1 N-fold with key remapping (so join
fan-outs stay linear, not quadratic) and measure headline queries at
both scales. A plan that "would survive 100x" should show ~linear wall
time here; a super-linear query indicates a shuffle/skew problem.

Usage: python scripts/scale_stress.py [N]              (default 10)
       python scripts/scale_stress.py [N] --skew       (skewed-corpus mode)
       python scripts/scale_stress.py --streaming      (stateful-stream mode)
       ... --abab   interleave the two corpora per query in ONE session
                    (box drift hits both sides of every ratio — use for
                    all perf claims; r10)
       ... --trim   clearCache between reps: persist-device queries pay
                    their true per-execution cost instead of amortizing
                    the build across reps (r10)

--skew builds a SECOND Nx documents table where one domain carries 30%
of all rows and the same 30% share ONE boilerplate text (hot LSH band
buckets + hot content hash — the realistic web-corpus worst case), then
times the skew-sensitive document queries on uniform-Nx vs skewed-Nx.
Bounded ratios are the evidence that the salted top-k (urls.domain_cap),
the LSH hot-band cap, and the star-edge grouping hold under skew.

--streaming (round-5 verdict task #1) replays the events corpus at
1x/10x/30x through the four stateful streaming operators
(streaming_scd2, streaming_gapfill_locf(emit_to_watermark=True),
streaming_funnel(abandon_after=...), dedup_within_watermark) in
MULTI-BATCH triggers (maxFilesPerTrigger over time-sliced files, so
micro-batches arrive in event-time order like a live deployment — NOT
one availableNow mega-batch), on both the RocksDB and the HDFS state
providers, and pins rows/s, final state size, and per-batch state
commit latency. Scaling here multiplies KEYS and ROWS at a constant
time span (copies are key-remapped, ts UNshifted) — the shape a bigger
deployment actually has; shifting ts per copy would make the global
watermark fill every early copy's keys across the whole shifted span,
a semantic blowup no real corpus exhibits.

Writes the scaled datasets under /root/repo/tmp/ (gitignored).
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import sys
import tempfile
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
    # round 6: next-fit packing (per-shard scans), bigram-LM ppl
    # (pair-table join), header decode (narrow mapInPandas chain)
    "pack_nextfit_manifest",
    "text_bigram_ppl",
    "mm_header_decode",
    # round 6 late: interp gapfill / EWMA / CUSUM scale in keys x periods
    # (the 40-day per-copy shift stretches the calendar, so the grids and
    # period chains genuinely lengthen); PSI is rows x N into constant
    # bins; MAD is two group sorts; transitions one window sort; the
    # triangle census stresses the wedge join as co-purchase support
    # multiplies with the copies
    "w_gapfill_interp_daily",
    "ts_ewma_level",
    "ts_cusum_alarms",
    # r9: the alarms-only emission (judge task #3) — same statistic,
    # output cut from keys x periods to threshold crossings; its 100x
    # ratio should collapse vs the full emission's 46.1
    "ts_cusum_alarms_only",
    "drift_psi_value",
    "mad_daily_outliers",
    "seq_transition_matrix",
    "graph_copurchase_triangles",
    # round 6 late 2: global rank stresses the range-bucketed two-phase
    # sort (buckets stay balanced as rows multiply); PMI the corpus
    # pair-table join; z-order the map-side bit interleave + one agg
    "rank_global_curriculum",
    "text_pmi_collocations",
    "layout_zorder_cluster",
    # span removal: positional table persist + shingle-keyed joins;
    # budget head: the two-phase global prefix sum
    "text_remove_dup_spans",
    "text_budget_head",
    # attribution: one window pass over events; dhash: 128 JVM hash
    # expressions/row + band self-join
    "attr_last_touch",
    "mm_dhash_neardup",
    # round 6 final: multi-touch adds the horizon explode; OHLC one
    # grouped agg; confusion a |langs|^2 aggregate; dq one-pass rules
    "attr_multi_touch",
    "ts_weekly_ohlc",
    "lang_confusion",
    "dq_expectations",
    # round 7: star-capped hamming bands (the 10x replication makes
    # every doc a 10-fold duplicate — exactly the swarm the star mode
    # collapses), the position-weight explode, and the two-banding
    # recall evaluation
    "dedup_simhash_hamming_star",
    "attr_position_touch",
    "dedup_lsh_recall",
    # round 8: the full-suite sweep's former stragglers, after their
    # rewrites (sorted-run top-bigram, window shingle counts, auto RHP
    # bits + norm-precomputed verify) — in the set so a regression to
    # the quadratic shapes is caught. dedup_simhash_hamming (the
    # UNCAPPED pairs branch) is deliberately absent: on the replicated
    # corpus every doc is a 10-fold near-dup, so its OUTPUT alone is
    # 3.85M verified pairs (~300 s measured at 10x) — the audit branch
    # for bounded corpora; its scale path is the star twin above.
    "text_repetition",
    "text_span_dedup",
    "dedup_embedding_neardup",
    "dedup_semantic",
    # r8: as-of directions (one window sort per pass; forward is the
    # DESC-sorted running frame)
    "q_asof_forward_enrich",
    "q_asof_nearest_enrich",
    # r10: keyless as-of (sampled-range-bucket device, both carries in
    # the nearest direction) — window exchange on ~32 bucket keys must
    # hold as rows multiply
    "q_asof_keyless_market",
    "q_asof_keyless_nearest",
    # r12: BPE — training is one corpus scan into the word-freq table
    # (replicated corpus: same vocab, freqs x N) + constant-size
    # vocab-table iterations, so its ratio should be the scan's;
    # tokenize adds the linear per-doc apply
    "text_bpe_merges",
    "text_bpe_tokenize",
]


#: ANN corpus-scaling set (r11): the embedding table is a copied-1:1
#: small dim in the main scaled dataset, so ANN queries get their own
#: vector-replicated corpus via --ann. Copy-0 keeps ids 0..15, so the
#: toy centroids/codebook ("first k by id") are CONSTANT across
#: scales — the experiment isolates index/encode/probe throughput at
#: N x vectors under a fixed model, the shape of growing a live index.
ANN_QUERY_SET = [
    "ann_ivfpq_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_bruteforce_topk",
    # r13: the materialized-index paths — under --skew the 30%-hot
    # inverted list drives the size-aware auto-salted index WRITE
    # (similarity._distribute_for_index_write), the single-writer
    # stall case the r12 default (salt_files=1) would strangle on
    "ann_ivf_index_topk",
    "ann_ivfpq_index_topk",
]


def build_ann_corpus(
    spark, n_copies: int, out_dir: str, hot_frac: float = 0.0
) -> None:
    """N x embeddings with remapped vec_ids (same device as
    build_scaled.replicate: pre-spread the small base so the writer
    emits splittable files). ``hot_frac`` > 0 builds the IVF
    worst case: that fraction of all rows carries vector 0's embedding
    EXACTLY, so they all land in ONE inverted list — and vector 0 is
    the suite's query, so the probe hits the hot list every time."""
    os.makedirs(out_dir, exist_ok=True)
    emb = load_table(spark, BASE_SF, "embeddings")
    mx = emb.agg(F.max("vec_id")).first()[0] + 1
    copies = spark.range(n_copies).withColumnRenamed("id", "_copy")
    out = (
        emb.repartition(32)
        .crossJoin(F.broadcast(copies))
        .withColumn("vec_id", F.col("vec_id") + F.col("_copy") * F.lit(mx))
        .drop("_copy")
    )
    if hot_frac > 0:
        hot = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
        out = out.withColumn(
            "embedding",
            F.when(
                F.pmod(F.xxhash64("vec_id"), F.lit(1000))
                < F.lit(int(hot_frac * 1000)),
                F.lit(hot).cast("array<float>"),
            ).otherwise(F.col("embedding")),
        )
        # keep ids 0..15 (copy 0) carrying their ORIGINAL vectors so the
        # toy centroids/codebook stay identical to the uniform corpus
        base16 = emb.where(F.col("vec_id") < 16).select("vec_id", "embedding")
        out = (
            out.alias("o")
            .join(F.broadcast(base16.alias("b")), "vec_id", "left")
            .select(
                "vec_id",
                F.coalesce(F.col("b.embedding"), F.col("o.embedding")).alias(
                    "embedding"
                ),
                *[c for c in out.columns if c not in ("vec_id", "embedding")],
            )
        )
    out.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def ann_main(n: int, skew: bool = False) -> None:
    """--ann: uniform Nx vector corpus vs base (scaling evidence).
    --ann --skew: uniform Nx vs 30%-hot-list Nx (ONE inverted list
    holds 30% of all vectors AND the query probes it) — the bounded
    skew ratio is the evidence that the compressed-codes ADC probe
    absorbs a hot list that a raw-vector probe pays full width for."""
    spark = get_spark(app_name="ann_scale", cpus=32, shuffle_partitions=64)
    out_dir = f"/root/repo/tmp/emb_x{n}"
    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        print(f"building {n}x embedding corpus at {out_dir} ...", file=sys.stderr)
        build_ann_corpus(spark, n, out_dir)
    if skew:
        hot_dir = f"/root/repo/tmp/emb_hot_x{n}"
        if not os.path.exists(f"{hot_dir}/embeddings.parquet"):
            print(f"building {n}x hot-list corpus at {hot_dir} ...", file=sys.stderr)
            build_ann_corpus(spark, n, hot_dir, hot_frac=0.3)
        dirs, labels = [out_dir, hot_dir], ("uniform_s", "skewed_s")
    else:
        dirs, labels = [BASE_SF, out_dir], ("base_s", f"x{n}_s")
    if ABAB:
        left, right = time_queries_abab(spark, dirs, ANN_QUERY_SET)
    else:
        left = time_queries(spark, dirs[0], ANN_QUERY_SET)
        right = time_queries(spark, dirs[1], ANN_QUERY_SET)
    report = {
        name: {
            labels[0]: left[name],
            labels[1]: right[name],
            "ratio": round(right[name] / max(left[name], 0.01), 2),
        }
        for name in ANN_QUERY_SET
    }
    print(
        json.dumps(
            {
                "n_copies": n,
                "mode": "ann_skew" if skew else "ann",
                **({"hot_frac": 0.3} if skew else {}),
                "queries": report,
            },
            indent=2,
        )
    )


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
    # bigram ppl: a 30%-hot boilerplate makes its bigrams dominate the
    # (w1,w2) occurrence->probability join — the skew-prone shape; the
    # prob side simultaneously COLLAPSES (few distinct bigrams), so
    # AQE's broadcast/skew handling should hold the ratio
    "text_bigram_ppl",
    # PMI: same pair-table shape as bigram ppl, but the hot boilerplate
    # also concentrates the marginals (c1/c2) on a handful of tokens —
    # the ctx/tgt joins see one giant key each
    "text_pmi_collocations",
    # span removal: the 30%-hot boilerplate IS one hot shingle set —
    # its covered-position join-back concentrates on few shingle keys
    "text_remove_dup_spans",
    # hamming-band pair family (round-6 verdict task #1): the 30%-hot
    # boilerplate collapses to ONE signature, putting ~150k docs in a
    # single band bucket — star overflow must hold it to m-1 edges
    # instead of C(150k,2) pairs. simhash's 4-bit bands make even the
    # UNIFORM corpus all-star (31k docs/bucket at 500k docs); dhash's
    # 16-bit bands keep uniform buckets tiny, so the pair shows both
    # regimes
    "dedup_simhash_hamming_star",
    "mm_dhash_neardup",
]

# Queries whose shuffle/window keys are EVENT keys (user_id) — the set
# the --skew-events mode times on a uniform vs whale-user corpus
# (round-6 verdict task #7). All four sort a per-user window partition;
# a whale user carrying 30% of events makes that ONE partition's sort a
# single-task hotspot, the shape this mode measures.
EVENT_SKEW_QUERY_SET = [
    # per-(user,type,day) groupBy (map-side combinable even on the
    # whale) feeding an event_type-partitioned rank window whose input
    # is the AGGREGATED day rows — skew should be absorbed by the agg
    "mad_daily_outliers",
    # windowed conditional-min CEP scan: one (user) sort partition
    "cep_match_sequence",
    # lead() pair extraction: one (user) sort partition per user
    "seq_transition_matrix",
    # two leads + triple groupBy: the 3-gram sibling
    "seq_top_paths",
    # r8: attribution family — user-keyed window ops with the same
    # hot-partition exposure the CEP sweep caught a quadratic in;
    # last/first ride a running struct-max (O(n) per partition),
    # multi/position ride the horizon-bounded RANGE collect whose
    # per-row state is O(in-horizon touches) by construction
    "attr_last_touch",
    "attr_first_touch",
    "attr_multi_touch",
    "attr_position_touch",
    # r8: as-of directions — same user-keyed one-window-sort shape;
    # forward is the DESC-sorted running frame (the O(n^2) FOLLOWING
    # trap this sweep exists to catch), nearest pays both passes
    "q_asof_forward_enrich",
    "q_asof_nearest_enrich",
]


# ---------------------------------------------------------------------------
# Production-path variants (r9, judge task #1): the xxhash64 signature
# families, expect_unique_native, and the two-pass PMI candidate — the
# plans a 100 TB deployment would actually run, where the graded md5
# pipelines exist only for DuckDB-oracle parity. Each entry maps to its
# graded twin so the --production mode can print like-for-like rows.


def _prod_dedup_exact(spark, sf_dir):
    from selium_spark.operators import dedup

    return dedup.dedup_exact(
        load_table(spark, sf_dir, "documents"), hash_fn="xxhash64"
    )


def _prod_lsh_candidates(spark, sf_dir):
    from selium_spark.operators import dedup
    from selium_spark.suite import LSH_MAX_BAND

    return dedup.lsh_candidate_pairs(
        load_table(spark, sf_dir, "documents"), k=8, bands=4, shingle_n=3,
        max_band_size=LSH_MAX_BAND, hash_fn="xxhash64",
    )


def _prod_simhash_star(spark, sf_dir):
    from selium_spark.operators import dedup
    from selium_spark.suite import HAMMING_STAR_CAP

    return dedup.simhash_hamming_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=3,
        n_bands=4, n_bits=48, hash_fn="xxhash64",
        max_band_size=HAMMING_STAR_CAP, overflow="star",
    )


def _prod_dq_native(spark, sf_dir):
    from selium_spark.operators import expectations as X

    li = load_table(spark, sf_dir, "lineitem")
    rules = [
        X.expect_not_null("l_orderkey"),
        X.expect_between("l_quantity", 1.0, 50.0),
        X.expect_between("l_discount", 0.0, 0.1),
        X.expect_between("l_tax", 0.0, 0.05, max_frac=0.2),
        X.expect_values_in("l_returnflag", ["A", "N", "R"]),
        X.expect_unique_native("l_orderkey", "l_linenumber", max_dup_frac=0.06),
    ]
    return X.validate_expectations(li, rules)


def _prod_dq_xxhash64(spark, sf_dir):
    from selium_spark.operators import expectations as X

    li = load_table(spark, sf_dir, "lineitem")
    rules = [
        X.expect_not_null("l_orderkey"),
        X.expect_between("l_quantity", 1.0, 50.0),
        X.expect_between("l_discount", 0.0, 0.1),
        X.expect_between("l_tax", 0.0, 0.05, max_frac=0.2),
        X.expect_values_in("l_returnflag", ["A", "N", "R"]),
        X.expect_unique_approx(
            "l_orderkey", "l_linenumber", max_dup_frac=0.2, hash_fn="xxhash64"
        ),
    ]
    return X.validate_expectations(li, rules)


def _pmi_two_pass(spark, sf_dir):
    """Judge task #4 candidate: prune the bigram-occurrence table with
    a frequency threshold BEFORE the pair groupBy. Output-identical to
    text.pmi_collocations: marginals (c1/c2) equal the occurrence
    counts by w1/w2 (cheaper vocab-keyed aggregates), and a pair with
    c12 >= min_count needs BOTH words' marginals >= min_count, so the
    pre-filter never drops a surviving pair."""
    from selium_spark.operators.text import tokens

    df = load_table(spark, sf_dir, "documents")
    min_count, k, round_to = 5, 100, 9
    toks = tokens("text")
    pairs_col = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda a, b: F.when(
                b.isNotNull(), F.struct(a.alias("w1"), b.alias("w2"))
            ),
        ),
        lambda s: s.isNotNull(),
    )
    occ = df.select(F.explode(pairs_col).alias("p")).select("p.w1", "p.w2")
    occ = occ.persist()
    ctx = occ.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    tgt = occ.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    total = ctx.agg(F.sum("c1").alias("n_big"))
    f1 = ctx.where(F.col("c1") >= min_count).select("w1", "c1")
    f2 = tgt.where(F.col("c2") >= min_count).select("w2", "c2")
    pairs = (
        occ.join(F.broadcast(f1), "w1")
        .join(F.broadcast(f2), "w2")
        .groupBy("w1", "w2", "c1", "c2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= min_count)
    )
    pmi = F.round(
        F.log(
            (F.col("c12") / F.col("n_big"))
            / ((F.col("c1") / F.col("n_big")) * (F.col("c2") / F.col("n_big")))
        ),
        round_to,
    )
    out = (
        pairs.crossJoin(F.broadcast(total))
        .select("w1", "w2", "c12", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(k)
    )
    out.write.format("noop").mode("overwrite").save()
    occ.unpersist()
    return None  # already materialized (needs the unpersist)


# name -> (graded twin in QUERIES or None, callable)
PROD_QUERIES = {
    "dedup_exact_docs_xxhash64": ("dedup_exact_docs", _prod_dedup_exact),
    "dedup_lsh_candidates_xxhash64": ("dedup_lsh_candidates", _prod_lsh_candidates),
    "dedup_simhash_star_xxhash64": ("dedup_simhash_hamming_star", _prod_simhash_star),
    "dq_expectations_native": ("dq_expectations", _prod_dq_native),
    "dq_expectations_xxhash64": ("dq_expectations", _prod_dq_xxhash64),
    "text_pmi_two_pass": ("text_pmi_collocations", _pmi_two_pass),
}

# the doc-keyed subset the --skew --production mode times on the
# uniform vs skewed corpora (dq is lineitem-keyed, pmi's skew exposure
# is already covered by the graded twin in SKEW_QUERY_SET)
PROD_SKEW_QUERIES = [
    "dedup_exact_docs_xxhash64",
    "dedup_lsh_candidates_xxhash64",
    "dedup_simhash_star_xxhash64",
]


def time_prod_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    out = {}
    for name in names:
        _, fn = PROD_QUERIES[name]
        t0 = time.time()
        res = fn(spark, sf_dir)
        if res is not None:
            res.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    return out


def production_main(n: int, skew_mode: bool) -> None:
    """--production [N]: time the production-path configs at base vs Nx
    next to their graded md5 twins (judge task #1 — the 100 TB claims
    should rest on measured production plans, not only the oracle
    plans). With --skew: uniform vs skewed doc corpora instead."""
    spark = get_spark(app_name="prod_stress", cpus=32, shuffle_partitions=64)
    if skew_mode:
        n_docs = n * 50_000
        uni_dir = f"/root/repo/tmp/docs_uniform_{n_docs}"
        skew_dir = f"/root/repo/tmp/docs_skewed_{n_docs}"
        for d, frac in ((uni_dir, 0.0), (skew_dir, 0.3)):
            if not os.path.exists(f"{d}/documents.parquet"):
                print(f"building {n_docs}-doc corpus (hot_frac={frac}) at {d} ...",
                      file=sys.stderr)
                build_doc_corpus(spark, n_docs, d, frac)
        uniform = time_prod_queries(spark, uni_dir, PROD_SKEW_QUERIES)
        skewed = time_prod_queries(spark, skew_dir, PROD_SKEW_QUERIES)
        report = {
            name: {
                "uniform_s": uniform[name],
                "skewed_s": skewed[name],
                "ratio": round(skewed[name] / max(uniform[name], 0.01), 2),
            }
            for name in PROD_SKEW_QUERIES
        }
        print(json.dumps({"n_docs": n_docs, "mode": "production_skew",
                          "hot_frac": 0.3, "queries": report}, indent=2))
        return
    out_dir = f"/root/repo/tmp/scaled_x{n}"
    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        print(f"building {n}x dataset at {out_dir} ...", file=sys.stderr)
        build_scaled(spark, n, out_dir)
    names = list(PROD_QUERIES)
    twins = sorted({t for t, _ in PROD_QUERIES.values() if t})
    base = time_prod_queries(spark, BASE_SF, names)
    scaled = time_prod_queries(spark, out_dir, names)
    twin_base = time_queries(spark, BASE_SF, twins)
    twin_scaled = time_queries(spark, out_dir, twins)
    report = {}
    for name in names:
        twin, _ = PROD_QUERIES[name]
        row = {
            "base_s": base[name],
            f"x{n}_s": scaled[name],
            "ratio": round(scaled[name] / max(base[name], 0.01), 1),
        }
        if twin:
            row["twin"] = twin
            row["twin_base_s"] = twin_base[twin]
            row[f"twin_x{n}_s"] = twin_scaled[twin]
            row["twin_ratio"] = round(
                twin_scaled[twin] / max(twin_base[twin], 0.01), 1
            )
        report[name] = row
    print(json.dumps({"n_copies": n, "mode": "production", "queries": report},
                     indent=2))


def build_event_corpus(spark, n_rows: int, out_dir: str, hot_frac: float) -> None:
    """Synthetic events table (schema-identical to the testdata one)
    where user-key skew is the ONLY variable: hot_frac == 0 spreads
    rows ~50/user over n_rows/50 users; hot_frac > 0 reroutes that
    fraction of rows to ONE whale user (user_id 0). Timestamps spread
    deterministically over 90 days and the type vocabulary includes
    the CEP trio (signup/purchase/error) so every query in
    EVENT_SKEW_QUERY_SET does real work on both corpora."""
    os.makedirs(out_dir, exist_ok=True)
    hot = (F.abs(F.xxhash64(F.col("id"), F.lit("hot"))) % 100) < int(hot_frac * 100)
    h = F.abs(F.xxhash64(F.col("id"), F.lit("mix")))
    types = ["signup", "click", "view", "purchase", "error"]
    type_col = F.element_at(
        F.array(*[F.lit(t) for t in types]), (h % 5 + 1).cast("int")
    )
    ev = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_interval(secs=(h % (90 * 86400)).cast("double"))
        ).alias("ts"),
        F.when(hot, F.lit(0)).otherwise(F.col("id") % (n_rows // 50)).alias("user_id"),
        type_col.alias("event_type"),
        ((h % 100000) / 100.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


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


# -- streaming stateful stress (round-5 verdict task #1) -----------------

#: time slices the scaled events corpus is written in — sequential
#: append jobs give strictly increasing file mtimes, so the file stream
#: replays micro-batches in event-time order (the live-deployment
#: arrival shape the folds assume; same device as test_streaming's
#: two-batch replays).
STREAM_SLICES = 12
STREAM_FILES_PER_SLICE = 4


def build_stream_scaled(spark, n_copies: int, out_dir: str) -> None:
    """Nx events corpus for STREAMING stress: key-remapped copies at a
    CONSTANT time span (no ts shift — see module docstring), written as
    STREAM_SLICES sequential time slices so replay order == event-time
    order."""
    os.makedirs(out_dir, exist_ok=True)
    ev = load_table(spark, BASE_SF, "events")
    maxes = {c: ev.agg(F.max(c)).first()[0] + 1 for c in ("event_id", "user_id")}
    copies = spark.range(n_copies).withColumnRenamed("id", "_copy")
    out = ev.repartition(64).crossJoin(F.broadcast(copies))
    for c in ("event_id", "user_id"):
        out = out.withColumn(c, F.col(c) + F.col("_copy") * F.lit(maxes[c]))
    # write LTZ timestamps (session tz is UTC, instant-preserving) so
    # the replayed schema needs no nanos/NTZ special-casing
    out = out.drop("_copy").withColumn("ts", F.col("ts").cast("timestamp"))
    ep = F.unix_timestamp(F.col("ts").cast("timestamp"))
    t0, t1 = ev.agg(F.min(ep), F.max(ep)).first()
    span = t1 - t0 + 1
    bucket = F.floor((ep - F.lit(t0)) / F.lit(span / STREAM_SLICES))
    dest = f"{out_dir}/events.parquet"
    for i in range(STREAM_SLICES):
        (
            out.where(bucket == i)
            .repartition(STREAM_FILES_PER_SLICE)
            .write.mode("append")
            .parquet(dest)
        )


def _stream_ops():
    """The stateful streaming operators under stress, as
    (output_mode, transform) factories over a normalized event stream."""
    from selium_spark.operators import stateful, windows

    steps = ["signup", "click", "purchase"]
    return {
        "streaming_scd2": (
            "update",
            # graded config (r7): bucketed state layout
            lambda ev: stateful.streaming_scd2(
                ev, "user_id", "event_type", "ts", "event_id",
                state_buckets=256,
            ),
        ),
        "streaming_gapfill_wm": (
            "update",
            # graded config (r7): bucketed layout + timer emulation
            lambda ev: stateful.streaming_gapfill_locf(
                ev.withWatermark("ts", "0 seconds"),
                "user_id",
                "ts",
                "value",
                "event_id",
                grain="day",
                emit_to_watermark=True,
                state_buckets=256,
            ),
        ),
        "streaming_funnel_sla": (
            "update",
            # graded config (r7): bucketed layout + timer emulation
            lambda ev: stateful.streaming_funnel(
                ev.withWatermark("ts", "0 seconds"),
                "user_id",
                "event_type",
                "ts",
                steps,
                abandon_after="7 days",
                state_buckets=256,
            ),
        ),
        "dedup_within_watermark": (
            "append",
            lambda ev: stateful.dedup_within_watermark(
                ev, ["event_id"], "ts", "60 days"
            ).select("event_id", "event_type"),
        ),
        # round 6 late: the exact-int64 CUSUM twin and the IEEE-chain
        # EWMA twin -- both O(scalars) state per key
        "streaming_cusum": (
            "update",
            # graded config (r7): bucketed state layout
            lambda ev: stateful.streaming_cusum(
                ev, "user_id", "ts", "value",
                target=120.0, slack=5.0, threshold=200.0,
                state_buckets=256,
            ),
        ),
        "streaming_ewma": (
            "update",
            # graded config (r7): bucketed state layout
            lambda ev: stateful.streaming_ewma_level(
                ev, "user_id", "ts", "value", alpha=0.25, state_buckets=256
            ),
        ),
        # round 6 late 2: the two-sided stream-stream join state —
        # clicks buffered until the 1h interval closes under the
        # watermark; state is O(unexpired clicks), the join-state bound
        # a 100 TB deployment lives on
        "streaming_interval_join": (
            "append",
            lambda ev: (lambda e: (
                e.where(F.col("event_type") == "click")
                .select(
                    F.col("user_id").alias("c_user"),
                    F.col("event_id").alias("click_id"),
                    F.col("ts").alias("c_ts"),
                )
                .join(
                    e.where(F.col("event_type") == "purchase").select(
                        F.col("user_id").alias("p_user"),
                        F.col("event_id").alias("purchase_id"),
                        F.col("ts").alias("p_ts"),
                    ),
                    (F.col("c_user") == F.col("p_user"))
                    & (F.col("p_ts") >= F.col("c_ts"))
                    & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
                )
                .select("c_user", "click_id", "purchase_id")
            ))(ev.withWatermark("ts", "0 seconds")),
        ),
        # Spark's NATIVE session_window state merge — a JVM-side
        # (non-applyInPandasWithState) state path that pins the state
        # store's own merge/commit cost
        "streaming_session": (
            "append",
            lambda ev: windows.session(
                ev.withWatermark("ts", "0 seconds"),
                "ts",
                "30 minutes",
                keys=["user_id"],
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user_id", F.col("window.start").alias("session_start"), "n"
            ),
        ),
    }


def stream_replay_metrics(
    spark,
    src: str,
    schema,
    transform,
    output_mode: str,
    state_store: str | None,
    shuffle_partitions: int = 32,
    max_files: int = STREAM_FILES_PER_SLICE,
    timeout_s: float = 1800.0,
) -> dict:
    """Replay ``src`` through ``transform`` in maxFilesPerTrigger
    micro-batches to a noop sink, returning throughput + state-store
    metrics from the query's progress events."""
    from selium_spark.streaming.state import state_store_provider

    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", str(max_files))
        .load(src)
    )
    out = transform(stream)
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    ctx = (
        state_store_provider(spark, state_store)
        if state_store
        else contextlib.nullcontext()
    )
    try:
        with tempfile.TemporaryDirectory(prefix="stress_ckpt_") as ckpt, ctx:
            t0 = time.time()
            q = (
                out.writeStream.outputMode(output_mode)
                .format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(timeout_s)
            if q.isActive:
                q.stop()
            wall = time.time() - t0
            progs = [
                p if isinstance(p, dict) else json.loads(p.json)
                for p in q.recentProgress
            ]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    rows = sum(p.get("numInputRows", 0) for p in progs)
    out_rows = sum((p.get("sink") or {}).get("numOutputRows", 0) for p in progs)
    batches = [p for p in progs if p.get("numInputRows", 0) > 0]
    last_state: list[dict] = []
    for p in progs:
        if p.get("stateOperators"):
            last_state = p["stateOperators"]
    commits = [
        sum(o.get("commitTimeMs", 0) for o in (p.get("stateOperators") or []))
        for p in batches
    ]
    trig = sorted(
        (p.get("durationMs") or {}).get("triggerExecution", 0) for p in batches
    )

    def pct(q: float) -> int:
        return trig[min(int(q * len(trig)), len(trig) - 1)] if trig else 0

    return {
        "rows": rows,
        "out_rows": out_rows,
        "wall_s": round(wall, 2),
        "rows_per_s": round(rows / max(wall, 0.01)),
        "n_batches": len(batches),
        "trigger_p50_ms": pct(0.5),
        "trigger_p99_ms": pct(0.99),
        "state_rows": sum(o.get("numRowsTotal", 0) for o in last_state),
        "state_mb": round(
            sum(o.get("memoryUsedBytes", 0) for o in last_state) / 2**20, 1
        ),
        "avg_commit_ms": round(sum(commits) / max(len(commits), 1)),
    }


def build_banded(spark, n_docs: int, hot_frac: float, out_dir: str) -> str:
    """Banded-keys stream corpus for the LSH hot-band stress: buckets
    of ~4 docs (realistic dup-cluster size), except ``hot_frac`` of
    docs which all share ONE band key (the 30%-hot boilerplate shape).
    Hot docs are spread across every slice, so the swarm arrives
    continuously like a crawl would deliver it."""
    os.makedirs(out_dir, exist_ok=True)
    dest = f"{out_dir}/banded.parquet"
    hot = (F.col("id") % 100) < int(hot_frac * 100)
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band_id"),
        F.when(hot, F.lit("hotband"))
        .otherwise(F.concat(F.lit("u"), (F.col("id") / 4).cast("long").cast("string")))
        .alias("band_key"),
    )
    step = n_docs // 10
    for i in range(10):
        (
            df.where(
                (F.col("doc_id") >= i * step)
                & (F.col("doc_id") < ((i + 1) * step if i < 9 else n_docs))
            )
            .repartition(2)
            .write.mode("append")
            .parquet(dest)
        )
    return dest


def lsh_main(n_docs: int = 100_000) -> None:
    """Round-5 verdict task #5: streaming_lsh_pairs under a hot band.
    Replays a uniform corpus vs a 30%-hot corpus (one band key holding
    30k docs — far past the state cap) through the default pairs mode
    and the star overflow mode, 10 micro-batches each."""
    from selium_spark.operators import stateful

    spark = get_spark(app_name="lsh_stress", cpus=32, shuffle_partitions=32)
    uni = build_banded(spark, n_docs, 0.0, f"/root/repo/tmp/lsh_uni_{n_docs}") \
        if not os.path.exists(f"/root/repo/tmp/lsh_uni_{n_docs}/banded.parquet") \
        else f"/root/repo/tmp/lsh_uni_{n_docs}/banded.parquet"
    hot = build_banded(spark, n_docs, 0.3, f"/root/repo/tmp/lsh_hot_{n_docs}") \
        if not os.path.exists(f"/root/repo/tmp/lsh_hot_{n_docs}/banded.parquet") \
        else f"/root/repo/tmp/lsh_hot_{n_docs}/banded.parquet"
    schema = spark.read.parquet(uni).schema
    report = {}
    runs = [
        ("uniform_pairs", uni, {}),
        ("hot_pairs", hot, {}),
        ("hot_star", hot, {"overflow": "star"}),
    ]
    for name, src, kw in runs:
        m = stream_replay_metrics(
            spark,
            src,
            schema,
            lambda s, kw=kw: stateful.streaming_lsh_pairs(s, **kw),
            "append",
            "rocksdb",
            max_files=2,
        )
        report[name] = m
        print(f"  {name}: {m}", file=sys.stderr)
    report["hot_pairs"]["ratio_vs_uniform"] = round(
        report["hot_pairs"]["wall_s"] / max(report["uniform_pairs"]["wall_s"], 0.01), 2
    )
    report["hot_star"]["ratio_vs_uniform"] = round(
        report["hot_star"]["wall_s"] / max(report["uniform_pairs"]["wall_s"], 0.01), 2
    )
    print(json.dumps({"mode": "lsh_hot_band", "n_docs": n_docs, "runs": report}, indent=2))


def latency_main(n: int = 10) -> None:
    """Per-trigger latency distribution for the four stateful ops:
    the Nx corpus replayed ONE file per trigger (48 triggers over the
    12 slices x 4 files layout — a sustained-backlog micro-batch
    cadence), RocksDB state; reports p50/p99 triggerExecution per op.
    Complements --streaming's throughput table with the latency view a
    live deployment cares about."""
    spark = get_spark(app_name="stream_latency", cpus=32, shuffle_partitions=32)
    from selium_spark.sources.tables import ensure_nanos_as_long
    from selium_spark.suite import _norm_stream_ts

    ensure_nanos_as_long(spark)
    src_dir = f"/root/repo/tmp/stream_x{n}"
    dest = f"{src_dir}/events.parquet"
    if not os.path.exists(dest):
        print(f"building {n}x streaming corpus at {src_dir} ...", file=sys.stderr)
        build_stream_scaled(spark, n, src_dir)
    schema = spark.read.parquet(dest).schema
    report = {}
    for op_name, (mode, factory) in _stream_ops().items():
        m = stream_replay_metrics(
            spark,
            dest,
            schema,
            lambda s, f=factory: f(_norm_stream_ts(s, schema)),
            mode,
            "rocksdb",
            max_files=1,
        )
        report[op_name] = m
        print(f"  {op_name} x{n} 1-file-triggers: {m}", file=sys.stderr)
    print(
        json.dumps(
            {"mode": "streaming_latency", "scale": n, "queries": report}, indent=2
        )
    )


def fold_buckets_main(n: int = 10) -> None:
    """Round-6 verdict task #5: does the streaming_lsh_pairs
    state-bucket trick (hash many keys into one applyInPandasWithState
    group, fold per key inside the pandas groupby) pay off for the
    PER-KEY folds too?  A/B on the representative gapfill fold over the
    Nx corpus (~15k distinct users/trigger at N=10), one file per
    trigger (the sustained-backlog cadence where per-group overhead
    shows), RocksDB state."""
    spark = get_spark(app_name="fold_buckets", cpus=32, shuffle_partitions=32)
    from selium_spark.operators import stateful
    from selium_spark.sources.tables import ensure_nanos_as_long
    from selium_spark.suite import _norm_stream_ts

    ensure_nanos_as_long(spark)
    src_dir = f"/root/repo/tmp/stream_x{n}"
    dest = f"{src_dir}/events.parquet"
    if not os.path.exists(dest):
        print(f"building {n}x streaming corpus at {src_dir} ...", file=sys.stderr)
        build_stream_scaled(spark, n, src_dir)
    schema = spark.read.parquet(dest).schema
    report = {}
    for sb in (None, 64, 256, 1024):
        m = stream_replay_metrics(
            spark,
            dest,
            schema,
            lambda s, sb=sb: stateful.streaming_gapfill_locf(
                _norm_stream_ts(s, schema),
                "user_id",
                "ts",
                "value",
                "event_id",
                grain="day",
                state_buckets=sb,
            ),
            "update",
            "rocksdb",
            max_files=1,
        )
        key = "per_key" if sb is None else f"buckets_{sb}"
        report[key] = m
        print(f"  gapfill {key}: {m}", file=sys.stderr)
    base = report["per_key"]["wall_s"]
    for key, m in report.items():
        m["ratio_vs_per_key"] = round(m["wall_s"] / max(base, 0.01), 2)
    print(json.dumps({"mode": "fold_buckets", "scale": n, "queries": report},
                     indent=2))


def streaming_main(scales: list[int]) -> None:
    spark = get_spark(app_name="stream_stress", cpus=32, shuffle_partitions=32)
    from selium_spark.sources.tables import ensure_nanos_as_long
    from selium_spark.suite import _norm_stream_ts

    ensure_nanos_as_long(spark)
    report: dict = {}
    for n in scales:
        src_dir = f"/root/repo/tmp/stream_x{n}"
        dest = f"{src_dir}/events.parquet"
        if not os.path.exists(dest):
            print(f"building {n}x streaming corpus at {src_dir} ...", file=sys.stderr)
            build_stream_scaled(spark, n, src_dir)
        schema = spark.read.parquet(dest).schema
        for op_name, (mode, factory) in _stream_ops().items():
            for provider in ("rocksdb", "hdfs"):
                m = stream_replay_metrics(
                    spark,
                    dest,
                    schema,
                    lambda s, f=factory: f(_norm_stream_ts(s, schema)),
                    mode,
                    provider,
                )
                report.setdefault(op_name, {})[f"x{n}_{provider}"] = m
                print(f"  {op_name} x{n} {provider}: {m}", file=sys.stderr)
    print(json.dumps({"mode": "streaming", "scales": scales, "queries": report}, indent=2))


WARM = "--warm" in sys.argv
ABAB = "--abab" in sys.argv
#: --trim: clearCache between reps so persist-device queries pay their
#: TRUE per-execution cost instead of amortizing the dominant build
#: across reps (Spark's cache manager dedupes by logical plan, so rep
#: 2+ of e.g. text_remove_dup_spans silently reuses rep 1's positional
#: table — the same flattering artifact bench.py's session trim fixed
#: in r10). Without --trim the historical amortized protocol applies;
#: both answer real questions (steady-state re-run vs cold execution).
TRIM = "--trim" in sys.argv


def _maybe_trim(spark) -> None:
    if TRIM:
        import gc

        spark.catalog.clearCache()
        gc.collect()


def time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    """Single-shot by default (the historical protocol); ``--warm``
    runs each query twice and records the min — the r9 lesson is that
    a query's FIRST run at a new SF pays JIT/codegen and page-cache
    faults that can dominate (ts_cusum_alarms read 63 s single-shot,
    3.3 s warm on the identical corpus), so scaling RATIOS from
    single-shot readings conflate plan cost with warmup."""
    out = {}
    for name in names:
        best = None
        for _ in range(2 if WARM else 1):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            _maybe_trim(spark)
        out[name] = round(best, 2)
    return out


def time_queries_abab(
    spark, dirs: list[str], names: list[str], reps: int = 3
) -> list[dict[str, float]]:
    """Interleaved ABAB timing (r10, judge task #2): for each query,
    alternate the two corpora A,B,A,B,... in ONE session and take each
    side's min over the post-warmup reps. Box-state drift (co-tenant
    steal, session aging) hits BOTH sides of every comparison within
    the same minutes, so the published RATIOS survive a noisy box —
    the protocol that dissolved three phantom 100x ratios and the r9
    cross-commit bench scare. Rep 1 of each side is its warmup
    (discarded); ``reps`` counts the measured pairs."""
    outs: list[dict[str, float]] = [{} for _ in dirs]
    for name in names:
        samples: list[list[float]] = [[] for _ in dirs]
        for rep in range(reps + 1):
            for i, d in enumerate(dirs):
                t0 = time.time()
                QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
                samples[i].append(time.time() - t0)
                _maybe_trim(spark)
        for i in range(len(dirs)):
            outs[i][name] = round(min(samples[i][1:]), 2)
        print(f"  abab {name}: " + " vs ".join(
            f"{outs[i][name]}s" for i in range(len(dirs))), file=sys.stderr)
    return outs


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--streaming" in sys.argv:
        scales = [int(a) for a in args] or [1, 10, 30]
        streaming_main(scales)
        return
    if "--lsh" in sys.argv:
        lsh_main(int(args[0]) if args else 100_000)
        return
    if "--ann" in sys.argv:
        ann_main(int(args[0]) if args else 100, skew="--skew" in sys.argv)
        return
    if "--fold-buckets" in sys.argv:
        fold_buckets_main(int(args[0]) if args else 10)
        return
    if "--streaming-latency" in sys.argv:
        latency_main(int(args[0]) if args else 10)
        return
    if "--skew-events" in sys.argv:
        n = int(args[0]) if args else 10
        n_rows = n * 50_000
        spark = get_spark(app_name="event_skew", cpus=32, shuffle_partitions=64)
        uni_dir = f"/root/repo/tmp/events_uniform_{n_rows}"
        skew_dir = f"/root/repo/tmp/events_whale_{n_rows}"
        for d, frac in ((uni_dir, 0.0), (skew_dir, 0.3)):
            if not os.path.exists(f"{d}/events.parquet"):
                print(f"building {n_rows}-event corpus (hot_frac={frac}) at {d} ...",
                      file=sys.stderr)
                build_event_corpus(spark, n_rows, d, frac)
        if ABAB:
            uniform, skewed = time_queries_abab(
                spark, [uni_dir, skew_dir], EVENT_SKEW_QUERY_SET)
        else:
            uniform = time_queries(spark, uni_dir, EVENT_SKEW_QUERY_SET)
            skewed = time_queries(spark, skew_dir, EVENT_SKEW_QUERY_SET)
        report = {
            name: {
                "uniform_s": uniform[name],
                "skewed_s": skewed[name],
                "ratio": round(skewed[name] / max(uniform[name], 0.01), 2),
            }
            for name in EVENT_SKEW_QUERY_SET
        }
        print(json.dumps({"n_rows": n_rows, "mode": "skew_events",
                          "hot_frac": 0.3, "queries": report}, indent=2))
        return
    if "--production" in sys.argv:
        production_main(int(args[0]) if args else 10, "--skew" in sys.argv)
        return
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
        if ABAB:
            uniform, skewed = time_queries_abab(
                spark, [uni_dir, skew_dir], SKEW_QUERY_SET)
        else:
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
    # extra positional args select a QUERY_SET subset (r8: lets the
    # 100x refresh run the expensive ops in bounded slices). Unknown
    # names are an ERROR (r9, ADVICE): a typo'd subset silently fell
    # back to the full expensive sweep.
    unknown = sorted(set(args[1:]) - set(QUERIES))
    if unknown:
        raise SystemExit(
            f"unknown query name(s): {', '.join(unknown)}; "
            f"known: {', '.join(sorted(QUERIES))}"
        )
    subset = list(args[1:]) or QUERY_SET
    if ABAB:
        base, scaled = time_queries_abab(spark, [BASE_SF, out_dir], subset)
    else:
        base = time_queries(spark, BASE_SF, subset)
        scaled = time_queries(spark, out_dir, subset)
    report = {
        name: {
            "base_s": base[name],
            f"x{n}_s": scaled[name],
            "ratio": round(scaled[name] / max(base[name], 0.01), 1),
        }
        for name in subset
    }
    print(json.dumps({"n_copies": n, "queries": report}, indent=2))


if __name__ == "__main__":
    main()
