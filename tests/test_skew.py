"""Skew-hardening: the operators that group/join on corpus-driven keys
(domains, LSH band buckets, content hashes) must neither change their
output nor blow up when one key holds ~30% of all rows — the realistic
shape of a web corpus (one mega-domain, wall-to-wall boilerplate).

Covers round-2 VERDICT item 2: salted top-k == plain top-k on skewed
data, LSH hot-band cap semantics, star-edge connectivity equivalence,
and the pair-count boundedness that makes the capped plan 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from selium_spark.operators import dedup, relational, urls


def _skewed_docs(spark, n=4000, hot_frac=0.3):
    """n synthetic docs; hot_frac of them share ONE domain and ONE
    boilerplate text (hot exact-hash + hot LSH band), the rest unique."""
    hot_n = int(n * hot_frac)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < hot_n, F.lit("https://www.MEGA.example.com/p"))
        .otherwise(F.concat(F.lit("https://site"), F.col("id"), F.lit(".org/p")))
        .alias("url"),
        F.when(
            F.col("id") < hot_n,
            F.lit("the same boilerplate cookie banner text appears on every page"),
        )
        .otherwise(
            F.concat_ws(
                " ",
                *[F.md5(F.concat(F.col("id").cast("string"), F.lit(f"#w{i}")))
                  for i in range(6)],
            )
        )
        .alias("text"),
    )


def test_salted_top_k_matches_plain_on_skew(spark):
    df = _skewed_docs(spark, n=4000).withColumn(
        "domain", urls.url_domain(urls.url_normalize("url"))
    )
    order = [F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()]
    plain = relational.top_k_per_group(df, ["domain"], order, 25, rank_col="rn")
    for buckets in (2, 7, 32):
        salted = relational.salted_top_k_per_group(
            df, ["domain"], order, 25, salt_col=F.col("doc_id"),
            salt_buckets=buckets, rank_col="rn",
        )
        assert sorted(salted.select("doc_id", "domain", "rn").collect()) == sorted(
            plain.select("doc_id", "domain", "rn").collect()
        )


def test_domain_cap_skew_mega_domain(spark):
    df = _skewed_docs(spark, n=4000, hot_frac=0.3)
    capped = urls.domain_cap(df, "url", "doc_id", cap=40)
    per_dom = {r["domain"]: r["n"] for r in
               capped.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    # mega-domain cut to exactly the cap, long tail untouched
    assert per_dom["example.com"] == 40
    assert all(v == 1 for d, v in per_dom.items() if d != "example.com")
    # deterministic across salt_buckets settings (same survivor set)
    again = urls.domain_cap(df, "url", "doc_id", cap=40, salt_buckets=4)
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_lsh_hot_band_cap_bounds_pairs(spark):
    df = _skewed_docs(spark, n=600, hot_frac=0.3)  # 180 identical docs
    capped = dedup.lsh_candidate_pairs(df, k=8, bands=4, shingle_n=3,
                                       max_band_size=64)
    uncapped = dedup.lsh_candidate_pairs(df, k=8, bands=4, shingle_n=3)
    n_capped, n_uncapped = capped.count(), uncapped.count()
    # the 180-doc boilerplate bucket alone is 180*179/2 = 16110 pairs;
    # the cap removes that quadratic term entirely
    assert n_uncapped >= 16110
    assert n_capped < 200
    # capped output is a subset of the uncapped pairs (cap only drops)
    assert capped.exceptAll(uncapped).count() == 0


def test_star_edges_same_components_as_pairs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup.lsh_candidate_pairs(docs, k=8, bands=4, shingle_n=3)
    stars = dedup.lsh_band_star_edges(docs, k=8, bands=4, shingle_n=3)
    cc_pairs = sorted(map(tuple, dedup.connected_components(pairs).collect()))
    cc_stars = sorted(map(tuple, dedup.connected_components(stars).collect()))
    assert cc_pairs == cc_stars


def test_star_edges_linear_in_hot_bucket(spark):
    df = _skewed_docs(spark, n=600, hot_frac=0.3)  # 180-doc hot bucket
    stars = dedup.lsh_band_star_edges(df, k=8, bands=4, shingle_n=3)
    # hot bucket contributes m-1 = 179 edges, not m(m-1)/2
    assert stars.count() < 600
    # and still connects the whole boilerplate clique into one group
    cc = dedup.connected_components(stars)
    hot_group = cc.where(F.col("id") < 180).select("group_id").distinct()
    assert hot_group.count() == 1
