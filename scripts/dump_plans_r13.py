"""Dump .explain('formatted') before/after plans for the round-13
touched queries (deliverable: plans/r13/*.txt).

- text_dsir_select: the two-scan target mode (r12 shape) vs the
  adopted shared-scan target_filter mode.

(dedup_lsh_recall's one-pass variants were measured-rejected and the
code reverted — evidence is the recorded ABAB numbers in
OPTIMIZATION_r13.md §5, no plan claim to back.)

Streaming changes (attr twins' pinned state partitions) and the index
writers' auto-salt counting job are not single-DataFrame plans; their
evidence is measurements + progress listener data in
OPTIMIZATION_r13.md.

Cache hygiene: cleared BEFORE each construction (r12 defect #3 fix).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selium_spark import get_spark  # noqa: E402
from selium_spark.sources.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.01"
OUT = "/root/repo/plans/r13"


def dump(spark, make_df, fname: str) -> None:
    spark.catalog.clearCache()
    df = make_df()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, fname), "w") as f:
        f.write(buf.getvalue())
    print("wrote", fname, len(buf.getvalue()), "bytes")


def main() -> None:
    from pyspark.sql import functions as F

    from selium_spark.operators import text

    spark = get_spark(app_name="dump_plans_r13", cpus=8, shuffle_partitions=8)
    docs = load_table(spark, SF, "documents")

    def dsir_before():
        return text.dsir_resample(docs, docs.where(F.col("lang") == "en"), k=50)

    def dsir_after():
        return text.dsir_resample(
            docs, None, k=50, target_filter=F.col("lang") == "en"
        )

    dump(spark, dsir_before, "text_dsir_select_before.txt")
    dump(spark, dsir_after, "text_dsir_select_after.txt")

    # session 2: remove_dup_spans twopass (r12 shape) vs fold (r13)
    def spans_before():
        return text.remove_dup_spans(docs, n=5, min_docs=2, build="twopass")

    def spans_after():
        return text.remove_dup_spans(docs, n=5, min_docs=2, build="fold")

    dump(spark, spans_before, "text_remove_dup_spans_before.txt")
    dump(spark, spans_after, "text_remove_dup_spans_after.txt")

    # session 2: q2 pair-distinct semi-join prefilter. The "before" is
    # the r12 shape reconstructed inline (the suite now ships "after").
    from selium_spark.suite import QUERIES

    def q2_before():
        part = load_table(spark, SF, "part").where(
            F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
        )
        ps = (
            load_table(spark, SF, "lineitem")
            .select("l_partkey", "l_suppkey")
            .distinct()
        )
        sup = (
            load_table(spark, SF, "supplier")
            .join(
                F.broadcast(load_table(spark, SF, "nation")),
                F.col("s_nationkey") == F.col("n_nationkey"),
            )
            .join(
                F.broadcast(load_table(spark, SF, "region")),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .where(F.col("r_name") == "EUROPE")
        )
        cand = (
            F.broadcast(part)
            .join(ps, F.col("p_partkey") == F.col("l_partkey"))
            .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
            .select(
                "p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name"
            )
        )
        min_bal = cand.groupBy(F.col("p_partkey").alias("mb_partkey")).agg(
            F.min("s_acctbal").alias("min_bal")
        )
        return (
            cand.join(
                min_bal,
                (F.col("p_partkey") == F.col("mb_partkey"))
                & (F.col("s_acctbal") == F.col("min_bal")),
            )
            .select(
                "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "s_suppkey"
            )
            .orderBy(
                F.col("s_acctbal").desc(),
                F.col("p_partkey").asc(),
                F.col("s_suppkey").asc(),
            )
            .limit(100)
        )

    dump(spark, q2_before, "q2_min_cost_supplier_before.txt")
    dump(
        spark,
        lambda: QUERIES["q2_min_cost_supplier"](spark, SF),
        "q2_min_cost_supplier_after.txt",
    )

    # session 2: ivf_assign per-row argmax (S2.3) — the "before" is the
    # r12 K-fanout join + row_number window, monkeypatched in
    from pyspark.sql import Window

    from selium_spark.operators import similarity
    from selium_spark.operators.similarity import cosine

    new_assign = similarity.ivf_assign

    def old_assign(
        emb,
        centroids,
        id_col="vec_id",
        vec_col="embedding",
        cid_col="centroid_id",
        cvec_col="centroid_vec",
    ):
        scored = emb.join(F.broadcast(centroids)).withColumn(
            "c_score", F.round(cosine(F.col(vec_col), F.col(cvec_col)), 6)
        )
        w = Window.partitionBy(id_col).orderBy(
            F.col("c_score").desc(), F.col(cid_col).asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                F.col(id_col),
                F.col(vec_col),
                F.col(cid_col).alias("cluster_id"),
                F.col("c_score"),
            )
        )

    def ivf_with(impl):
        def make():
            similarity.ivf_assign = impl
            try:
                return QUERIES["ann_ivf_topk"](spark, SF)
            finally:
                similarity.ivf_assign = new_assign

        return make

    dump(spark, ivf_with(old_assign), "ann_ivf_topk_before.txt")
    dump(spark, ivf_with(new_assign), "ann_ivf_topk_after.txt")

    # session 2: text_bpe_tokenize distinct-word counting device (S2.5)
    from selium_spark.operators import text as text_ops

    def bpe_before():
        merges = text_ops.bpe_train_merges(docs, num_merges=6)
        rules = [(r["lft"], r["rgt"]) for r in merges.collect()]
        toks = text_ops.bpe_apply("text", rules)
        return docs.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_bpe"),
            text_ops.token_count("text").cast("long").alias("n_ws"),
        )

    dump(spark, bpe_before, "text_bpe_tokenize_before.txt")
    dump(
        spark,
        lambda: QUERIES["text_bpe_tokenize"](spark, SF),
        "text_bpe_tokenize_after.txt",
    )


if __name__ == "__main__":
    main()
