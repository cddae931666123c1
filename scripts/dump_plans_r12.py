"""Dump .explain('formatted') before/after plans for every query the
round-12 optimization work touched (deliverable: plans/r12/*.txt).

"Before" variants reconstruct the r11 shape via the kept legacy flags
(prob='join', build='pinned'); text_budget_head's before (regex char
classes) has no flag, so its before file is dumped from a detached
worktree of the r11 verdict commit by passing --legacy-quality (run
from that worktree, writes into the main repo's plans/r12).

Constructions that are not a single DataFrame plan (streaming folds,
iterative trainers with driver loops) are documented in
OPTIMIZATION_r12.md instead; for the ANN index reads the 'before' is
the on-the-fly twin's plan (the r11 serving path).

r13 hygiene fix (r12 verdict defect #3): the SQL cache is cleared
BEFORE each plan is constructed — an earlier dump's persist()
otherwise substitutes its InMemoryRelation into later plans (the
cache manager matches subtrees across queries), which is how the r12
text_remove_dup_spans_after dump came out showing the pinned relation
the rewrite had removed. Each dump takes a CONSTRUCTOR thunk so a
build that persists at construction time (build="pinned") still shows
its own pin, never a predecessor's.
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
OUT = "/root/repo/plans/r12"


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
    legacy_quality = "--legacy-quality" in sys.argv
    spark = get_spark(app_name="dump_plans_r12", cpus=8, shuffle_partitions=8)
    from selium_spark.operators import text  # noqa: E402
    from selium_spark.suite import QUERIES  # noqa: E402

    docs = load_table(spark, SF, "documents")

    if legacy_quality:
        # run from the r11-verdict worktree: dump the regex-based
        # quality_features plan as text_budget_head_before
        dump(spark, lambda: QUERIES["text_budget_head"](spark, SF), "text_budget_head_before.txt")
        dump(spark, lambda: QUERIES["text_quality"](spark, SF), "text_quality_before.txt")
        return

    # text_bigram_ppl: r11 join-derivation vs r12 window marginals
    dump(
        spark,
        lambda: text.bigram_interp_logppl(docs, lam=0.7, prob="join"),
        "text_bigram_ppl_before.txt",
    )
    dump(spark, lambda: QUERIES["text_bigram_ppl"](spark, SF), "text_bigram_ppl_after.txt")

    # text_remove_dup_spans: r11 pinned positional build vs r12 twopass
    dump(
        spark,
        lambda: text.remove_dup_spans(docs, n=5, min_docs=2, build="pinned"),
        "text_remove_dup_spans_before.txt",
    )
    dump(
        spark,
        lambda: QUERIES["text_remove_dup_spans"](spark, SF),
        "text_remove_dup_spans_after.txt",
    )

    # quality translate rewrite: after plans (before comes from the
    # r11 worktree via --legacy-quality)
    dump(spark, lambda: QUERIES["text_budget_head"](spark, SF), "text_budget_head_after.txt")
    dump(spark, lambda: QUERIES["text_quality"](spark, SF), "text_quality_after.txt")

    # materialized ANN index reads (new graded queries): before = the
    # on-the-fly r11 serving path, after = the partition-pruned read
    dump(spark, lambda: QUERIES["ann_ivf_topk"](spark, SF), "ann_ivf_index_topk_before.txt")
    dump(spark, lambda: QUERIES["ann_ivf_index_topk"](spark, SF), "ann_ivf_index_topk_after.txt")
    dump(spark, lambda: QUERIES["ann_ivfpq_topk"](spark, SF), "ann_ivfpq_index_topk_before.txt")
    dump(
        spark,
        lambda: QUERIES["ann_ivfpq_index_topk"](spark, SF),
        "ann_ivfpq_index_topk_after.txt",
    )

    # BPE family (new): the apply path's zero-exchange plan
    dump(spark, lambda: QUERIES["text_bpe_tokenize"](spark, SF), "text_bpe_tokenize_after.txt")


if __name__ == "__main__":
    main()
