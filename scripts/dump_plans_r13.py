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


if __name__ == "__main__":
    main()
