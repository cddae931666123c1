"""A/B the r13 ivf_assign rewrite (per-row array_max argmax, zero
corpus exchange) against the r1-r12 shape (broadcast K-fanout +
row_number window) across the ANN/k-means suite queries that call it.

The "before" is the r12 implementation reconstructed inline and
monkeypatched over similarity.ivf_assign for its reps; interleaved
ABAB in one session, clearCache between reps, noop sink.

Usage: python scripts/ivf_assign_ab.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from selium_spark import get_spark  # noqa: E402
from selium_spark.operators import similarity  # noqa: E402
from selium_spark.operators.similarity import cosine  # noqa: E402
from selium_spark.suite import QUERIES  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

PROBES = (
    os.environ["IVF_AB_PROBES"].split(",")
    if os.environ.get("IVF_AB_PROBES")
    else [
        "emb_kmeans_assign",
        "ann_ivf_topk",
        "ann_ivfpq_topk",
        "ann_ivfpq_recall",
        "ann_ivf_index_topk",
        "stream_ivfpq_encode",
    ]
)

new_assign = similarity.ivf_assign


def old_assign(
    emb,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "centroid_id",
    cvec_col: str = "centroid_vec",
):
    """The r1-r12 shape: K-fanout broadcast join + row_number window."""
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


def main() -> None:
    spark = get_spark(app_name="ivf_assign_ab", cpus=32, shuffle_partitions=32)

    def run(name: str, impl) -> float:
        similarity.ivf_assign = impl
        try:
            spark.catalog.clearCache()
            t0 = time.time()
            QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
            return time.time() - t0
        finally:
            similarity.ivf_assign = new_assign

    for name in PROBES:
        run(name, old_assign)  # warm both shapes once
        run(name, new_assign)
        ta, tb = [], []
        for _ in range(REPS):
            ta.append(run(name, old_assign))
            tb.append(run(name, new_assign))
        print(
            f"{name}: old {[round(x, 3) for x in ta]} min {min(ta):.3f}"
            f" | new {[round(x, 3) for x in tb]} min {min(tb):.3f}"
        )


if __name__ == "__main__":
    main()
