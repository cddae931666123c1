"""Quantify dsir's shared-scan target mode at x100 (r13, verdict task
#8): the r12 rejection of cutting the second tokenize scan was
recorded without a number — measure it.

A = dsir_resample(docs, target=docs.where(lang=='en'), k=50)   (shipped)
B = dsir_resample(docs, None, k=50, target_filter=lang=='en')  (shared scan)

Interleaved ABAB in one session on a 100x replication of the sf0.1
documents table (built on first use into /root/repo/tmp/docs_x100).
Outputs are parity-asserted once at the start.

    python scripts/dsir_target_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selium_spark import get_spark  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
CORPUS = "/root/repo/tmp/docs_x100"
BASE = "/root/testdata/sf0.1"


def build(spark) -> None:
    from pyspark.sql import functions as F

    from selium_spark.sources.tables import load_table

    os.makedirs(CORPUS, exist_ok=True)
    docs = load_table(spark, BASE, "documents")
    mx = docs.agg(F.max("doc_id")).first()[0] + 1
    copies = spark.range(100).withColumnRenamed("id", "_copy")
    (
        docs.repartition(32)
        .crossJoin(F.broadcast(copies))
        .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * F.lit(mx))
        .drop("_copy")
        .write.mode("overwrite")
        .parquet(f"{CORPUS}/documents.parquet")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from selium_spark.operators import text
    from selium_spark.sources.tables import load_table

    spark = get_spark(app_name="dsir_ab", cpus=32, shuffle_partitions=64)
    if not os.path.exists(f"{CORPUS}/documents.parquet"):
        print("building docs_x100 ...", file=sys.stderr)
        build(spark)
    docs = load_table(spark, CORPUS, "documents")

    def a():
        return text.dsir_resample(docs, docs.where(F.col("lang") == "en"), k=50)

    def b():
        return text.dsir_resample(
            docs, None, k=50, target_filter=F.col("lang") == "en"
        )

    # parity once (the sf0.001/sf0.01 parity already ran; this is the
    # corpus under test)
    ra = sorted(tuple(r) for r in a().collect())
    spark.catalog.clearCache()
    rb = sorted(tuple(r) for r in b().collect())
    spark.catalog.clearCache()
    print("parity:", ra == rb, flush=True)
    assert ra == rb

    times = {"A_targetdf": [], "B_filter": []}
    for rep in range(REPS + 1):
        for key, fn in (("A_targetdf", a), ("B_filter", b)):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 2)
            spark.catalog.clearCache()
            if rep > 0:  # rep 0 = warm-up pair
                times[key].append(dt)
            print(f"rep{rep} {key}: {dt}s", flush=True)
    print({k: v for k, v in times.items()},
          {k + "_min": min(v) for k, v in times.items()})


if __name__ == "__main__":
    main()
