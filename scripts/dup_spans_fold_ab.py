"""A/B the r13 remove_dup_spans build='fold' against the r12 twopass
shape: exact-parity check at two SFs, then interleaved ABAB warm
timings at sf0.1 (noop sink, clearCache between reps).

Usage: python scripts/dup_spans_fold_ab.py [reps] [docs_dir]

``docs_dir`` (default /root/testdata/sf0.1) points the timed ABAB at a
different corpus — e.g. /root/repo/tmp/scaled_x100 for the 100x
scale-evidence run (parity always checks the graded SFs).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selium_spark import get_spark  # noqa: E402
from selium_spark.operators import text  # noqa: E402
from selium_spark.sources.tables import load_table  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
DOCS_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark(app_name="dup_spans_fold_ab", cpus=32, shuffle_partitions=32)

    # --- parity at sf0.001 + sf0.01: byte-identical rows ---
    sfs = () if os.environ.get("SKIP_PARITY") else ("sf0.001", "sf0.01")
    for sf in sfs:
        docs = load_table(spark, f"/root/testdata/{sf}", "documents")
        a = {
            r.doc_id: (r.n_tokens, r.n_kept, r.clean_text)
            for r in text.remove_dup_spans(docs, n=5, min_docs=2).collect()
        }
        b = {
            r.doc_id: (r.n_tokens, r.n_kept, r.clean_text)
            for r in text.remove_dup_spans(
                docs, n=5, min_docs=2, build="fold"
            ).collect()
        }
        assert a == b, f"{sf}: {len(a)} vs {len(b)} rows, parity FAILED"
        print(f"parity {sf}: OK ({len(a)} docs)")

    # --- ABAB at DOCS_DIR ---
    docs = load_table(spark, DOCS_DIR, "documents")

    def run(build: str) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        out = text.remove_dup_spans(docs, n=5, min_docs=2, build=build)
        out.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("twopass")  # warm both shapes once
    run("fold")
    ta, tb = [], []
    for _ in range(REPS):
        ta.append(run("twopass"))
        tb.append(run("fold"))
    print("twopass:", [round(x, 3) for x in ta], "min", round(min(ta), 3))
    print("fold:   ", [round(x, 3) for x in tb], "min", round(min(tb), 3))


if __name__ == "__main__":
    main()
