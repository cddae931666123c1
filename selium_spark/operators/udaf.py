"""Custom aggregates (UDAF surface, SURVEY §2.6).

The reference's guests can implement arbitrary aggregation logic; the
Spark-native rendering for "an aggregate the engine lacks" is
``groupBy().applyInPandas`` with a one-row-per-group output — Arrow
batches in, vectorized numpy inside, no row-at-a-time Python.

Scale note: applyInPandas shuffles whole groups to single tasks, so
it's for aggregates that genuinely need the group in memory (here:
a distribution over a low-cardinality category column). Anything
decomposable into partials belongs in built-in aggregates instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def grouped_entropy(
    df: DataFrame,
    key: str,
    cat_col: str,
    out_col: str = "entropy",
    round_to: int = 6,
) -> DataFrame:
    """Shannon entropy (bits) of the per-key category distribution.

    Terms are accumulated in sorted-category order so the double sum is
    deterministic and matches a SQL oracle summing the same ordered
    terms (differences live at 1e-16, far below the 1e-9 gate; rounding
    makes it airtight).
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = pdf[cat_col].value_counts().sort_index()
        p = counts.to_numpy(dtype=np.float64) / float(len(pdf))
        entropy = float(-(p * np.log2(p)).sum())
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], "n_events": [len(pdf)], out_col: [round(entropy, round_to)]}
        )

    return df.select(key, cat_col).groupBy(key).applyInPandas(
        fn, schema=f"{key} long, n_events long, {out_col} double"
    )
