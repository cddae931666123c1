"""Driver contract for the selium_spark engine.

``entry`` runs the flagship query (the reference's log-analyser alert
pipeline, SURVEY.md §3.3) on sf0.001. ``queries``/``oracle_sql`` expose
the full suite from ``selium_spark.suite`` — one entry per implemented
operator from SURVEY.md §2 plus the north-star extensions, each with a
DuckDB-verifiable ANSI-SQL oracle (streaming-only ops are rows-only
where noted in the suite).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from selium_spark.suite import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: windowed count-by-category + threshold alerts over the
    events stream table (selium's log-analyser, SURVEY §3.3). Daily
    windows so thresholds trigger at sf0.001's event density."""
    from pyspark.sql import functions as F

    from selium_spark.operators import windows
    from selium_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    alerts = windows.window_threshold_alerts(
        ev,
        "ts",
        "1 day",
        conds={
            "errors": F.col("event_type") == "error",
            "signups": F.col("event_type") == "signup",
        },
        alert_when=(F.col("errors") > 5) | (F.col("signups") > 6),
    )
    return alerts.select(
        F.col("window.start").alias("window_start"), "errors", "signups"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
