"""Data-quality expectations — the Deequ / Great Expectations device
(Schelter et al., "Automating Large-Scale Data Quality Verification",
VLDB 2018) re-expressed as ONE single-pass Spark aggregate.

A production ingest gate asserts invariants on every batch: null
fractions, value ranges, accepted categories, key uniqueness, minimum
volume. The standard implementations compute each check as its own
pass; here every row-predicate rule compiles into one conditional sum
and every uniqueness rule into one count-distinct inside a SINGLE
``agg`` — the corpus is scanned once regardless of rule count, the
aggregate is map-side combinable, and the result is a tiny
rules-per-row verdict table. At 100 TB this is the difference between
one scan and a scan per rule.

Reference parity: selium gates subscriptions on schema DESCRIPTOR
equality (SchemaDescriptor, subsystem/client/src/streams/mod.rs) —
a structural check. These expectations are the VALUE-level gate the
same pipelines need next; catalog.read's expected_hash covers the
structural half in this engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One rule: either a row-violation predicate (``viol``) with a
    max violating fraction, or a uniqueness check over ``unique_cols``
    with a max duplicate fraction."""

    name: str
    threshold: float
    viol: Column | None = None
    unique_cols: tuple[str, ...] | None = None


def expect_not_null(col: str, max_frac: float = 0.0) -> Expectation:
    return Expectation(f"not_null:{col}", max_frac, viol=F.col(col).isNull())


def expect_between(
    col: str, lo, hi, max_frac: float = 0.0
) -> Expectation:
    """NULL counts as a violation — a range rule is also a presence
    rule, matching Deequ's completeness-composed semantics."""
    viol = F.col(col).isNull() | ~F.col(col).between(F.lit(lo), F.lit(hi))
    return Expectation(f"between:{col}", max_frac, viol=viol)


def expect_values_in(col: str, values: list, max_frac: float = 0.0) -> Expectation:
    viol = F.col(col).isNull() | ~F.col(col).isin(values)
    return Expectation(f"values_in:{col}", max_frac, viol=viol)


def expect_matches(col: str, pattern: str, max_frac: float = 0.0) -> Expectation:
    viol = F.col(col).isNull() | ~F.col(col).rlike(pattern)
    return Expectation(f"matches:{col}", max_frac, viol=viol)


def expect_unique(*cols: str, max_dup_frac: float = 0.0) -> Expectation:
    return Expectation(
        "unique:" + ",".join(cols), max_dup_frac, unique_cols=tuple(cols)
    )


def validate_expectations(
    df: DataFrame, rules: list[Expectation], round_to: int = 9
) -> DataFrame:
    """Evaluate every rule in ONE aggregate pass over ``df``.

    Returns one row per rule: (rule, metric, threshold, ok) where
    ``metric`` is the violating fraction (row rules) or duplicate
    fraction (uniqueness rules), rounded so the verdict is
    cross-engine exact. An empty input passes every rule (0/0 -> 0.0,
    the vacuous-truth convention); gate volume separately with a
    min-rows check on the returned ``n_rows`` column.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        if r.viol is not None:
            # coalesce: SUM over zero rows is NULL, and an empty batch
            # must pass vacuously, not verdict NULL
            aggs.append(
                F.coalesce(F.sum(F.when(r.viol, 1).otherwise(0)), F.lit(0))
                .cast("long")
                .alias(f"_v{i}")
            )
        else:
            aggs.append(
                F.count_distinct(F.struct(*[F.col(c) for c in r.unique_cols]))
                .cast("long")
                .alias(f"_v{i}")
            )
    totals = df.agg(*aggs)
    n = F.col("_n")
    verdicts = []
    for i, r in enumerate(rules):
        if r.viol is not None:
            metric = F.round(F.col(f"_v{i}") / F.greatest(n, F.lit(1)), round_to)
        else:
            metric = F.round(
                (n - F.col(f"_v{i}")) / F.greatest(n, F.lit(1)), round_to
            )
        verdicts.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                metric.cast("double").alias("metric"),
                F.lit(float(r.threshold)).alias("threshold"),
                (metric <= F.lit(r.threshold)).alias("ok"),
            )
        )
    return totals.select(
        n.alias("n_rows"), F.explode(F.array(*verdicts)).alias("_e")
    ).select("n_rows", "_e.rule", "_e.metric", "_e.threshold", "_e.ok")
