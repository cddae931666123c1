"""Plan inspection: the ".explain and iterate" loop as a library.

The engine's scale guarantees are plan-shape guarantees (filters reach
the scan, dims broadcast, narrow ops don't shuffle). ``summarize``
parses the formatted physical plan into a comparable structure so tests
and tooling can assert those properties instead of eyeballing explain
output (used by tests/test_plans.py).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    text: str
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_hash_aggregates: int = 0
    has_cartesian: bool = False
    has_take_ordered: bool = False
    codegen_stages: int = 0

    def scan_columns(self) -> set[str]:
        cols: set[str] = set()
        for rs in self.read_schemas:
            cols.update(re.findall(r"(\w+):", rs))
        return cols


def summarize(df: DataFrame) -> PlanSummary:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    s = PlanSummary(text=text)
    for line in text.splitlines():
        stripped = line.strip()
        if "PushedFilters:" in stripped:
            s.pushed_filters.append(stripped.split("PushedFilters:", 1)[1].strip())
        if "ReadSchema:" in stripped:
            s.read_schemas.append(stripped.split("ReadSchema:", 1)[1].strip())
    # formatted explain prints every node twice (tree line + details
    # header "(n) Op"); count the details headers so each physical node
    # counts ONCE (tree lines carry modifiers — "BroadcastHashJoin
    # Inner BuildRight (5)" — that make name-anchored matching fragile).
    # "(n) Exchange" never matches BroadcastExchange's own header.
    s.n_exchanges = len(re.findall(r"(?m)^\(\d+\) Exchange\b", text))
    s.n_broadcast_joins = len(re.findall(r"(?m)^\(\d+\) BroadcastHashJoin\b", text))
    s.n_sortmerge_joins = len(re.findall(r"(?m)^\(\d+\) SortMergeJoin\b", text))
    s.n_hash_aggregates = len(re.findall(r"(?m)^\(\d+\) HashAggregate\b", text))
    s.has_cartesian = "CartesianProduct" in text or "BroadcastNestedLoopJoin" in text
    s.has_take_ordered = "TakeOrderedAndProject" in text
    s.codegen_stages = len(set(re.findall(r"codegen id : (\d+)", text)))
    return s
