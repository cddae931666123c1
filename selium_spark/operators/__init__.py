"""Operator inventory (SURVEY.md §2) + north-star extensions.

Modules:
- transforms: T1-T11 record-at-a-time ops
- windows: W1-W8 windowing/aggregation/routing
- relational: joins (incl. as-of, range), top-k, set ops, rollup/cube
- messaging: M1-M7 pub/sub, fanout, tap, request/reply
- stateful: W3 streaming latest-value enrich, bounded-state dedup
- dedup / similarity / text / multimodal: training-data pipeline ops
- packing / urls / sketches / udaf: packing+chunking+sharding, URL
  hygiene, mergeable sketches, custom aggregates
"""

from . import (  # noqa: F401
    dedup,
    messaging,
    multimodal,
    packing,
    relational,
    similarity,
    sketches,
    stateful,
    text,
    transforms,
    udaf,
    urls,
    windows,
)
