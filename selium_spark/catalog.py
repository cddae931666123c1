"""Stream catalog: URI -> (path, schema, schema-hash, delivery mode).

Re-expresses selium's two naming layers in one Spark-native object:

- **Atlas** (URI -> endpoint registry with glob lookup; reference:
  ``examples/data-pipeline/src/lib.rs:22-24`` insert,
  ``examples/waf/src/lib.rs:91-99`` exact get,
  ``examples/log-analyser/src/lib.rs:48`` pattern lookup).
- **SchemaDescriptor** (16-byte content hash as schema identity;
  reference: ``system/userland/macros/src/schema.rs:48-50``,
  ``system/userland/src/encoding.rs:56-62``). We hash the canonical
  schema JSON with blake2b-128 and enforce strict equality on
  subscribe/publish, surfacing mismatch as an analysis-time error.

Delivery mode mirrors the channel backpressure policy fixed at creation
(``subsystem/messaging/src/lib.rs:36-41``): ``park`` == lossless
(checkpointed streaming reads), ``drop`` == lossy telemetry
(latest-offsets, no checkpoint; loss is *reported*, never silent).

Scale note: the catalog is driver-side metadata only (dict -> path);
at 100 TB it would be backed by a metastore, but no data flows through
it — reads stay declarative `spark.read(Stream).parquet(path)` so
Catalyst retains pushdown/pruning.
"""

from __future__ import annotations

import fnmatch
import hashlib
import json
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SchemaMismatchError(ValueError):
    """Strict schema-hash inequality at subscribe/publish time.

    Mirrors selium's schema identity check: a new hash is a new schema
    (``AGENTS.md`` policy; ``encoding.rs:56-62``).
    """


def schema_hash(schema: T.StructType) -> str:
    """16-byte content hash of a canonical schema JSON (blake2b-128).

    Same role as the reference's 16-byte BLAKE3 .fbs content hash
    (``system/userland/macros/src/schema.rs:48-50``).
    """
    canonical = json.dumps(schema.jsonValue(), sort_keys=True, separators=(",", ":"))
    return hashlib.blake2b(canonical.encode(), digest_size=16).hexdigest()


@dataclass
class StreamEntry:
    uri: str
    path: str
    schema: T.StructType
    mode: str = "park"  # "park" (lossless) | "drop" (lossy)
    fmt: str = "parquet"
    hash: str = field(init=False)

    def __post_init__(self) -> None:
        if self.mode not in ("park", "drop"):
            raise ValueError(f"mode must be 'park' or 'drop', got {self.mode!r}")
        self.hash = schema_hash(self.schema)


class StreamCatalog:
    """URI registry with glob lookup — the engine's Atlas."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._entries: dict[str, StreamEntry] = {}

    # -- Atlas surface ----------------------------------------------------
    def insert(
        self,
        uri: str,
        path: str,
        schema: T.StructType | str | None = None,
        mode: str = "park",
        fmt: str = "parquet",
    ) -> StreamEntry:
        """Register an endpoint (atlas.insert). Schema may be a
        StructType, DDL string, or None (inferred from parquet footer)."""
        if schema is None:
            schema = self.spark.read.format(fmt).load(path).schema
        elif isinstance(schema, str):
            parsed = T._parse_datatype_string(schema)
            assert isinstance(parsed, T.StructType)
            schema = parsed
        entry = StreamEntry(uri=uri, path=path, schema=schema, mode=mode, fmt=fmt)
        self._entries[uri] = entry
        return entry

    def get(self, uri: str) -> StreamEntry:
        """Exact lookup (atlas.get); KeyError if absent."""
        return self._entries[uri]

    def lookup(self, pattern: str) -> list[StreamEntry]:
        """Glob lookup (atlas.lookup) -> all matching endpoints."""
        return [e for u, e in sorted(self._entries.items()) if fnmatch.fnmatch(u, pattern)]

    def __contains__(self, uri: str) -> bool:
        return uri in self._entries

    def uris(self) -> Iterator[str]:
        return iter(sorted(self._entries))

    # -- schema gatekeeping ----------------------------------------------
    def check(self, uri: str, expected_hash: str) -> StreamEntry:
        entry = self.get(uri)
        if entry.hash != expected_hash:
            raise SchemaMismatchError(
                f"schema hash mismatch for {uri}: catalog={entry.hash} caller={expected_hash}"
            )
        return entry

    # -- batch / streaming readers ---------------------------------------
    def read(self, uri: str, expected_hash: str | None = None) -> DataFrame:
        """Batch read (the oracle-comparable twin of subscribe)."""
        entry = self.check(uri, expected_hash) if expected_hash else self.get(uri)
        return self.spark.read.schema(entry.schema).format(entry.fmt).load(entry.path)

    def read_stream(
        self,
        uri: str,
        expected_hash: str | None = None,
        max_files_per_trigger: int | None = None,
    ) -> DataFrame:
        """Streaming subscribe (S2 strong / S3 weak by entry mode).

        ``park`` -> lossless, checkpointed by the caller's query;
        ``maxFilesPerTrigger`` is the Park backpressure analogue.
        ``drop`` -> caller should run with `latest` semantics and no
        checkpoint; loss is surfaced by the engine's metrics listener.
        """
        entry = self.check(uri, expected_hash) if expected_hash else self.get(uri)
        reader = self.spark.readStream.schema(entry.schema).format(entry.fmt)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return reader.load(entry.path)

    def subscribe_pattern(self, pattern: str) -> DataFrame:
        """Merge of every endpoint matching a glob (W6 union; reference
        ``examples/log-analyser/src/lib.rs:48-54``)."""
        from functools import reduce

        entries = self.lookup(pattern)
        if not entries:
            raise KeyError(f"no catalog entries match {pattern!r}")
        hashes = {e.hash for e in entries}
        if len(hashes) > 1:
            raise SchemaMismatchError(
                f"pattern {pattern!r} matches multiple schemas: {sorted(hashes)}"
            )
        dfs = [self.read_stream(e.uri) for e in entries]
        return reduce(DataFrame.unionByName, dfs)

    # -- convenience: register the driver testdata tables ----------------
    TESTDATA_TABLES = (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split()

    def register_testdata(self, sf_dir: str, prefix: str = "sel://testdata") -> None:
        for name in self.TESTDATA_TABLES:
            self.insert(f"{prefix}/{name}", f"{sf_dir}/{name}.parquet")
