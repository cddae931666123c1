"""WASM UDF host (SURVEY §2.6, §7.2 step 9 — the driver's stated
approach: "Structured Streaming with WebAssembly UDFs").

Selium's entire compute model is sandboxed guest programs over typed
streams (``#[entrypoint]``, invoked at subsystem/wasmtime/src/
lib.rs:444-453; capability deny-stubs at :295-312). The Spark-native
rendering: a WASM module executed *inside a vectorized pandas_udf* —
Arrow batches in, Arrow batches out, one instantiation per executor —
so the sandboxing story (no ambient authority inside the UDF; the
module can only see the batch it is handed) carries over, and the
module artifact distributes like any Spark file (S13: the module
store, subsystem/filesystem-store/src/driver.rs:17-21, maps to
``spark.sparkContext.addFile``).

``wasmtime`` is not installed in this container, so the host is
import-gated: with wasmtime present, scalar i64->i64 / f64->f64
exports run for real; without it, construction raises a clear
NotImplementedError unless ``fallback`` (a plain Python callable
standing in for the wasm export, used by tests) is provided — the
Spark-side plumbing (batching, schema, distribution) is identical in
both paths and is what the tests pin down.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import functions as F

try:  # optional: real WASM engine
    import wasmtime  # type: ignore

    _HAS_WASMTIME = True
except Exception:
    _HAS_WASMTIME = False

_SUPPORTED = {"long", "bigint", "double", "int"}


def wasm_pandas_udf(
    module_bytes: bytes | None,
    func_name: str,
    return_type: str = "long",
    fallback: Callable | None = None,
):
    """Build a vectorized UDF hosting a scalar WASM export.

    module_bytes: the .wasm binary (distributed to executors inside the
    closure — for large modules, ship via addFile and load lazily).
    func_name: exported function name, scalar numeric signature.
    fallback: Python stand-in when wasmtime is unavailable.
    """
    if return_type not in _SUPPORTED:
        raise ValueError(f"unsupported return type {return_type!r}")
    if not _HAS_WASMTIME and fallback is None:
        raise NotImplementedError(
            "wasmtime is not installed in this environment; pass fallback= "
            "to run the same plumbing with a Python stand-in"
        )

    if _HAS_WASMTIME and module_bytes is not None:
        def make_fn():
            engine = wasmtime.Engine()
            store = wasmtime.Store(engine)
            module = wasmtime.Module(engine, module_bytes)
            instance = wasmtime.Instance(store, module, [])  # no imports: no ambient authority
            func = instance.exports(store)[func_name]
            return lambda x: func(store, x)
    else:
        def make_fn():
            return fallback

    @F.pandas_udf(return_type)
    def udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        fn = make_fn()  # one instantiation per task, reused across batches
        for s in batches:
            yield s.map(fn)

    return udf
