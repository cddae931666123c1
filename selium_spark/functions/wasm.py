"""WASM UDF host (SURVEY §2.6, §7.2 step 9 — the driver's stated
approach: "Structured Streaming with WebAssembly UDFs").

Selium's entire compute model is sandboxed guest programs over typed
streams (``#[entrypoint]``, invoked at subsystem/wasmtime/src/
lib.rs:444-453; capability deny-stubs at :295-312). The Spark-native
rendering: a WASM module executed *inside a vectorized pandas_udf* —
Arrow batches in, Arrow batches out, one instantiation per executor
task — so the sandboxing story (no ambient authority inside the UDF;
the module can only see the batch it is handed) carries over, and the
module artifact distributes like any Spark file (S13: the module
store, subsystem/filesystem-store/src/driver.rs:17-21, maps to
``spark.sparkContext.addFile``).

Execution tiers, best available first:

1. Vectorized numpy kernel (wasm_interp.compile_vectorized): the
   body is symbolically executed into whole-batch array ops (uint64
   wrap arithmetic == wasm i64 semantics); structured control flow —
   block/loop/if + br/br_if, the shape LLVM emits for scalar -O2
   functions — runs SIMT-style under a lane mask; read-only memory
   loads gather from the static data-segment image (or, for (ptr,len)
   byte-stream guests, PER LANE from a row-memory byte matrix — see
   :func:`wasm_bytes_udf`); direct ``call`` runs the callee under the
   caller's mask; ``call_indirect`` dispatches each distinct
   selector's callee under a sub-mask. EVERY checked-in export runs
   on this tier.
2. ``wasmtime`` (if a wheel is importable): the real engine runs the
   module bytes per row — used for bodies the vectorizer declines
   (out-of-profile opcodes), and cross-checked against tier 1 in
   tests when present.
3. The pure-Python scalar interpreter (wasm_interp.ScalarWasmFunction):
   same bytes, no external deps — the reference semantics all tiers
   are tested against.
4. ``fallback``: a plain Python callable standing in for the export
   (kept for tests that pin the Spark-side plumbing independently of
   the module format).
"""

from __future__ import annotations

from typing import Callable, Iterator, Tuple

import pandas as pd
from pyspark.sql import functions as F

from selium_spark.functions.wasm_interp import ScalarWasmFunction, WasmTrap

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
    arity: int | None = None,
):
    """Build a vectorized UDF hosting a scalar WASM export.

    module_bytes: the .wasm binary (distributed to executors inside the
    closure — for large modules, ship via addFile and load lazily).
    func_name: exported function name, scalar numeric signature.
    fallback: Python stand-in used only when module_bytes is None.
    arity: argument count; inferred from the module when present.
    """
    if return_type not in _SUPPORTED:
        raise ValueError(f"unsupported return type {return_type!r}")

    if module_bytes is not None:
        # Parse on the driver: fails fast on a bad module / export name,
        # and pins the arity for the UDF shape below.
        parsed = ScalarWasmFunction.from_module(module_bytes, func_name)
        arity = parsed.arity
        try:
            from selium_spark.functions.wasm_interp import (
                compile_vectorized,
                parse_module,
            )

            # parsed.image carries the module's static memory (data
            # segments): LUT-reading bodies vectorize as numpy gathers
            vec = compile_vectorized(
                parse_module(module_bytes)[func_name], image=parsed.image
            )
        except (NotImplementedError, WasmTrap, ZeroDivisionError):
            # NotImplementedError: body outside the vectorizable profile.
            # WasmTrap / ZeroDivisionError: the eager 1-element zero
            # probe tripped a data-dependent trap (e.g. a gather address
            # derived from input 0 lands OOB, or the body divides by an
            # input that is zero in the probe) — the module may run real
            # data fine, so fall back to the scalar tiers instead of
            # failing UDF construction.
            vec = None
        if vec is not None:
            if arity == 1:
                @F.pandas_udf(return_type)
                def vudf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
                    for s in batches:
                        yield pd.Series(vec(s.to_numpy()))
            else:
                @F.pandas_udf(return_type)
                def vudf(
                    batches: Iterator[Tuple[pd.Series, ...]]
                ) -> Iterator[pd.Series]:
                    for cols in batches:
                        yield pd.Series(vec(*[c.to_numpy() for c in cols]))
            return vudf
        if _HAS_WASMTIME:
            def make_fn():
                engine = wasmtime.Engine()
                store = wasmtime.Store(engine)
                module = wasmtime.Module(engine, module_bytes)
                # no imports: no ambient authority inside the guest
                instance = wasmtime.Instance(store, module, [])
                func = instance.exports(store)[func_name]
                return lambda *xs: func(store, *xs)
        else:
            def make_fn():
                return ScalarWasmFunction.from_module(module_bytes, func_name)
    elif fallback is not None:
        arity = arity or 1

        def make_fn():
            return fallback
    else:
        raise NotImplementedError(
            "no module bytes given; pass module_bytes (runs on wasmtime or "
            "the built-in scalar interpreter) or fallback="
        )

    if arity == 1:
        @F.pandas_udf(return_type)
        def udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            fn = make_fn()  # one instantiation per task, reused across batches
            for s in batches:
                yield s.map(fn)
    else:
        @F.pandas_udf(return_type)
        def udf(batches: Iterator[Tuple[pd.Series, ...]]) -> Iterator[pd.Series]:
            fn = make_fn()
            for cols in batches:
                yield pd.Series(
                    [fn(*vals) for vals in zip(*cols)], dtype="object"
                )

    return udf


#: footprint ceiling for one row-memory byte matrix (n_rows x padded
#: width uint8). Batches whose matrix would exceed it are processed in
#: length-sorted slices, so one long record cannot inflate every row's
#: padded width or the worker's resident memory.
_BYTES_MAT_CAP = 1 << 28  # 256 MiB


def wasm_bytes_udf(
    module_bytes: bytes,
    func_name: str,
    return_type: str = "long",
):
    """Vectorized UDF hosting a BYTE-PROCESSING wasm export over linear
    memory — the reference's actual compute shape: guests scan record
    bytes the host hands them (system/userland/src/io.rs:288 chunked
    stream reads; 16 MiB preallocated guest memory at
    subsystem/wasmtime/src/lib.rs:259-270).

    Calling convention: the export takes (ptr: i32, len: i32) and reads
    the record's utf-8 bytes from guest memory at offset 0.

    Execution tiers, best available first (round-5 verdict task #3):

    1. Vectorized row-memory kernel (``compile_vectorized(...,
       row_memory=True)``): the whole Arrow batch becomes an
       (n_rows, max_len) byte MATRIX — one guest page per lane — and
       the export's scan loop runs masked-lane over all rows at once,
       one byte-position per iteration (~195x over per-row
       interpretation on 10k docs). Batches are split into
       length-sorted slices capped at ``_BYTES_MAT_CAP`` so a single
       long record can't inflate the padded width of every row.
    2. Per-row interpretation (the pre-r6 path): the host writes each
       record's bytes into one interpreter instance's memory and
       invokes the export — kept for bodies outside the vectorizable
       profile; with a wasmtime wheel present those run on the real
       engine via :func:`wasm_pandas_udf` instead.
    """
    if return_type not in _SUPPORTED:
        raise ValueError(f"unsupported return type {return_type!r}")
    parsed = ScalarWasmFunction.from_module(module_bytes, func_name)
    if parsed.arity != 2:
        raise ValueError(f"{func_name} must take (ptr, len); arity={parsed.arity}")
    if parsed.memory is None:
        raise ValueError(f"{func_name}'s module declares no linear memory")

    try:
        from selium_spark.functions.wasm_interp import (
            compile_vectorized,
            parse_module,
        )

        vec = compile_vectorized(
            parse_module(module_bytes)[func_name],
            image=parsed.image,
            row_memory=True,
        )
    except (NotImplementedError, WasmTrap, ZeroDivisionError):
        vec = None

    dtype = "float64" if return_type == "double" else "int64"

    if vec is not None:
        import numpy as np

        def run_batch(s: pd.Series) -> pd.Series:
            enc = [("" if v is None else str(v)).encode("utf-8") for v in s]
            n = len(enc)
            if n == 0:
                return pd.Series([], dtype=dtype)
            lens = np.fromiter((len(b) for b in enc), np.int64, count=n)
            out = np.zeros(n, np.float64 if dtype == "float64" else np.int64)
            # length-sorted slices bound the matrix footprint AND keep
            # rows of similar length together (the masked loop runs
            # max_len iterations per slice, so mixing a 1 MiB record
            # into a slice of tweets would make every tweet ride along
            # for a million iterations)
            order = np.argsort(lens, kind="stable")
            start = 0
            while start < n:
                end = start + 1
                # widest row in a sorted slice is its last row
                while (
                    end < n
                    and (end - start + 1) * (int(lens[order[end]]) + 8)
                    <= _BYTES_MAT_CAP
                ):
                    end += 1
                ix = order[start:end]
                sl = lens[ix]
                w = int(sl.max())
                mat = np.zeros((len(ix), w + 8), np.uint8)
                if sl.sum():
                    flat = np.frombuffer(b"".join(enc[i] for i in ix), np.uint8)
                    rows = np.repeat(np.arange(len(ix)), sl)
                    cols = np.arange(len(flat)) - np.repeat(
                        np.cumsum(sl) - sl, sl
                    )
                    mat[rows, cols] = flat
                out[ix] = np.asarray(vec(mat, sl))
                start = end
            return pd.Series(out)

        @F.pandas_udf(return_type)
        def vudf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in batches:
                yield run_batch(s)

        return vudf

    @F.pandas_udf(return_type)
    def udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        fn = ScalarWasmFunction.from_module(module_bytes, func_name)
        for s in batches:
            out_vals = []
            for v in s:
                data = ("" if v is None else str(v)).encode("utf-8")
                fn.write_memory(0, data)
                out_vals.append(fn(0, len(data)))
            yield pd.Series(out_vals, dtype=dtype)

    return udf
