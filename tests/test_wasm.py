"""WASM guest-program stack: binary format, interpreter, Spark UDF.

Pins (a) the checked-in precompiled module bytes (golden sha256 — the
'wat->wasm bytes checked in' item from SURVEY §8), (b) the parser /
interpreter semantics including two's-complement wrap, and (c) the
end-to-end pandas_udf path on real DataFrames. When a wasmtime wheel
is present the same bytes also run on the real engine and must agree
with the interpreter.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from selium_spark.functions.wasm import _HAS_WASMTIME, wasm_pandas_udf
from selium_spark.functions.wasm_interp import (
    ScalarWasmFunction,
    parse_module,
)
from selium_spark.functions.wasm_modules import LCG_A, LCG_C, SCALAR_MODULE

GOLDEN_SHA256 = "edb290f65a95cc9e006186a8309db336e59e116d16892bfeac0254d8c5c5f796"


def _wrap64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= 1 << 63 else v


def test_module_bytes_are_pinned():
    assert SCALAR_MODULE[:8] == b"\x00asm\x01\x00\x00\x00"
    assert hashlib.sha256(SCALAR_MODULE).hexdigest() == GOLDEN_SHA256


def test_parse_module_exports_and_signatures():
    funcs = parse_module(SCALAR_MODULE)
    assert set(funcs) == {"add1", "lcg2", "disc_price", "clamp"}
    assert ScalarWasmFunction(funcs["add1"]).signature() == "add1(i64) -> (i64)"
    assert (
        ScalarWasmFunction(funcs["disc_price"]).signature()
        == "disc_price(f64, f64) -> (f64)"
    )


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_module(b"\x00asm")  # truncated
    with pytest.raises(ValueError):
        parse_module(b"notwasm!" + SCALAR_MODULE)


def test_interpreter_add1_wraps_two_complement():
    add1 = ScalarWasmFunction.from_module(SCALAR_MODULE, "add1")
    assert add1(41) == 42
    assert add1(-1) == 0
    assert add1(2**63 - 1) == -(2**63)  # i64.add wraps, never raises


def test_interpreter_lcg2_matches_python_reference():
    lcg2 = ScalarWasmFunction.from_module(SCALAR_MODULE, "lcg2")
    for x in (0, 1, 2, 12345, -7, 2**62, 2**63 - 1, -(2**63)):
        h1 = _wrap64(LCG_A * x + LCG_C)
        assert lcg2(x) == _wrap64(LCG_A * h1 + LCG_C)


def test_interpreter_f64_binary_op():
    dp = ScalarWasmFunction.from_module(SCALAR_MODULE, "disc_price")
    assert dp(100.0, 0.05) == 100.0 * (1 - 0.05)
    assert dp(0.0, 0.0) == 0.0


def test_interpreter_unknown_export_and_opcode():
    with pytest.raises(KeyError):
        ScalarWasmFunction.from_module(SCALAR_MODULE, "nope")
    # a body using an out-of-profile opcode (0x10 = call) fails loudly
    funcs = parse_module(SCALAR_MODULE)
    bad = funcs["add1"].__class__(
        name="bad", params=(0x7E,), results=(0x7E,),
        locals=(), body=b"\x10\x00\x0b",
    )
    with pytest.raises(NotImplementedError):
        ScalarWasmFunction(bad)(1)


def test_wasm_udf_runs_checked_in_module_on_spark(spark):
    add1 = wasm_pandas_udf(SCALAR_MODULE, "add1", "long")
    lcg2 = wasm_pandas_udf(SCALAR_MODULE, "lcg2", "long")
    df = spark.range(100).select(
        add1(F.col("id")).alias("plus1"), lcg2(F.col("id")).alias("h")
    )
    rows = df.collect()
    assert [r.plus1 for r in rows] == [i + 1 for i in range(100)]
    assert rows[3].h == _wrap64(LCG_A * _wrap64(LCG_A * 3 + LCG_C) + LCG_C)


def test_wasm_udf_two_arg_f64(spark):
    dp = wasm_pandas_udf(SCALAR_MODULE, "disc_price", "double")
    df = spark.createDataFrame(
        [(100.0, 0.05), (20.0, 0.0)], "price DOUBLE, disc DOUBLE"
    ).select(dp("price", "disc").alias("net"))
    assert sorted(r.net for r in df.collect()) == [20.0, 95.0]


@pytest.mark.skipif(not _HAS_WASMTIME, reason="wasmtime wheel not installed")
def test_wasmtime_agrees_with_interpreter():
    import wasmtime

    engine = wasmtime.Engine()
    store = wasmtime.Store(engine)
    module = wasmtime.Module(engine, SCALAR_MODULE)
    inst = wasmtime.Instance(store, module, [])
    real = inst.exports(store)["lcg2"]
    ours = ScalarWasmFunction.from_module(SCALAR_MODULE, "lcg2")
    for x in (0, 7, 2**62, -(2**63)):
        assert real(store, x) == ours(x)


def test_vectorized_kernel_matches_scalar_interpreter():
    import numpy as np

    from selium_spark.functions.wasm_interp import compile_vectorized

    funcs = parse_module(SCALAR_MODULE)
    xs = np.array(
        [0, 1, -1, 7, -7, 2**62, -(2**62), 2**63 - 1, -(2**63), 123456789],
        dtype=np.int64,
    )
    for name in ("add1", "lcg2"):
        vec = compile_vectorized(funcs[name])
        scalar = ScalarWasmFunction(funcs[name])
        got = vec(xs)
        assert got.dtype == np.int64
        assert [int(v) for v in got] == [scalar(int(x)) for x in xs]
    vec = compile_vectorized(funcs["disc_price"])
    price = np.array([100.0, 20.0, 0.0, 1e12], dtype=np.float64)
    disc = np.array([0.05, 0.0, 0.5, 0.25], dtype=np.float64)
    scalar = ScalarWasmFunction(funcs["disc_price"])
    assert [float(v) for v in vec(price, disc)] == [
        scalar(float(p), float(d)) for p, d in zip(price, disc)
    ]


def test_vectorized_kernel_rejects_out_of_profile_body():
    import pytest as _pytest

    from selium_spark.functions.wasm_interp import WasmFunc, compile_vectorized

    bad = WasmFunc(
        name="bad", params=(0x7E,), results=(0x7E,), locals=(),
        body=b"\x10\x00\x0b",  # call — not straight-line
    )
    with _pytest.raises(NotImplementedError):
        compile_vectorized(bad)


def test_clamp_guest_select_and_comparisons():
    """Pins the branchless select/i64-comparison opcodes in BOTH
    execution paths (scalar interpreter and vectorized kernel)."""
    import numpy as np

    from selium_spark.functions.wasm_interp import compile_vectorized

    funcs = parse_module(SCALAR_MODULE)
    scalar = ScalarWasmFunction(funcs["clamp"])
    vec = compile_vectorized(funcs["clamp"])
    cases = [
        (5, 1, 10), (0, 1, 10), (99, 1, 10), (-5, -3, 3), (7, 7, 7),
        (2**62, -10, 10), (-(2**62), -10, 10), (2**63 - 1, 0, 2**63 - 1),
    ]
    for x, lo, hi in cases:
        assert scalar(x, lo, hi) == min(max(x, lo), hi)
    out = vec(
        np.array([c[0] for c in cases], np.int64),
        np.array([c[1] for c in cases], np.int64),
        np.array([c[2] for c in cases], np.int64),
    )
    assert [int(v) for v in out] == [min(max(x, lo), hi) for x, lo, hi in cases]


def test_clamp_guest_on_spark(spark):
    clamp = wasm_pandas_udf(SCALAR_MODULE, "clamp", "long")
    df = spark.range(10).select(
        clamp(F.col("id"), F.lit(3), F.lit(6)).alias("c")
    )
    assert [r.c for r in df.collect()] == [3, 3, 3, 3, 4, 5, 6, 6, 6, 6]


# -- control-flow (loop) profile -----------------------------------------

LOOP_GOLDEN_SHA256 = "4341dae8d73e9aa3ebe1f3df2b66c7ab68d71843e05bdaeb68a4f30d7506d926"


def test_loop_module_bytes_are_pinned():
    from selium_spark.functions.wasm_modules import LOOP_MODULE

    assert LOOP_MODULE[:8] == b"\x00asm\x01\x00\x00\x00"
    assert hashlib.sha256(LOOP_MODULE).hexdigest() == LOOP_GOLDEN_SHA256


def test_interpreter_digit_sum_loop():
    from selium_spark.functions.wasm_modules import LOOP_MODULE

    f = ScalarWasmFunction.from_module(LOOP_MODULE, "digit_sum")
    for x in (0, 7, 10, 99, 123456789, -405, 10**15 - 1):
        assert f(x) == sum(int(c) for c in str(abs(x))), x


def test_interpreter_if_else_and_nested_branches():
    """Hand-built body exercising if/else and br out of nested blocks:
    f(x) = 1 if x > 10 else -1 (if/else), via locals."""
    from selium_spark.functions import wasm_modules as m

    body = (
        m.local_get(0) + m.i64_const(10) + bytes([m.I64_GT_S])
        + bytes([0x04, m.VOID])          # if
        + m.i64_const(1) + bytes([0x21]) + m._uleb(1)   # local.set 1
        + bytes([0x05])                   # else
        + m.i64_const(-1) + bytes([0x21]) + m._uleb(1)
        + bytes([m.END])
        + m.local_get(1)
        + bytes([m.END])
    )
    mod = m._assemble([("sign10", [m.I64], [m.I64], body, [m.I64])])
    f = ScalarWasmFunction.from_module(mod, "sign10")
    assert f(11) == 1 and f(10) == -1 and f(-5) == -1


def test_vectorized_compiler_runs_loops_masked():
    """The masked-lane (SIMT) vectorized tier executes structured
    loops: divergent per-lane trip counts (digit_sum of 1..16-digit
    numbers), div/rem inside the loop body, and a br out of nested
    blocks — all matching the scalar interpreter lane for lane."""
    import numpy as np

    from selium_spark.functions.wasm_interp import compile_vectorized
    from selium_spark.functions.wasm_modules import LOOP_MODULE

    vec = compile_vectorized(parse_module(LOOP_MODULE)["digit_sum"])
    ref = ScalarWasmFunction.from_module(LOOP_MODULE, "digit_sum")
    xs = np.array(
        [0, 7, 10, 99, 123456789, -405, 10**15 - 1, -(2**63), 2**63 - 1],
        dtype=np.int64,
    )
    assert [int(v) for v in vec(xs)] == [ref(int(x)) for x in xs]


def test_vectorized_loop_iteration_cap_traps():
    """A guest whose loop never converges traps (the runaway guard,
    analogous to wasmtime fuel) instead of hanging the executor."""
    from selium_spark.functions import wasm_modules as m
    from selium_spark.functions.wasm_interp import WasmTrap, compile_vectorized

    spin = (
        bytes([0x02, m.VOID, 0x03, m.VOID, 0x0C]) + m._uleb(0)
        + bytes([m.END, m.END]) + m.i64_const(0) + bytes([m.END])
    )
    mod = m._assemble([("spin", [m.I64], [m.I64], spin, [])])
    with pytest.raises(WasmTrap):
        compile_vectorized(parse_module(mod)["spin"])


def test_vectorized_if_else_masked():
    """if/else under the lane mask: lanes split between the arms and
    rejoin at end with the right per-lane values."""
    import numpy as np

    from selium_spark.functions import wasm_modules as m
    from selium_spark.functions.wasm_interp import compile_vectorized

    body = (
        m.local_get(0) + m.i64_const(10) + bytes([m.I64_GT_S])
        + bytes([0x04, m.VOID])
        + m.i64_const(1) + bytes([0x21]) + m._uleb(1)
        + bytes([0x05])
        + m.i64_const(-1) + bytes([0x21]) + m._uleb(1)
        + bytes([m.END])
        + m.local_get(1)
        + bytes([m.END])
    )
    mod = m._assemble([("sign10", [m.I64], [m.I64], body, [m.I64])])
    vec = compile_vectorized(parse_module(mod)["sign10"])
    xs = np.array([11, 10, -5, 2**62, -(2**63)], dtype=np.int64)
    assert [int(v) for v in vec(xs)] == [1, -1, -1, 1, -1]


def test_digit_sum_guest_on_spark(spark):
    from selium_spark.functions.wasm_modules import LOOP_MODULE

    ds = wasm_pandas_udf(LOOP_MODULE, "digit_sum", "long")
    df = spark.createDataFrame([(123,), (4567,), (-89,)], "x LONG")
    got = {r.x: r.d for r in df.select("x", ds("x").alias("d")).collect()}
    assert got == {123: 6, 4567: 22, -89: 17}


MEM_GOLDEN_SHA256 = "e5616f21f2c2e11813442084d4585a4e7c716de5bea11967cfd7d1e1c55b8d26"


def test_mem_module_bytes_are_pinned():
    import hashlib

    from selium_spark.functions.wasm_modules import MEM_MODULE

    assert hashlib.sha256(MEM_MODULE).hexdigest() == MEM_GOLDEN_SHA256


def test_interpreter_fnv_over_linear_memory():
    from selium_spark.functions.wasm_interp import (
        ScalarWasmFunction,
        parse_memory_pages,
    )
    from selium_spark.functions.wasm_modules import MEM_MODULE

    assert parse_memory_pages(MEM_MODULE) == 1
    fn = ScalarWasmFunction.from_module(MEM_MODULE, "fnv1a32")

    def fnv_ref(s: bytes) -> int:
        h = 2166136261
        for b in s:
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
        return h

    for s in [b"", b"hi", b"hello world", bytes(range(256)), b"x" * 70000]:
        fn.write_memory(0, s)  # 70000 exercises page growth
        assert fn(0, len(s)) == fnv_ref(s)


def test_mem_module_on_wasmtime_if_present():
    import pytest

    try:
        import wasmtime
    except Exception:
        pytest.skip("wasmtime wheel not installed in this container")
    from selium_spark.functions.wasm_modules import MEM_MODULE

    engine = wasmtime.Engine()
    store = wasmtime.Store(engine)
    module = wasmtime.Module(engine, MEM_MODULE)
    instance = wasmtime.Instance(store, module, [])
    # The module has no memory export — wasmtime validates the binary
    # (memory section, i32/memory opcodes); execution parity is pinned
    # by the interpreter test above.
    assert module is not None


def test_wasm_bytes_udf_on_spark(spark):
    from pyspark.sql import functions as F

    from selium_spark.functions.wasm import wasm_bytes_udf
    from selium_spark.functions.wasm_modules import MEM_MODULE

    fnv = wasm_bytes_udf(MEM_MODULE, "fnv1a32", "long")
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None)], "id LONG, s STRING"
    )
    got = {r["id"]: r["h"] for r in df.select("id", fnv("s").alias("h")).collect()}
    assert got[1] == 0xD58B3FA7
    assert got[2] == got[3] == 0x811C9DC5  # empty and NULL hash alike


TOKENIZER_GOLDEN_SHA256 = (
    "0e2119e7fdcb5174366b679c724f2c962e49d85d85af67d2cb45dc15986c1752"
)


def test_tokenizer_module_bytes_are_pinned():
    import hashlib

    from selium_spark.functions.wasm_modules import TOKENIZER_MODULE

    assert hashlib.sha256(TOKENIZER_MODULE).hexdigest() == TOKENIZER_GOLDEN_SHA256


def test_interpreter_intra_module_call_tokenizer():
    # count_tokens calls is_delim per byte: the `call` opcode, if/else
    # control, and memory reads all in one guest
    import re

    from selium_spark.functions.wasm_interp import ScalarWasmFunction
    from selium_spark.functions.wasm_modules import TOKENIZER_MODULE

    fn = ScalarWasmFunction.from_module(TOKENIZER_MODULE, "count_tokens")
    cases = [
        b"", b"a", b"   ", b"hello world", b" lead", b"trail ",
        b"one  two\tthree\nfour \r five", bytes(range(1, 128)) * 3,
    ]
    for s in cases:
        fn.write_memory(0, s)
        want = len([t for t in re.split(rb"[ \t\n\r]+", s) if t])
        assert fn(0, len(s)) == want, s


def test_interpreter_globals_and_data_segments():
    # hand-assemble a module with a mutable global counter and an
    # active data segment; `bump(n)` adds n to the global and returns it
    from selium_spark.functions.wasm_interp import (
        ScalarWasmFunction,
        parse_module_image,
    )
    from selium_spark.functions.wasm_modules import (
        END,
        I64,
        _assemble,
        _section,
        _sleb,
        _uleb,
        _vec,
        i64_const,
        local_get,
    )

    base = _assemble(
        [
            (
                "bump",
                [I64],
                [I64],
                bytes([0x23]) + _uleb(0)          # global.get 0
                + local_get(0) + bytes([0x7C])    # i64.add
                + bytes([0x24]) + _uleb(0)        # global.set 0
                + bytes([0x23]) + _uleb(0)        # global.get 0
                + bytes([END]),
            ),
            (
                "first_byte",
                [],
                [I64],
                i64_const(0)[0:0]                  # (empty)
                + bytes([0x41]) + _sleb(16)        # i32.const 16
                + bytes([0x31]) + _uleb(0) + _uleb(0)  # i64.load8_u
                + bytes([END]),
            ),
        ],
        memory_pages=1,
    )
    # splice in a global section (id 6: one mutable i64 = 100) and a
    # data section (id 11: "Z" at offset 16) before/after code section
    glob = _section(6, _vec([bytes([I64, 0x01]) + i64_const(100) + bytes([END])]))
    data = _section(
        11, _vec([bytes([0x00]) + bytes([0x41]) + _sleb(16) + bytes([END]) + _uleb(1) + b"Z"])
    )
    # sections must appear in id order: insert global before export (7)
    # and data at the end. Rebuild by scanning section framing.
    out = bytearray(base[:8])
    pos = 8
    placed_glob = False
    while pos < len(base):
        sec_id = base[pos]
        # read section size (uleb)
        p = pos + 1
        size = shift = 0
        while True:
            b = base[p]
            size |= (b & 0x7F) << shift
            p += 1
            if not b & 0x80:
                break
            shift += 7
        end = p + size
        if sec_id >= 7 and not placed_glob:
            out += glob
            placed_glob = True
        out += base[pos:end]
        pos = end
    out += data
    img = parse_module_image(bytes(out))
    assert img.globals_init == ((I64, True, 100),)
    assert img.data_segments == ((16, b"Z"),)

    bump = ScalarWasmFunction.from_module(bytes(out), "bump")
    assert bump(5) == 105
    assert bump(5) == 110  # global state persists across calls
    fb = ScalarWasmFunction.from_module(bytes(out), "first_byte")
    assert fb() == ord("Z")  # data segment landed in memory


def test_interpreter_br_table_and_wide_ops():
    # br_table dispatch + div_u/rotl/popcnt/clz/ctz and 16/32-bit
    # loads/stores round-trips
    from selium_spark.functions.wasm_interp import (
        ScalarWasmFunction,
        parse_module_image,
    )
    from selium_spark.functions.wasm_modules import (
        BLOCK,
        END,
        I64,
        VOID,
        _assemble,
        _uleb,
        i64_const,
        local_get,
        local_set,
    )

    # classify(x): br_table on x -> returns 10 for 0, 20 for 1, 99 default
    body = (
        bytes([BLOCK, VOID, BLOCK, VOID, BLOCK, VOID])
        + local_get(0) + bytes([0xA7])            # i32.wrap_i64
        + bytes([0x0E]) + _uleb(2) + _uleb(0) + _uleb(1) + _uleb(2)  # br_table
        + bytes([END])
        + i64_const(10) + local_set(1) + bytes([0x0C]) + _uleb(1)    # br out
        + bytes([END])
        + i64_const(20) + local_set(1) + bytes([0x0C]) + _uleb(0)
        + bytes([END])
        + local_get(1)
        + bytes([0x50])                            # i64.eqz -> default?
        + bytes([0x04, VOID])                      # if
        + i64_const(99) + local_set(1)
        + bytes([END])
        + local_get(1)
        + bytes([END])
    )
    mod = _assemble([("classify", [I64], [I64], body, [I64])])
    f = ScalarWasmFunction.from_module(mod, "classify")
    assert [f(0), f(1), f(2), f(7)] == [10, 20, 99, 99]

    # arithmetic spot-checks through tiny bodies
    def unop(op_byte, arg, expect, as_i32=False):
        b = local_get(0)
        if as_i32:
            b += bytes([0xA7, op_byte, 0xAC])      # wrap, op, extend_s
        else:
            b += bytes([op_byte])
        b += bytes([END])
        m = _assemble([("f", [I64], [I64], b)])
        assert ScalarWasmFunction.from_module(m, "f")(arg) == expect

    unop(0x7B, 0b1011, 3)          # i64.popcnt
    unop(0x79, 1, 63)              # i64.clz
    unop(0x7A, 8, 3)               # i64.ctz
    unop(0x69, 0xFF, 8, as_i32=True)   # i32.popcnt
    # i64.div_u on a "negative" bit pattern
    m = _assemble([
        ("f", [I64, I64], [I64],
         local_get(0) + local_get(1) + bytes([0x80, END])),
    ])
    f = ScalarWasmFunction.from_module(m, "f")
    assert f(-2, 2) == (2**64 - 2) // 2
    # i32.store16 / i32.load16_u round-trip through memory
    m = _assemble([
        ("f", [I64], [I64],
         bytes([0x41]) + b"\x00"                  # i32.const 0 (addr)
         + local_get(0) + bytes([0xA7])           # wrap to i32
         + bytes([0x3B]) + _uleb(0) + _uleb(0)    # i32.store16
         + bytes([0x41]) + b"\x00"
         + bytes([0x2F]) + _uleb(0) + _uleb(0)    # i32.load16_u
         + bytes([0xAD])                          # i64.extend_i32_u
         + bytes([END])),
    ], memory_pages=1)
    f = ScalarWasmFunction.from_module(m, "f")
    assert f(0x12345) == 0x2345
    # memory.size / memory.grow
    m = _assemble([
        ("f", [], [I64],
         bytes([0x3F, 0x00])                      # memory.size -> 1
         + bytes([0x41, 0x02])                    # i32.const 2
         + bytes([0x40, 0x00])                    # memory.grow -> old size
         + bytes([0x6A])                          # i32.add: 1 + 1
         + bytes([0x3F, 0x00])                    # memory.size -> 3
         + bytes([0x6A, 0xAC, END])),             # total: 2 + 3 = 5
    ], memory_pages=1)
    assert ScalarWasmFunction.from_module(m, "f")() == 5


def test_wasm_guest_tokens_udf_on_spark(spark):
    from selium_spark.functions.wasm import wasm_bytes_udf
    from selium_spark.functions.wasm_modules import TOKENIZER_MODULE

    toks = wasm_bytes_udf(TOKENIZER_MODULE, "count_tokens", "long")
    df = spark.createDataFrame(
        [(1, "hello  world x"), (2, ""), (3, None), (4, "  a  ")],
        "id LONG, s STRING",
    )
    got = {r["id"]: r["n"] for r in df.select("id", toks("s").alias("n")).collect()}
    assert got == {1: 3, 2: 0, 3: 0, 4: 1}


# -- round-4 profile widening: f32, call_indirect, traps, imports --------
def test_route_scale_f32_call_indirect():
    """f32 arithmetic + funcref-table dispatch (the two most common
    profile gaps for real compiled guests)."""
    import struct as _struct

    from selium_spark.functions.wasm_modules import ROUTE_MODULE

    def f32(v):
        return _struct.unpack("<f", _struct.pack("<f", v))[0]

    rs = ScalarWasmFunction.from_module(ROUTE_MODULE, "route_scale")
    for x in (100.0, 0.1, 3.14159, 1e30, -7.25, 0.0):
        assert rs(x, 0) == f32(f32(x) * f32(0.5))
        assert rs(x, 1) == f32(f32(x) * f32(2.0))


def test_call_indirect_bad_table_element_traps():
    from selium_spark.functions.wasm_interp import WasmTrap
    from selium_spark.functions.wasm_modules import ROUTE_MODULE

    rs = ScalarWasmFunction.from_module(ROUTE_MODULE, "route_scale")
    with pytest.raises(WasmTrap):
        rs(1.0, 5)  # table has 2 elements


def test_route_scale_on_spark(spark):
    import struct as _struct

    from selium_spark.functions.wasm_modules import ROUTE_MODULE

    def f32(v):
        return _struct.unpack("<f", _struct.pack("<f", v))[0]

    route = wasm_pandas_udf(ROUTE_MODULE, "route_scale", "double")
    df = spark.createDataFrame(
        [(0.1, 0), (0.1, 1), (123.456, 0)], "v DOUBLE, sel LONG"
    ).select(route("v", "sel").alias("out"))
    got = [r.out for r in df.collect()]
    assert got == [
        f32(f32(0.1) * f32(0.5)),
        f32(f32(0.1) * f32(2.0)),
        f32(f32(123.456) * f32(0.5)),
    ]


def test_oob_memory_access_traps():
    """OOB loads/stores trap like wasmtime instead of silently reading
    short slices / appending at the end of the bytearray (ADVICE r3)."""
    from selium_spark.functions.wasm_interp import WasmTrap
    from selium_spark.functions.wasm_modules import MEM_MODULE

    fnv = ScalarWasmFunction.from_module(MEM_MODULE, "fnv1a32")
    with pytest.raises(WasmTrap, match="out of bounds"):
        fnv(65530, 100)  # reads past the 1-page memory
    # in-bounds still fine
    fnv.write_memory(0, b"abc")
    assert isinstance(fnv(0, 3), int)


def test_memory_grow_capped():
    """memory.grow honors min(declared max, 256-page host arena) and
    returns -1 past it — an untrusted guest can't allocate arbitrary
    host RAM (reference pins PREALLOC_PAGES=256)."""
    from selium_spark.functions.wasm_modules import (
        _section, _sleb, _uleb, _vec, i32_const,
    )

    # (func (export "grow") (param i32) (result i32)
    #   local.get 0  memory.grow)
    body = b"\x20\x00\x40\x00\x0b"
    types = _vec([b"\x60" + _vec([b"\x7f"]) + _vec([b"\x7f"])])
    mod = (
        b"\x00asm\x01\x00\x00\x00"
        + _section(1, types)
        + _section(3, _vec([_uleb(0)]))
        + _section(5, _vec([b"\x00" + _uleb(1)]))  # memory: 1 page, no max
        + _section(7, _vec([_uleb(4) + b"grow" + b"\x00" + _uleb(0)]))
        + _section(10, _vec([_uleb(len(body) + 1) + b"\x00" + body]))
    )
    g = ScalarWasmFunction.from_module(mod, "grow")
    assert g(2) == 1      # grew from 1 page
    assert g(100000) == -1  # past the 256-page cap
    assert g(0) == 3      # size unchanged by the failed grow


def _module_with_import(call_idx: int):
    """One func import (env.host : (i64)->(i64)) + defined add1 (module
    idx 1) + exported caller (module idx 2) that calls ``call_idx``."""
    from selium_spark.functions.wasm_modules import (
        END, I64, _section, _uleb, _vec, i64_const, local_get,
    )

    types = _vec([b"\x60" + _vec([bytes([I64])]) + _vec([bytes([I64])])])
    imports = _vec(
        [_uleb(3) + b"env" + _uleb(4) + b"host" + b"\x00" + _uleb(0)]
    )
    inner = local_get(0) + i64_const(1) + bytes([0x7C, END])  # x+1
    outer = (
        local_get(0)
        + bytes([0x10]) + _uleb(call_idx)
        + bytes([0x10]) + _uleb(call_idx)
        + bytes([END])
    )
    return (
        b"\x00asm\x01\x00\x00\x00"
        + _section(1, types)
        + _section(2, imports)
        + _section(3, _vec([_uleb(0), _uleb(0)]))
        + _section(7, _vec([_uleb(5) + b"twice" + b"\x00" + _uleb(2)]))
        + _section(
            10,
            _vec(
                [
                    _uleb(len(inner) + 1) + b"\x00" + inner,
                    _uleb(len(outer) + 1) + b"\x00" + outer,
                ]
            ),
        )
    )


def test_function_import_shifts_index_space():
    """A module with a function import resolves exports/calls with the
    import-count offset (ADVICE r3: previously the wrong defined
    function executed silently)."""
    twice = ScalarWasmFunction.from_module(_module_with_import(1), "twice")
    assert twice(5) == 7  # (5+1)+1, NOT the import and NOT func idx 2


def test_calling_an_import_index_raises():
    bad = ScalarWasmFunction.from_module(_module_with_import(0), "twice")
    with pytest.raises(NotImplementedError, match="imported function"):
        bad(5)


def test_wasm_bytes_udf_double_dtype(spark):
    """return_type='double' yields float64 results (ADVICE r3: was
    unconditionally int64)."""
    from selium_spark.functions.wasm_modules import (
        _assemble, local_get, I32, F64,
    )
    from selium_spark.functions.wasm import wasm_bytes_udf

    # (func (export "len_half") (param i32 i32) (result f64)
    #   local.get 1  f64.convert_i32_s  f64.const 0.5  f64.mul)
    import struct as _struct
    body = (
        local_get(1) + bytes([0xB7])
        + bytes([0x44]) + _struct.pack("<d", 0.5)
        + bytes([0xA2, 0x0B])
    )
    mod = _assemble([("len_half", [I32, I32], [F64], body)], memory_pages=1)
    udf = wasm_bytes_udf(mod, "len_half", "double")
    df = spark.createDataFrame([("abcd",), ("xy",)], "s STRING").select(
        udf("s").alias("h")
    )
    assert sorted(r.h for r in df.collect()) == [1.0, 2.0]


def test_toolchain_guest_golden_digest_and_exports():
    """The rustc-built guest's bytes are pinned by sha256 and parse to
    the four documented exports — real LLVM output, not the in-repo
    assembler (provenance in functions/guests/__init__.py)."""
    import hashlib

    from selium_spark.functions.guests import (
        TOOLCHAIN_GUEST_SHA256,
        toolchain_guest_bytes,
    )
    from selium_spark.functions.wasm_interp import parse_module

    data = toolchain_guest_bytes()
    assert hashlib.sha256(data).hexdigest() == TOOLCHAIN_GUEST_SHA256
    funcs = parse_module(data)
    assert {"splitmix64", "mix_bucket8", "fib_wrap", "popcount64"} <= set(funcs)


def _py_splitmix64(x: int) -> int:
    z = x & 0xFFFFFFFFFFFFFFFF
    z ^= z >> 30
    z = (z * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    z ^= z >> 31
    return z - 2**64 if z >= 2**63 else z


def test_toolchain_guest_values_all_tiers():
    """Scalar interpreter matches the Python reference on every export,
    and every export — straight-line mixers AND the loop-codegen
    fib_wrap/popcount64 — compiles on the vectorized masked-lane tier
    and agrees lane for lane."""
    import numpy as np
    import pytest

    from selium_spark.functions.guests import toolchain_guest_bytes
    from selium_spark.functions.wasm_interp import (
        ScalarWasmFunction,
        compile_vectorized,
        parse_module,
    )

    funcs = parse_module(toolchain_guest_bytes())
    xs = [0, 1, 42, -7, 123456789, 2**62, -(2**63), 2**63 - 1]

    sm = ScalarWasmFunction(funcs["splitmix64"])
    assert all(sm(x) == _py_splitmix64(x) for x in xs)
    bk = ScalarWasmFunction(funcs["mix_bucket8"])
    assert all(bk(x) == (_py_splitmix64(x) & 7) for x in xs)

    def py_fib(n):
        n = max(0, min(93, n))
        a, b = 0, 1
        for _ in range(n):
            a, b = b, (a + b) & 0xFFFFFFFFFFFFFFFF
        return a - 2**64 if a >= 2**63 else a

    fib = ScalarWasmFunction(funcs["fib_wrap"])
    assert all(fib(x) == py_fib(x) for x in [0, 1, 2, 10, 92, 93, 1000, -5])
    pc = ScalarWasmFunction(funcs["popcount64"])
    assert all(pc(x) == bin(x & 0xFFFFFFFFFFFFFFFF).count("1") for x in xs)

    arr = np.array(xs, dtype=np.int64)
    # ALL four exports — including the loop-codegen fib_wrap/popcount64
    # (real LLVM block/loop/br_if structure) — now run on the
    # vectorized masked-lane tier and agree with the scalar reference.
    for name in ("splitmix64", "mix_bucket8", "fib_wrap", "popcount64"):
        vec = compile_vectorized(funcs[name])
        ref = ScalarWasmFunction(funcs[name])
        assert (vec(arr) == np.array([ref(int(x)) for x in xs], dtype=np.int64)).all()


def test_toolchain_guest_spark_udf(spark):
    """End-to-end: the toolchain guest as a vectorized pandas UDF over
    a Spark column (the wasm_udf_toolchain_mix suite query's core)."""
    from pyspark.sql import functions as F

    from selium_spark.functions.guests import toolchain_guest_bytes
    from selium_spark.functions.wasm import wasm_pandas_udf

    sm = wasm_pandas_udf(toolchain_guest_bytes(), "splitmix64", "long")
    df = spark.range(100).select(sm(F.col("id")).alias("h"))
    got = {i: r.h for i, r in enumerate(df.collect())}
    assert got == {i: _py_splitmix64(i) for i in range(100)}


def test_toolchain_table_guest_data_segment():
    """The rustc-built table guest carries a REAL LLVM data segment
    (static [u8; 16]) that the interpreter loads into linear memory;
    nibble_weight_sum reads it via i32.load8_u and matches the Python
    reference on full-width values."""
    import hashlib

    from selium_spark.functions.guests import (
        TABLE_GUEST_SHA256,
        toolchain_table_guest_bytes,
    )
    from selium_spark.functions.wasm_interp import (
        ScalarWasmFunction,
        parse_module_image,
    )

    data = toolchain_table_guest_bytes()
    assert hashlib.sha256(data).hexdigest() == TABLE_GUEST_SHA256
    img = parse_module_image(data)
    assert img.memory_pages >= 1 and len(img.data_segments) >= 1

    weights = [1, 3, 7, 15, 2, 6, 14, 4, 12, 5, 13, 8, 9, 10, 11, 16]

    def ref(x):
        v = x & 0xFFFFFFFFFFFFFFFF
        return sum(weights[(v >> (4 * i)) & 15] for i in range(16))

    f = ScalarWasmFunction.from_module(data, "nibble_weight_sum")
    xs = [0, 1, 42, -7, 123456789, 2**62, -(2**63), 0x123456789ABCDEF0]
    assert all(f(x) == ref(x) for x in xs)

    # the LUT body also vectorizes: loads become numpy gathers against
    # the static data-segment image (read-only by profile construction)
    import numpy as np

    from selium_spark.functions.wasm_interp import compile_vectorized, parse_module

    vec = compile_vectorized(parse_module(data)["nibble_weight_sum"], image=img)
    arr = np.array(xs, dtype=np.int64)
    assert [int(v) for v in vec(arr)] == [ref(x) for x in xs]


def test_vectorized_gather_oob_traps():
    """A vectorized load past the static image traps at build time
    (the 1-element probe hits it) like the scalar tier / wasmtime."""
    from selium_spark.functions.wasm_interp import (
        WasmFunc,
        WasmTrap,
        compile_vectorized,
        parse_module_image,
    )
    from selium_spark.functions.wasm_modules import MEM_MODULE

    img = parse_module_image(MEM_MODULE)
    bad = WasmFunc(
        name="oob", params=(0x7E,), results=(0x7E,), locals=(),
        # local.get 0; i64.load8_u align=0 offset=16MiB; end
        body=b"\x20\x00\x31\x00\x80\x80\x80\x08\x0b",
    )
    with pytest.raises(WasmTrap):
        compile_vectorized(bad, image=img)


def test_toolchain_dispatch_guest_element_segment():
    """The rustc-built dispatch guest carries a funcref ELEMENT
    SEGMENT (static fn-pointer table, the trait-object lowering):
    route_apply loads a table index from linear memory and
    call_indirects through it; values match the Python reference,
    including negative selectors (i64 & semantics)."""
    import hashlib

    from selium_spark.functions.guests import (
        DISPATCH_GUEST_SHA256,
        toolchain_dispatch_guest_bytes,
    )
    from selium_spark.functions.wasm_interp import (
        ScalarWasmFunction,
        parse_module_image,
    )

    data = toolchain_dispatch_guest_bytes()
    assert hashlib.sha256(data).hexdigest() == DISPATCH_GUEST_SHA256
    img = parse_module_image(data)
    assert img.table is not None and len([t for t in img.table if t is not None]) >= 4

    def ref(x, sel):
        return [x + 1, x * 2, -x, x][sel & 3]

    f = ScalarWasmFunction.from_module(data, "route_apply")
    cases = [(5, s) for s in range(6)] + [(-9, 2), (-9, 3), (7, -3), (0, -1)]
    assert all(f(x, s) == ref(x, s) for x, s in cases)


def test_vectorized_call_indirect_matches_scalar():
    """Lane-varying funcref dispatch on the vectorized tier: each
    distinct selector's callee runs once under a sub-mask (f32 route
    table AND the rustc dispatch guest's element segment), matching
    the scalar interpreter lane for lane; a bad selector in any lane
    traps like the scalar tier."""
    import numpy as np

    from selium_spark.functions.guests import toolchain_dispatch_guest_bytes
    from selium_spark.functions.wasm_interp import (
        WasmTrap,
        compile_vectorized,
        parse_module,
        parse_module_image,
    )
    from selium_spark.functions.wasm_modules import ROUTE_MODULE

    rng = np.random.default_rng(11)

    img = parse_module_image(ROUTE_MODULE)
    vec = compile_vectorized(parse_module(ROUTE_MODULE)["route_scale"], image=img)
    ref = ScalarWasmFunction.from_module(ROUTE_MODULE, "route_scale")
    xs = rng.uniform(-1e6, 1e6, 200)
    sels = rng.integers(0, 2, 200).astype(np.int64)
    got = vec(xs, sels)
    exp = np.array([ref(float(x), int(s)) for x, s in zip(xs, sels)])
    assert np.array_equal(got, exp)
    with pytest.raises(WasmTrap):
        vec(np.array([1.0, 2.0]), np.array([0, 5], dtype=np.int64))

    db = toolchain_dispatch_guest_bytes()
    dv = compile_vectorized(parse_module(db)["route_apply"], image=parse_module_image(db))
    dref = ScalarWasmFunction.from_module(db, "route_apply")
    ks = rng.integers(0, 10**9, 300).astype(np.int64)
    ss = rng.integers(0, 4, 300).astype(np.int64)
    assert (
        np.asarray(dv(ks, ss), np.int64)
        == np.array([dref(int(k), int(s)) for k, s in zip(ks, ss)], np.int64)
    ).all()


def test_vectorized_declines_void_result_call_indirect():
    """A void-result indirect signature would desync the vectorized
    operand stack (live==0 pushes a placeholder, dispatch pushes the
    callee's None) — validation must decline it to the scalar tier
    BEFORE a kernel is built (ADVICE r5 #1)."""
    from selium_spark.functions.wasm_interp import (
        compile_vectorized,
        parse_module,
        parse_module_image,
    )
    from selium_spark.functions.wasm_modules import (
        CALL_INDIRECT,
        END,
        I64,
        _assemble,
        _uleb,
        i64_const,
        local_get,
    )

    # (func $noop (param i64))  — void result, table slot 0
    # (func (export "kick") (param i64) (result i64)
    #   local.get 0  i32.const 0  call_indirect (type $noop)  i64.const 7)
    mod = _assemble(
        [
            ("noop", [I64], [], bytes([END])),
            (
                "kick",
                [I64],
                [I64],
                local_get(0)
                + b"\x41\x00"  # i32.const 0 (selector)
                + bytes([CALL_INDIRECT]) + _uleb(0) + _uleb(0)
                + i64_const(7)
                + bytes([END]),
            ),
        ],
        table=[0],
    )
    img = parse_module_image(mod)
    with pytest.raises(NotImplementedError, match="void-result"):
        compile_vectorized(parse_module(mod)["kick"], image=img)
    # the scalar tier still runs it
    fn = ScalarWasmFunction.from_module(mod, "kick")
    assert fn(123) == 7


def test_probe_trap_falls_back_to_scalar_tier(spark):
    """A guest whose zero-input probe traps (div by an input that is 0
    in the probe) must not fail UDF construction — wasm_pandas_udf
    falls back past the vectorized tier and runs real data fine
    (ADVICE r5 #2)."""
    from selium_spark.functions.wasm_modules import (
        END,
        I64,
        I64_DIV_S,
        _assemble,
        i64_const,
        local_get,
    )

    mod = _assemble(
        [
            (
                "inv1000",
                [I64],
                [I64],
                i64_const(1000) + local_get(0) + bytes([I64_DIV_S, END]),
            ),
        ]
    )
    udf = wasm_pandas_udf(mod, "inv1000", "long")  # must not raise
    df = spark.range(1, 6).select(udf(F.col("id")).alias("v"))
    assert [r.v for r in df.orderBy("v").collect()] == [200, 250, 333, 500, 1000]


def test_bytes_tier_vectorizes_fnv_and_tokenizer():
    """Round-5 verdict #3: (ptr,len) byte-stream guests leave the
    per-row interpreter — compile_vectorized(row_memory=True) runs the
    scan loop masked-lane over a per-row byte matrix. Equivalence with
    the scalar tier is pinned over empty strings, unicode, delimiter
    runs, random binary, and lengths spanning three orders of
    magnitude; ragged slices exercise the zero-padded OOB-read rule."""
    import numpy as np

    from selium_spark.functions.wasm_interp import (
        compile_vectorized,
        parse_module,
        parse_module_image,
    )
    from selium_spark.functions.wasm_modules import MEM_MODULE, TOKENIZER_MODULE

    rng = np.random.default_rng(5)
    texts = [
        b"",
        b"hello world",
        b"  a  b\tc\nd  ",
        "héllo wörld ünïcode 世界".encode(),
        bytes(rng.integers(1, 255, 700, dtype=np.uint8)),
        b" \t\n\r" * 40,
        b"x" * 2000,
        b"a b" * 300,
    ] + [
        b" ".join(
            bytes(rng.integers(97, 123, rng.integers(1, 12), dtype=np.uint8))
            for _ in range(rng.integers(1, 40))
        )
        for _ in range(200)
    ]
    lens = np.array([len(t) for t in texts], np.int64)
    w = int(lens.max())
    mat = np.zeros((len(texts), w + 8), np.uint8)
    for i, t in enumerate(texts):
        mat[i, : len(t)] = np.frombuffer(t, np.uint8)
    for mod, name in ((MEM_MODULE, "fnv1a32"), (TOKENIZER_MODULE, "count_tokens")):
        vec = compile_vectorized(
            parse_module(mod)[name], image=parse_module_image(mod), row_memory=True
        )
        got = np.asarray(vec(mat, lens))
        exp = []
        for t in texts:
            fn = ScalarWasmFunction.from_module(mod, name)  # fresh memory
            fn.write_memory(0, t)
            exp.append(fn(0, len(t)))
        assert np.array_equal(got, np.array(exp, np.int64)), name


def test_bytes_tier_row_memory_requires_ptr_len_shape():
    """row_memory declines non-(ptr,len) exports and memory-less
    modules at build time (falls back to the other tiers)."""
    from selium_spark.functions.wasm_interp import (
        compile_vectorized,
        parse_module,
        parse_module_image,
    )
    from selium_spark.functions.wasm_modules import (
        MEM_MODULE,
        SCALAR_MODULE,
        TOKENIZER_MODULE,
    )

    # has memory, but is_delim is (i32) -> i32, not (ptr, len)
    with pytest.raises(NotImplementedError, match="ptr.*len"):
        compile_vectorized(
            parse_module(TOKENIZER_MODULE)["is_delim"],
            image=parse_module_image(TOKENIZER_MODULE),
            row_memory=True,
        )
    # no memory section at all
    with pytest.raises(NotImplementedError, match="linear memory"):
        compile_vectorized(
            parse_module(SCALAR_MODULE)["add1"],
            image=parse_module_image(SCALAR_MODULE),
            row_memory=True,
        )
    # sanity: the legitimate export still builds
    assert (
        compile_vectorized(
            parse_module(MEM_MODULE)["fnv1a32"],
            image=parse_module_image(MEM_MODULE),
            row_memory=True,
        )
        is not None
    )


def test_wasm_bytes_udf_rides_vectorized_tier(spark):
    """The Spark UDF path goes through the row-memory kernel (the
    per-row fallback would take minutes on this volume) and its values
    match the scalar interpreter row for row."""
    from selium_spark.functions.wasm import wasm_bytes_udf
    from selium_spark.functions.wasm_modules import TOKENIZER_MODULE

    toks = wasm_bytes_udf(TOKENIZER_MODULE, "count_tokens", "long")
    df = spark.createDataFrame(
        [(i, f"w{i} " * (i % 17)) for i in range(500)] + [(500, None)],
        "id long, txt string",
    )
    rows = {r.id: r.n for r in df.select("id", toks("txt").alias("n")).collect()}
    fn = ScalarWasmFunction.from_module(TOKENIZER_MODULE, "count_tokens")
    for i in range(500):
        data = (f"w{i} " * (i % 17)).encode()
        fn.write_memory(0, data)
        assert rows[i] == fn(0, len(data))
    assert rows[500] == 0  # null -> empty record


def test_bytes_tier_slices_bound_matrix_footprint():
    """A single long record must not inflate every row's padded width:
    wasm_bytes_udf slices batches by sorted length under the matrix
    cap. Exercised by shrinking the cap so slicing MUST trigger, then
    pinning equivalence."""
    import numpy as np
    import pandas as pd

    from selium_spark.functions import wasm as wasm_host
    from selium_spark.functions.wasm_modules import MEM_MODULE

    old_cap = wasm_host._BYTES_MAT_CAP
    wasm_host._BYTES_MAT_CAP = 4096  # tiny: forces many slices
    try:
        udf = wasm_host.wasm_bytes_udf(MEM_MODULE, "fnv1a32", "long")
        # grab the wrapped python function to run it directly
        run = udf.func
        texts = ["a" * ln for ln in (0, 1, 5, 100, 1000, 3000)] * 3
        [out] = list(run(iter([pd.Series(texts)])))
        fn = ScalarWasmFunction.from_module(MEM_MODULE, "fnv1a32")
        for t, got in zip(texts, out):
            data = t.encode()
            fn.write_memory(0, data)
            assert got == fn(0, len(data))
    finally:
        wasm_host._BYTES_MAT_CAP = old_cap
