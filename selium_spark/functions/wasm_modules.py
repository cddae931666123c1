"""Precompiled ``.wasm`` scalar-UDF modules (SURVEY §8 TODO #2).

No wat toolchain ships in this container, so the binaries are emitted
by ``_assemble`` — a ~40-line encoder for the exact binary layout the
spec mandates (magic, type/function/export/code sections, LEB128).
The emitted bytes are REAL wasm-MVP modules: `tests/test_wasm.py`
pins their sha256 golden digests, round-trips them through the binary
parser in wasm_interp.py, and (when a wasmtime wheel is present) runs
the identical bytes on the real engine.

Each module's WAT source is shown in its docstring for auditability.
These are the guest programs for the wasm-UDF suite queries — the
Spark analogue of selium's ``#[entrypoint]`` guests (invoked at
subsystem/wasmtime/src/lib.rs:444-453).
"""

from __future__ import annotations

import struct

I32, I64, F32, F64 = 0x7F, 0x7E, 0x7D, 0x7C

# -- opcode mnemonics used by the module bodies ---------------------------
LOCAL_GET, LOCAL_SET = 0x20, 0x21
SELECT = 0x1B
I64_CONST, I64_ADD, I64_SUB, I64_MUL = 0x42, 0x7C, 0x7D, 0x7E
I64_DIV_S, I64_REM_S = 0x7F, 0x81
I64_LT_S, I64_GT_S, I64_GE_S = 0x53, 0x55, 0x59
I64_EQZ = 0x50
F64_CONST, F64_SUB, F64_MUL = 0x44, 0xA1, 0xA2
BLOCK, LOOP, BR, BR_IF = 0x02, 0x03, 0x0C, 0x0D
VOID = 0x40
END = 0x0B


def _uleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _sleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        done = (n == 0 and not b & 0x40) or (n == -1 and b & 0x40)
        out.append(b if done else b | 0x80)
        if done:
            return bytes(out)


def i64_const(v: int) -> bytes:
    return bytes([I64_CONST]) + _sleb(v)


def f64_const(v: float) -> bytes:
    return bytes([F64_CONST]) + struct.pack("<d", v)


def local_get(i: int) -> bytes:
    return bytes([LOCAL_GET]) + _uleb(i)


def _section(sec_id: int, body: bytes) -> bytes:
    return bytes([sec_id]) + _uleb(len(body)) + body


def _vec(items: list[bytes]) -> bytes:
    return _uleb(len(items)) + b"".join(items)


def _assemble(
    funcs: list[tuple], memory_pages: int = 0, table: list[int] | None = None
) -> bytes:
    """Emit a wasm-MVP binary from (name, param_types, result_types,
    body[, local_types]) tuples. One functype per function; no imports.
    ``local_types`` (optional) declares extra locals beyond the
    params — loop-bearing bodies keep their state there.
    ``memory_pages`` > 0 adds a memory section (min pages, no max) —
    the guest workspace byte-processing modules read host-injected
    input from. ``table`` (list of function indices) adds a funcref
    table + active element segment for ``call_indirect`` guests."""
    funcs = [f if len(f) == 5 else (*f, []) for f in funcs]
    types = _vec(
        [b"\x60" + _vec([bytes([t]) for t in p]) + _vec([bytes([t]) for t in r])
         for _, p, r, _, _ in funcs]
    )
    func_decls = _vec([_uleb(i) for i in range(len(funcs))])
    exports = _vec(
        [_uleb(len(n.encode())) + n.encode() + b"\x00" + _uleb(i)
         for i, (n, _, _, _, _) in enumerate(funcs)]
    )
    codes = []
    for _, _, _, body, local_types in funcs:
        # local decls: one (count, valtype) run per declared local
        decls = _vec([_uleb(1) + bytes([t]) for t in local_types])
        code = decls + body
        codes.append(_uleb(len(code)) + code)
    codes = _vec(codes)
    memory = (
        _section(5, _vec([b"\x00" + _uleb(memory_pages)])) if memory_pages else b""
    )
    table_sec = elem_sec = b""
    if table:
        # table section: one funcref table, min = max = len(table)
        table_sec = _section(
            4, _vec([b"\x70\x01" + _uleb(len(table)) + _uleb(len(table))])
        )
        # element section: one active segment at offset 0
        elem_sec = _section(
            9,
            _vec(
                [b"\x00" + bytes([0x41]) + _sleb(0) + bytes([END])
                 + _vec([_uleb(i) for i in table])]
            ),
        )
    return (
        b"\x00asm\x01\x00\x00\x00"
        + _section(1, types)
        + _section(3, func_decls)
        + table_sec
        + memory
        + _section(7, exports)
        + elem_sec
        + _section(10, codes)
    )


# Knuth MMIX LCG constants — also used by sources/generator.py's oracle.
LCG_A = 6364136223846793005
LCG_C = 1442695040888963407

#: WAT::
#:   (module
#:     (func (export "add1") (param i64) (result i64)
#:       local.get 0  i64.const 1  i64.add)
#:     (func (export "lcg2") (param i64) (result i64)
#:       local.get 0
#:       i64.const 6364136223846793005  i64.mul
#:       i64.const 1442695040888963407  i64.add
#:       i64.const 6364136223846793005  i64.mul
#:       i64.const 1442695040888963407  i64.add)
#:     (func (export "disc_price") (param f64 f64) (result f64)
#:       f64.const 1.0  local.get 1  f64.sub
#:       local.get 0    f64.mul)
#:     (func (export "clamp") (param i64 i64 i64) (result i64)
#:       ;; branchless least(greatest(x, lo), hi); max recomputed in
#:       ;; place of a local.tee to stay in the no-locals profile
#:       local.get 0  local.get 1  local.get 0  local.get 1
#:       i64.gt_s  select                      ;; m = max(x, lo)
#:       local.get 2
#:       local.get 0  local.get 1  local.get 0  local.get 1
#:       i64.gt_s  select                      ;; m again
#:       local.get 2  i64.lt_s  select))       ;; m if m < hi else hi
SCALAR_MODULE: bytes = _assemble(
    [
        (
            "add1",
            [I64],
            [I64],
            local_get(0) + i64_const(1) + bytes([I64_ADD, END]),
        ),
        (
            "lcg2",
            [I64],
            [I64],
            local_get(0)
            + i64_const(LCG_A) + bytes([I64_MUL])
            + i64_const(LCG_C) + bytes([I64_ADD])
            + i64_const(LCG_A) + bytes([I64_MUL])
            + i64_const(LCG_C) + bytes([I64_ADD, END]),
        ),
        (
            "disc_price",
            [F64, F64],
            [F64],
            f64_const(1.0) + local_get(1) + bytes([F64_SUB])
            + local_get(0) + bytes([F64_MUL, END]),
        ),
        (
            "clamp",
            [I64, I64, I64],
            [I64],
            # max(x, lo) twice (no locals), then min with hi via select
            (local_get(0) + local_get(1) + local_get(0) + local_get(1)
             + bytes([I64_GT_S, SELECT]))
            + local_get(2)
            + (local_get(0) + local_get(1) + local_get(0) + local_get(1)
               + bytes([I64_GT_S, SELECT]))
            + local_get(2) + bytes([I64_LT_S, SELECT, END]),
        ),
    ]
)


def local_set(i: int) -> bytes:
    return bytes([LOCAL_SET]) + _uleb(i)


#: Loop-bearing guest (the interpreter-tier control-flow profile):
#:
#: WAT::
#:   (module
#:     (func (export "digit_sum") (param i64) (result i64)
#:       (local $n i64) (local $acc i64)
#:       ;; $n = abs(x) — branchless select
#:       local.get 0
#:       i64.const 0  local.get 0  i64.sub
#:       local.get 0  i64.const 0  i64.ge_s
#:       select
#:       local.set $n
#:       block
#:         loop
#:           local.get $n  i64.eqz  br_if 1      ;; done -> exit block
#:           local.get $acc
#:           local.get $n  i64.const 10  i64.rem_s
#:           i64.add  local.set $acc
#:           local.get $n  i64.const 10  i64.div_s
#:           local.set $n
#:           br 0                                ;; continue loop
#:         end
#:       end
#:       local.get $acc))
I32_CONST, I32_ADD, I32_GE_U = 0x41, 0x6A, 0x4F
I32_LOAD8_U = 0x2D
I64_XOR, I64_AND = 0x85, 0x83
I64_EXTEND_I32_U = 0xAD


def i32_const(v: int) -> bytes:
    return bytes([I32_CONST]) + _sleb(v)


#: Byte-processing guest over LINEAR MEMORY — the reference's compute
#: shape (guests scan record bytes handed to them by the host,
#: system/userland/src/io.rs:288 chunked reads). The host writes the
#: record's utf-8 bytes into guest memory and calls
#: ``fnv1a32(ptr, len)``; the guest folds FNV-1a (32-bit, masked in
#: i64 arithmetic) over the bytes.
#:
#: WAT::
#:   (module
#:     (memory 1)
#:     (func (export "fnv1a32") (param $ptr i32) (param $len i32) (result i64)
#:       (local $h i64) (local $end i32)
#:       i64.const 2166136261  local.set $h
#:       local.get $ptr  local.get $len  i32.add  local.set $end
#:       block
#:         loop
#:           local.get $ptr  local.get $end  i32.ge_u  br_if 1
#:           local.get $h
#:           local.get $ptr  i32.load8_u  i64.extend_i32_u
#:           i64.xor
#:           i64.const 16777619  i64.mul
#:           i64.const 0xFFFFFFFF  i64.and
#:           local.set $h
#:           local.get $ptr  i32.const 1  i32.add  local.set $ptr
#:           br 0
#:         end
#:       end
#:       local.get $h))
MEM_MODULE: bytes = _assemble(
    [
        (
            "fnv1a32",
            [I32, I32],
            [I64],
            i64_const(2166136261) + local_set(2)
            + local_get(0) + local_get(1) + bytes([I32_ADD]) + local_set(3)
            + bytes([BLOCK, VOID, LOOP, VOID])
            + local_get(0) + local_get(3) + bytes([I32_GE_U, BR_IF]) + _uleb(1)
            + local_get(2)
            + local_get(0) + bytes([I32_LOAD8_U]) + _uleb(0) + _uleb(0)
            + bytes([I64_EXTEND_I32_U, I64_XOR])
            + i64_const(16777619) + bytes([I64_MUL])
            + i64_const(0xFFFFFFFF) + bytes([I64_AND])
            + local_set(2)
            + local_get(0) + i32_const(1) + bytes([I32_ADD]) + local_set(0)
            + bytes([BR]) + _uleb(0)
            + bytes([END, END])
            + local_get(2)
            + bytes([END]),
            [I64, I32],
        ),
    ],
    memory_pages=1,
)


LOOP_MODULE: bytes = _assemble(
    [
        (
            "digit_sum",
            [I64],
            [I64],
            # abs into local 1
            local_get(0)
            + i64_const(0) + local_get(0) + bytes([I64_SUB])
            + local_get(0) + i64_const(0) + bytes([I64_GE_S, SELECT])
            + local_set(1)
            # block/loop digit scan, state in locals 1 (n) and 2 (acc)
            + bytes([BLOCK, VOID, LOOP, VOID])
            + local_get(1) + bytes([I64_EQZ, BR_IF]) + _uleb(1)
            + local_get(2)
            + local_get(1) + i64_const(10) + bytes([I64_REM_S, I64_ADD])
            + local_set(2)
            + local_get(1) + i64_const(10) + bytes([I64_DIV_S])
            + local_set(1)
            + bytes([BR]) + _uleb(0)
            + bytes([END, END])
            + local_get(2)
            + bytes([END]),
            [I64, I64],
        ),
    ]
)


IF, ELSE = 0x04, 0x05
CALL = 0x10
I32_EQ, I32_OR, I32_EQZ = 0x46, 0x72, 0x45


#: MULTI-FUNCTION byte-processing guest: ``count_tokens(ptr, len)``
#: walks host-injected bytes in linear memory and counts
#: delimiter-separated tokens, calling the helper ``is_delim`` PER BYTE
#: — the intra-module ``call`` shape every non-trivial real guest has
#: (the reference's guests are ordinary compiled Rust with internal
#: function calls, e.g. examples/rest-api/src/lib.rs:52-130's framing
#: helpers).
#:
#: WAT::
#:   (module
#:     (memory 1)
#:     (func $is_delim (param $b i32) (result i32)
#:       local.get $b  i32.const 32  i32.eq        ;; space
#:       local.get $b  i32.const 9   i32.eq  i32.or ;; tab
#:       local.get $b  i32.const 10  i32.eq  i32.or ;; LF
#:       local.get $b  i32.const 13  i32.eq  i32.or) ;; CR
#:     (func (export "count_tokens") (param $ptr i32) (param $len i32) (result i64)
#:       (local $n i64) (local $in i32) (local $end i32)
#:       local.get $ptr  local.get $len  i32.add  local.set $end
#:       block
#:         loop
#:           local.get $ptr  local.get $end  i32.ge_u  br_if 1
#:           local.get $ptr  i32.load8_u  call $is_delim
#:           if                                   ;; delimiter: close token
#:             i32.const 0  local.set $in
#:           else                                 ;; token byte: count starts
#:             local.get $in  i32.eqz
#:             if
#:               local.get $n  i64.const 1  i64.add  local.set $n
#:               i32.const 1  local.set $in
#:             end
#:           end
#:           local.get $ptr  i32.const 1  i32.add  local.set $ptr
#:           br 0
#:         end
#:       end
#:       local.get $n))
def _is_delim_body() -> bytes:
    out = local_get(0) + i32_const(32) + bytes([I32_EQ])
    for code in (9, 10, 13):
        out += local_get(0) + i32_const(code) + bytes([I32_EQ, I32_OR])
    return out + bytes([END])


F32_CONST, F32_MUL = 0x43, 0x94
F32_DEMOTE_F64, F64_PROMOTE_F32 = 0xB6, 0xBB
I32_WRAP_I64 = 0xA7
CALL_INDIRECT = 0x11


def f32_const(v: float) -> bytes:
    return bytes([F32_CONST]) + struct.pack("<f", v)


#: f32 + ``call_indirect`` guest — the two most common profile gaps for
#: real compiled guests (Rust/C toolchains emit funcref-table dispatch
#: for trait objects / function pointers, and f32 math for
#: single-precision features). ``route_scale(x f64, sel i64) -> f64``
#: demotes x to f32, dispatches through the funcref table on
#: ``sel`` (0 -> halve, 1 -> double), and promotes the single-precision
#: product back — so the result carries REAL f32 rounding the DuckDB
#: oracle reproduces with CAST(:: REAL) arithmetic.
#:
#: WAT::
#:   (module
#:     (table funcref (elem $half $dbl))
#:     (func $half (param f32) (result f32)
#:       local.get 0  f32.const 0.5  f32.mul)
#:     (func $dbl  (param f32) (result f32)
#:       local.get 0  f32.const 2.0  f32.mul)
#:     (func (export "route_scale") (param f64 i64) (result f64)
#:       local.get 0  f32.demote_f64
#:       local.get 1  i32.wrap_i64
#:       call_indirect (param f32) (result f32)
#:       f64.promote_f32))
ROUTE_MODULE: bytes = _assemble(
    [
        (
            "half",
            [F32],
            [F32],
            local_get(0) + f32_const(0.5) + bytes([F32_MUL, END]),
        ),
        (
            "dbl",
            [F32],
            [F32],
            local_get(0) + f32_const(2.0) + bytes([F32_MUL, END]),
        ),
        (
            "route_scale",
            [F64, I64],
            [F64],
            local_get(0) + bytes([F32_DEMOTE_F64])
            + local_get(1) + bytes([I32_WRAP_I64])
            + bytes([CALL_INDIRECT]) + _uleb(0) + _uleb(0)  # type 0, table 0
            + bytes([F64_PROMOTE_F32, END]),
        ),
    ],
    table=[0, 1],
)


TOKENIZER_MODULE: bytes = _assemble(
    [
        ("is_delim", [I32], [I32], _is_delim_body()),
        (
            "count_tokens",
            [I32, I32],
            [I64],
            # end = ptr + len  (locals: 2=$n i64, 3=$in i32, 4=$end i32)
            local_get(0) + local_get(1) + bytes([I32_ADD]) + local_set(4)
            + bytes([BLOCK, VOID, LOOP, VOID])
            + local_get(0) + local_get(4) + bytes([I32_GE_U, BR_IF]) + _uleb(1)
            + local_get(0) + bytes([I32_LOAD8_U]) + _uleb(0) + _uleb(0)
            + bytes([CALL]) + _uleb(0)          # call $is_delim
            + bytes([IF, VOID])
            + i32_const(0) + local_set(3)
            + bytes([ELSE])
            + local_get(3) + bytes([I32_EQZ, IF, VOID])
            + local_get(2) + i64_const(1) + bytes([I64_ADD]) + local_set(2)
            + i32_const(1) + local_set(3)
            + bytes([END])                      # inner if
            + bytes([END])                      # if/else
            + local_get(0) + i32_const(1) + bytes([I32_ADD]) + local_set(0)
            + bytes([BR]) + _uleb(0)
            + bytes([END, END])
            + local_get(2)
            + bytes([END]),
            [I64, I32, I32],
        ),
    ],
    memory_pages=1,
)
