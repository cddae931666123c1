"""Minimal pure-Python WebAssembly interpreter for scalar UDF modules.

Selium executes user compute as sandboxed wasm guests (entrypoint
dispatch at subsystem/wasmtime/src/lib.rs:444-453; the guest sees no
ambient authority — capability deny-stubs at :295-312). Our Spark
rendering runs the module inside a vectorized pandas_udf
(functions/wasm.py). The container has no wasmtime wheel, so this
module makes the checked-in ``.wasm`` bytes executable anyway: it
parses the real binary format (type/function/export/code sections,
LEB128) and interprets the straight-line numeric opcode subset that
scalar UDF modules need — i64/f64 arithmetic, locals, ``select``,
comparisons, sign-correct two's-complement wrap-around.

This is NOT a general wasm runtime (no host imports — function imports
are counted so the index space resolves, but calling one traps);
it is a deterministic host for the scalar-function profile, and the
sandbox property is trivially true — the interpreter supplies no
import implementations at all. The scalar tier executes structured
control flow
(``block``/``loop``/``if``/``else``/``br``/``br_if``/``return`` with
void block types), i32/i64/f32/f64 arithmetic, ``call`` and
``call_indirect`` (funcref table 0), and LINEAR MEMORY (bounds-checked
load/store that traps OOB like wasmtime, ``memory.grow`` capped at the
declared max under a 256-page host arena, host-injected input
bytes) — so byte-processing guests
(the reference's chunked-stream compute model,
system/userland/src/io.rs:288) run without wasmtime: the host writes
a record's bytes into guest memory and calls the export with
(ptr, len). The vectorized compiler handles arithmetic bodies
INCLUDING structured loops (masked-lane execution, see
``compile_vectorized``), static-memory gathers, direct calls, and —
with ``row_memory=True`` — whole (ptr,len) byte-stream guests over a
per-lane byte matrix; this scalar tier remains the reference
semantics every vectorized construct is tested against and the
fallback for out-of-profile bodies. With wasmtime installed,
functions/wasm.py runs the SAME bytes on the real engine instead.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

_U64 = 1 << 64
_I64_MAX = (1 << 63) - 1
_U32 = 1 << 32
_I32_MAX = (1 << 31) - 1
_PAGE = 65536  # wasm page size
# Host-side guest-memory ceiling, matching the reference's preallocated
# 256-page guest arena (subsystem/wasmtime/src/lib.rs:259-270): an
# untrusted module may not grow past it regardless of its declared max.
HOST_MAX_PAGES = 256


class WasmTrap(RuntimeError):
    """Guest trap (OOB memory access, bad indirect call, type mismatch)
    — the same conditions wasmtime traps on, so interpreter-tier and
    real-engine-tier behavior agree instead of silently diverging."""

I32, I64, F32, F64 = 0x7F, 0x7E, 0x7D, 0x7C
_VALTYPE_NAMES = {I32: "i32", I64: "i64", F32: "f32", F64: "f64"}


def _wrap64(v: int) -> int:
    """Two's-complement wrap to signed i64."""
    v &= _U64 - 1
    return v - _U64 if v > _I64_MAX else v


def _wrap32(v: int) -> int:
    """Two's-complement wrap to signed i32."""
    v &= _U32 - 1
    return v - _U32 if v > _I32_MAX else v


class _Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def take(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("truncated wasm module")
        self.pos += n
        return out

    def uleb(self) -> int:
        result = shift = 0
        while True:
            b = self.byte()
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7

    def sleb(self) -> int:
        result = shift = 0
        while True:
            b = self.byte()
            result |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                if b & 0x40:
                    result -= 1 << shift
                return result

    def eof(self) -> bool:
        return self.pos >= len(self.data)


@dataclass(frozen=True)
class WasmFunc:
    """One exported scalar function: decoded signature + body bytes."""

    name: str
    params: tuple[int, ...]  # valtype bytes
    results: tuple[int, ...]
    locals: tuple[int, ...]  # declared (non-param) locals, expanded
    body: bytes  # instruction stream including trailing 0x0b


@dataclass(frozen=True)
class ModuleImage:
    """Whole-module decode: defined functions, exports, memory size,
    mutable-global initials, and active data segments (string constants
    land in memory before the first call — the same instantiation order
    wasmtime follows).

    Function indices in ``exports``, ``call`` immediates, and ``table``
    entries are MODULE function indices: the first
    ``num_func_imports`` indices are imported functions (callable only
    by a real engine with a host to supply them — the sandbox offers
    none, so calls landing there trap), and defined function index i
    lives at ``funcs[i - num_func_imports]``."""

    funcs: tuple[WasmFunc, ...]  # defined functions, in code-section order
    exports: dict[str, int]  # name -> MODULE function index
    memory_pages: int
    globals_init: tuple[tuple[int, bool, object], ...]  # (valtype, mut, value)
    data_segments: tuple[tuple[int, bytes], ...]  # (offset, bytes)
    num_func_imports: int = 0
    max_pages: int | None = None  # declared memory max (None = no max)
    table: tuple[int | None, ...] = ()  # funcref table 0 (module func idx)
    types: tuple[tuple[tuple[int, ...], tuple[int, ...]], ...] = ()

    def resolve(self, module_func_idx: int) -> WasmFunc:
        """Defined WasmFunc for a module function index; traps on an
        import index (no host functions exist in this sandbox)."""
        if module_func_idx < self.num_func_imports:
            raise NotImplementedError(
                f"call to imported function index {module_func_idx} — the "
                "interpreter sandbox offers no host imports"
            )
        idx = module_func_idx - self.num_func_imports
        if idx >= len(self.funcs):
            raise WasmTrap(f"function index {module_func_idx} out of range")
        return self.funcs[idx]


def _const_expr(body: "_Reader"):
    """Evaluate a constant initializer expression (global/data offsets)."""
    op = body.byte()
    if op == 0x41:  # i32.const
        v = _wrap32(body.sleb())
    elif op == 0x42:  # i64.const
        v = _wrap64(body.sleb())
    elif op == 0x43:  # f32.const
        v = struct.unpack("<f", body.take(4))[0]
    elif op == 0x44:  # f64.const
        v = struct.unpack("<d", body.take(8))[0]
    else:
        raise NotImplementedError(f"unsupported const-expr opcode 0x{op:02x}")
    if body.byte() != 0x0B:
        raise ValueError("const expr not terminated by end")
    return v


def parse_module_image(module_bytes: bytes) -> ModuleImage:
    """Decode a wasm binary: all defined functions, exports, memory,
    globals, data segments.

    Validates magic/version and the section framing; ignores sections
    this profile doesn't use (skipped by their declared size, like any
    conforming decoder). The import section IS parsed: function imports
    shift the function index space (export/call immediates count them
    first), so they must be counted even though the sandbox offers no
    host functions — calls that land on an import index trap at call
    time. Global/memory imports would shift index spaces the
    interpreter resolves locally, so they are rejected at parse time.
    """
    r = _Reader(module_bytes)
    if r.take(4) != b"\x00asm":
        raise ValueError("not a wasm module (bad magic)")
    if r.take(4) != b"\x01\x00\x00\x00":
        raise ValueError("unsupported wasm version")

    types: list[tuple[tuple[int, ...], tuple[int, ...]]] = []
    func_type_idx: list[int] = []
    exports: dict[str, int] = {}
    codes: list[tuple[tuple[int, ...], bytes]] = []
    memory_pages = 0
    max_pages: int | None = None
    num_func_imports = 0
    table_size = 0
    elem_segments: list[tuple[int, list[int]]] = []
    globals_init: list[tuple[int, bool, object]] = []
    data_segments: list[tuple[int, bytes]] = []

    def _limits(rd: "_Reader") -> tuple[int, int | None]:
        flag = rd.byte()
        lo = rd.uleb()
        hi = rd.uleb() if flag == 1 else None
        return lo, hi

    while not r.eof():
        sec_id = r.byte()
        size = r.uleb()
        body = _Reader(r.take(size))
        if sec_id == 1:  # type section
            for _ in range(body.uleb()):
                if body.byte() != 0x60:
                    raise ValueError("expected functype")
                params = tuple(body.byte() for _ in range(body.uleb()))
                results = tuple(body.byte() for _ in range(body.uleb()))
                types.append((params, results))
        elif sec_id == 2:  # import section
            for _ in range(body.uleb()):
                body.take(body.uleb())  # module name
                body.take(body.uleb())  # field name
                kind = body.byte()
                if kind == 0x00:  # function import: shifts func index space
                    body.uleb()  # type index
                    num_func_imports += 1
                elif kind == 0x01:  # table import
                    body.byte()  # reftype
                    _limits(body)
                    raise NotImplementedError(
                        "wasm table imports outside the interpreter profile"
                    )
                elif kind == 0x02:  # memory import
                    _limits(body)
                    raise NotImplementedError(
                        "wasm memory imports outside the interpreter profile"
                    )
                elif kind == 0x03:  # global import: shifts global index space
                    body.byte()  # valtype
                    body.byte()  # mutability
                    raise NotImplementedError(
                        "wasm global imports outside the interpreter profile"
                    )
                else:
                    raise ValueError(f"bad import kind {kind}")
        elif sec_id == 3:  # function section
            func_type_idx = [body.uleb() for _ in range(body.uleb())]
        elif sec_id == 4:  # table section (funcref table for call_indirect)
            if body.uleb() >= 1:
                body.byte()  # reftype (0x70 funcref)
                table_size, _tmax = _limits(body)
        elif sec_id == 5:  # memory section
            if body.uleb() >= 1:
                memory_pages, max_pages = _limits(body)
        elif sec_id == 9:  # element section (active funcref segments)
            for _ in range(body.uleb()):
                flags = body.uleb()
                if flags == 0:  # active, table 0, offset expr, func indices
                    off = int(_const_expr(body))
                    idxs = [body.uleb() for _ in range(body.uleb())]
                    elem_segments.append((off, idxs))
                else:
                    raise NotImplementedError(f"element segment flags {flags}")
        elif sec_id == 6:  # global section
            for _ in range(body.uleb()):
                vt = body.byte()
                mut = body.byte() == 1
                globals_init.append((vt, mut, _const_expr(body)))
        elif sec_id == 7:  # export section
            for _ in range(body.uleb()):
                name = body.take(body.uleb()).decode("utf-8")
                kind = body.byte()
                idx = body.uleb()
                if kind == 0:  # func export
                    exports[name] = idx
        elif sec_id == 10:  # code section
            for _ in range(body.uleb()):
                code = _Reader(body.take(body.uleb()))
                local_types: list[int] = []
                for _ in range(code.uleb()):
                    n = code.uleb()
                    local_types.extend([code.byte()] * n)
                codes.append((tuple(local_types), bytes(code.data[code.pos :])))
        elif sec_id == 11:  # data section (active segments only)
            for _ in range(body.uleb()):
                flags = body.uleb()
                if flags == 0:  # active, memory 0, offset expr
                    off = int(_const_expr(body))
                    data_segments.append((off, bytes(body.take(body.uleb()))))
                elif flags == 1:  # passive — no instantiation effect
                    body.take(body.uleb())
                else:
                    raise NotImplementedError(f"data segment flags {flags}")
        # other sections (custom, import, table, start, ...) skipped by size

    funcs = []
    for idx, (local_types, instrs) in enumerate(codes):
        params, results = types[func_type_idx[idx]]
        mod_idx = num_func_imports + idx  # module function index space
        name = next((n for n, i in exports.items() if i == mod_idx), f"$f{idx}")
        funcs.append(WasmFunc(name, params, results, local_types, instrs))
    table: list[int | None] = [None] * table_size
    for off, idxs in elem_segments:
        if off + len(idxs) > len(table):
            raise ValueError("element segment exceeds table size")
        table[off : off + len(idxs)] = idxs
    return ModuleImage(
        funcs=tuple(funcs),
        exports={
            n: i
            for n, i in exports.items()
            if i < num_func_imports + len(codes)
        },
        memory_pages=memory_pages,
        globals_init=tuple(globals_init),
        data_segments=tuple(data_segments),
        num_func_imports=num_func_imports,
        max_pages=max_pages,
        table=tuple(table),
        types=tuple(types),
    )


def parse_module(module_bytes: bytes) -> dict[str, WasmFunc]:
    """Back-compat view: exported name -> WasmFunc (defined only)."""
    img = parse_module_image(module_bytes)
    return {
        name: img.resolve(idx)
        for name, idx in img.exports.items()
        if idx >= img.num_func_imports
    }


def parse_memory_pages(module_bytes: bytes) -> int:
    """Initial page count of the module's memory section (0 = none).
    Matches the reference's preallocated-guest-memory model
    (subsystem/wasmtime/src/lib.rs:259-270, 256 pages pinned)."""
    return parse_module_image(module_bytes).memory_pages


def _f32(v: float) -> float:
    """Round a Python float through IEEE-754 single precision — every
    f32 op result must carry f32 precision, not double."""
    return struct.unpack("<f", struct.pack("<f", v))[0]


def _trunc_div(a: int, b: int) -> int:
    if b == 0:
        raise ZeroDivisionError("wasm i64.div_s by zero")
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _trunc_rem(a: int, b: int) -> int:
    if b == 0:
        raise ZeroDivisionError("wasm i64.rem_s by zero")
    return a - _trunc_div(a, b) * b


# opcodes whose single immediate is a uleb (branch depths, indices)
_IMM_ULEB = frozenset({0x0C, 0x0D, 0x10, 0x20, 0x21, 0x22, 0x23, 0x24})
# memory load/store opcodes: two uleb immediates (align, offset)
_IMM_MEM = frozenset(range(0x28, 0x3F))
# integer load op -> (byte width, sign-extend); store op -> byte width
_LOAD_SPEC = {
    0x28: (4, True), 0x29: (8, True),                  # i32.load / i64.load
    0x2C: (1, True), 0x2D: (1, False),                 # i32.load8_s/u
    0x2E: (2, True), 0x2F: (2, False),                 # i32.load16_s/u
    0x30: (1, True), 0x31: (1, False),                 # i64.load8_s/u
    0x32: (2, True), 0x33: (2, False),                 # i64.load16_s/u
    0x34: (4, True), 0x35: (4, False),                 # i64.load32_s/u
}
_STORE_SPEC = {0x36: 4, 0x37: 8, 0x3A: 1, 0x3B: 2, 0x3C: 1, 0x3D: 2, 0x3E: 4}
_BLOCK_OPS = frozenset({0x02, 0x03, 0x04})  # block / loop / if
_VOID_BT = 0x40


def _scan_control(body: bytes) -> dict[int, tuple[int, int | None]]:
    """Match every block/loop/if opcode offset to (end_offset,
    else_offset|None) in one immediate-aware pass, so the interpreter
    can jump instead of re-scanning on every branch."""
    r = _Reader(body)
    open_blocks: list[list] = []
    out: dict[int, tuple[int, int | None]] = {}
    while not r.eof():
        off = r.pos
        op = r.byte()
        if op in _BLOCK_OPS:
            bt = r.byte()
            if bt not in (_VOID_BT, I32, I64, F32, F64):
                raise NotImplementedError(
                    "wasm block types beyond void/single-value are unsupported"
                )
            open_blocks.append([off, None])
        elif op == 0x05:  # else
            open_blocks[-1][1] = off
        elif op == 0x0B and open_blocks:  # end of a structured block
            start, els = open_blocks.pop()
            out[start] = (off, els)
        elif op in _IMM_ULEB:
            r.uleb()
        elif op == 0x11:  # call_indirect: type index + table index
            r.uleb()
            r.uleb()
        elif op == 0x0E:  # br_table: depth vector + default
            for _ in range(r.uleb()):
                r.uleb()
            r.uleb()
        elif op in _IMM_MEM:  # loads/stores: align + offset
            r.uleb()
            r.uleb()
        elif op in (0x3F, 0x40):  # memory.size / memory.grow: mem index
            r.byte()
        elif op in (0x41, 0x42):  # i32/i64.const
            r.sleb()
        elif op == 0x43:  # f32.const
            r.take(4)
        elif op == 0x44:  # f64.const
            r.take(8)
    return out


class ScalarWasmFunction:
    """Callable interpreting one exported function's body per invocation.

    Profile: locals, globals, constants, i32/i64/f64 arithmetic,
    comparisons (producing i32 0/1), ``select``, linear memory
    (all MVP load/store widths, ``memory.size``/``memory.grow``,
    active data segments), intra-module ``call``, and structured
    control flow — ``block``/``loop``/``if``/``else`` (void block
    types) with ``br``/``br_if``/``br_table``/``return`` — enough for
    whole multi-function byte-processing guests (tokenizers, framing
    scanners, iterative hashes). Raises NotImplementedError at call
    time on an opcode outside the profile, naming it — so an
    unsupported module fails loudly, not wrongly. No imports exist, so
    the sandbox property (capability-deny, like the reference's
    wasmtime config at subsystem/wasmtime/src/lib.rs:87-231) is
    trivially true.
    """

    def __init__(
        self,
        func: WasmFunc,
        memory_pages: int = 0,
        image: "ModuleImage | None" = None,
    ):
        self.func = func
        self.arity = len(func.params)
        self.image = image
        self._ctrl: dict[bytes, dict] = {}
        self.ctrl = self._ctrl_for(func)
        # Linear memory (the guest's only workspace — no imports, so the
        # host decides what bytes it sees, mirroring the reference's
        # capability-deny sandbox). Allocated once per instance.
        pages = image.memory_pages if image else memory_pages
        self.memory = bytearray(pages * _PAGE) if pages else None
        # growth ceiling: the module's declared max, under the host's
        # 256-page arena cap (reference PREALLOC_PAGES) — an untrusted
        # guest must not be able to allocate arbitrary host RAM
        declared_max = image.max_pages if image else None
        cap = (
            min(declared_max, HOST_MAX_PAGES)
            if declared_max is not None
            else HOST_MAX_PAGES
        )
        self._page_cap = max(pages, cap)
        self.globals_: list = []
        if image:
            for off, data in image.data_segments:
                if self.memory is None:
                    raise ValueError("data segment but no memory section")
                if off + len(data) > len(self.memory):
                    raise WasmTrap("data segment out of bounds")
                self.memory[off : off + len(data)] = data
            self.globals_ = [v for (_vt, _mut, v) in image.globals_init]

    def _ctrl_for(self, func: WasmFunc) -> dict:
        c = self._ctrl.get(func.body)
        if c is None:
            c = self._ctrl[func.body] = _scan_control(func.body)
        return c

    def write_memory(self, offset: int, data: bytes) -> None:
        """Host-side input injection: place ``data`` into guest memory
        (the host half of a (ptr, len) calling convention)."""
        if self.memory is None:
            raise ValueError(f"{self.func.name}: module declares no memory")
        need = offset + len(data)
        if need > self._page_cap * _PAGE:
            raise WasmTrap(
                f"write_memory past the {self._page_cap}-page cap "
                f"(offset={offset}, len={len(data)})"
            )
        if need > len(self.memory):  # grow by whole pages, like memory.grow
            self.memory.extend(bytes(((need - len(self.memory)) // _PAGE + 1) * _PAGE))
        self.memory[offset : offset + len(data)] = data

    @classmethod
    def from_module(cls, module_bytes: bytes, name: str) -> "ScalarWasmFunction":
        img = parse_module_image(module_bytes)
        if name not in img.exports:
            raise KeyError(
                f"export {name!r} not found; module exports: {sorted(img.exports)}"
            )
        return cls(img.resolve(img.exports[name]), image=img)

    def __call__(self, *args):
        f = self.func
        if len(args) != len(f.params):
            raise TypeError(f"{f.name} expects {len(f.params)} args, got {len(args)}")
        results = self._invoke(f, list(args))
        result = results[-1] if results else None
        if f.results and f.results[0] in (F64, F32):
            return float(result)
        return result

    def _invoke(self, f: WasmFunc, args: list) -> list:
        locals_: list = []
        for vt, a in zip(f.params, args):
            if vt == F64:
                locals_.append(float(a))
            elif vt == F32:
                locals_.append(_f32(float(a)))
            else:
                locals_.append(_wrap64(int(a)))
        for vt in f.locals:
            locals_.append(0.0 if vt in (F64, F32) else 0)

        stack: list = []
        # (kind, loop_start, end_pos) — kind: 'block' | 'loop' | 'if'
        frames: list[tuple[str, int, int]] = []
        ctrl = self._ctrl_for(f)
        r = _Reader(f.body)
        push = stack.append
        pop = stack.pop
        while True:
            op_off = r.pos
            op = r.byte()
            if op == 0x0B:  # end: of a structured block, or the body
                if frames:
                    frames.pop()
                    continue
                break
            elif op == 0x02:  # block (void)
                r.byte()
                frames.append(("block", op_off, ctrl[op_off][0]))
            elif op == 0x03:  # loop (void)
                r.byte()
                frames.append(("loop", op_off, ctrl[op_off][0]))
            elif op == 0x04:  # if (void)
                r.byte()
                end_pos, else_pos = ctrl[op_off]
                if pop():
                    frames.append(("if", op_off, end_pos))
                elif else_pos is not None:
                    r.pos = else_pos + 1
                    frames.append(("if", op_off, end_pos))
                else:
                    r.pos = end_pos + 1  # skip the whole if, no frame
            elif op == 0x05:  # else: then-branch finished -> its end
                r.pos = frames[-1][2]  # the main loop pops at the end op
            elif op in (0x0C, 0x0D):  # br / br_if
                depth = r.uleb()
                if op == 0x0D and not pop():
                    continue
                if depth >= len(frames):  # branch to the function label
                    frames.clear()
                    break
                kind, start, end_pos = frames[len(frames) - 1 - depth]
                del frames[len(frames) - 1 - depth :]
                if kind == "loop":
                    r.pos = start  # re-execute the loop op: fresh frame
                else:
                    r.pos = end_pos + 1  # past the end; frame already gone
            elif op == 0x0F:  # return
                break
            elif op == 0x01:  # nop
                pass
            elif op == 0x20:  # local.get
                push(locals_[r.uleb()])
            elif op == 0x21:  # local.set
                locals_[r.uleb()] = pop()
            elif op == 0x22:  # local.tee
                locals_[r.uleb()] = stack[-1]
            elif op == 0x1B:  # select
                c = pop()
                b = pop()
                a = pop()
                push(a if c else b)
            elif op == 0x42:  # i64.const
                push(r.sleb())
            elif op == 0x44:  # f64.const
                push(struct.unpack("<d", r.take(8))[0])
            elif op == 0x7C:  # i64.add
                b = pop(); push(_wrap64(pop() + b))
            elif op == 0x7D:  # i64.sub
                b = pop(); push(_wrap64(pop() - b))
            elif op == 0x7E:  # i64.mul
                b = pop(); push(_wrap64(pop() * b))
            elif op == 0x7F:  # i64.div_s
                b = pop(); push(_wrap64(_trunc_div(pop(), b)))
            elif op == 0x81:  # i64.rem_s
                b = pop(); push(_trunc_rem(pop(), b))
            elif op == 0x83:  # i64.and
                b = pop(); push(_wrap64(pop() & b))
            elif op == 0x84:  # i64.or
                b = pop(); push(_wrap64(pop() | b))
            elif op == 0x85:  # i64.xor
                b = pop(); push(_wrap64(pop() ^ b))
            elif op == 0x86:  # i64.shl
                b = pop() & 63; push(_wrap64(pop() << b))
            elif op == 0x87:  # i64.shr_s
                b = pop() & 63; push(pop() >> b)
            elif op == 0x88:  # i64.shr_u
                b = pop() & 63; push(_wrap64((pop() & (_U64 - 1)) >> b))
            elif op == 0x50:  # i64.eqz
                push(1 if pop() == 0 else 0)
            elif op == 0x51:  # i64.eq
                b = pop(); push(1 if pop() == b else 0)
            elif op == 0x52:  # i64.ne
                b = pop(); push(1 if pop() != b else 0)
            elif op == 0x53:  # i64.lt_s
                b = pop(); push(1 if pop() < b else 0)
            elif op == 0x55:  # i64.gt_s
                b = pop(); push(1 if pop() > b else 0)
            elif op == 0x57:  # i64.le_s
                b = pop(); push(1 if pop() <= b else 0)
            elif op == 0x59:  # i64.ge_s
                b = pop(); push(1 if pop() >= b else 0)
            elif op == 0xA0:  # f64.add
                b = pop(); push(pop() + b)
            elif op == 0xA1:  # f64.sub
                b = pop(); push(pop() - b)
            elif op == 0xA2:  # f64.mul
                b = pop(); push(pop() * b)
            elif op == 0xA3:  # f64.div
                b = pop(); push(pop() / b)
            elif op == 0x99:  # f64.abs
                push(abs(pop()))
            elif op == 0x9A:  # f64.neg
                push(-pop())
            elif op == 0x9F:  # f64.sqrt
                push(pop() ** 0.5)
            elif op == 0xA4:  # f64.min
                b = pop(); a = pop(); push(min(a, b))
            elif op == 0xA5:  # f64.max
                b = pop(); a = pop(); push(max(a, b))
            elif op == 0xB9:  # f64.convert_i64_s
                push(float(pop()))
            elif op == 0xB0:  # i64.trunc_f64_s
                push(_wrap64(int(pop())))
            elif op == 0x41:  # i32.const
                push(_wrap32(r.sleb()))
            elif op == 0x6A:  # i32.add
                b = pop(); push(_wrap32(pop() + b))
            elif op == 0x6B:  # i32.sub
                b = pop(); push(_wrap32(pop() - b))
            elif op == 0x6C:  # i32.mul
                b = pop(); push(_wrap32(pop() * b))
            elif op == 0x71:  # i32.and
                b = pop(); push(_wrap32(pop() & b))
            elif op == 0x72:  # i32.or
                b = pop(); push(_wrap32(pop() | b))
            elif op == 0x73:  # i32.xor
                b = pop(); push(_wrap32(pop() ^ b))
            elif op == 0x74:  # i32.shl
                b = pop() & 31; push(_wrap32(pop() << b))
            elif op == 0x75:  # i32.shr_s
                b = pop() & 31; push(pop() >> b)
            elif op == 0x76:  # i32.shr_u
                b = pop() & 31; push(_wrap32((pop() & (_U32 - 1)) >> b))
            elif op == 0x45:  # i32.eqz
                push(1 if pop() == 0 else 0)
            elif op == 0x46:  # i32.eq
                b = pop(); push(1 if pop() == b else 0)
            elif op == 0x47:  # i32.ne
                b = pop(); push(1 if pop() != b else 0)
            elif op == 0x48:  # i32.lt_s
                b = pop(); push(1 if pop() < b else 0)
            elif op == 0x49:  # i32.lt_u
                b = pop() & (_U32 - 1); push(1 if (pop() & (_U32 - 1)) < b else 0)
            elif op == 0x4A:  # i32.gt_s
                b = pop(); push(1 if pop() > b else 0)
            elif op == 0x4B:  # i32.gt_u
                b = pop() & (_U32 - 1); push(1 if (pop() & (_U32 - 1)) > b else 0)
            elif op == 0x4C:  # i32.le_s
                b = pop(); push(1 if pop() <= b else 0)
            elif op == 0x4E:  # i32.ge_s
                b = pop(); push(1 if pop() >= b else 0)
            elif op == 0x4F:  # i32.ge_u
                b = pop() & (_U32 - 1); push(1 if (pop() & (_U32 - 1)) >= b else 0)
            elif op == 0xAC:  # i64.extend_i32_s
                push(_wrap64(pop()))
            elif op == 0xAD:  # i64.extend_i32_u
                push(pop() & (_U32 - 1))
            elif op == 0xA7:  # i32.wrap_i64
                push(_wrap32(pop()))
            elif op in _LOAD_SPEC or op in _STORE_SPEC or op in (0x2A, 0x2B, 0x38, 0x39):
                # loads/stores: immediates are (align, offset); every
                # access is bounds-checked against the CURRENT memory —
                # OOB traps like wasmtime (reference MemoryCapacity
                # bounds-check) instead of Python's silent short slice
                r.uleb()
                moff = r.uleb()
                mem = self.memory
                if mem is None:
                    raise NotImplementedError(
                        "memory opcode in a module with no memory section"
                    )
                if op in _STORE_SPEC:
                    v = pop(); addr = (pop() & (_U32 - 1)) + moff
                    size = _STORE_SPEC[op]
                elif op in (0x38, 0x39):  # f32.store / f64.store
                    v = pop(); addr = (pop() & (_U32 - 1)) + moff
                    size = 4 if op == 0x38 else 8
                else:
                    v = None; addr = (pop() & (_U32 - 1)) + moff
                    size = (
                        4 if op == 0x2A else 8 if op == 0x2B else _LOAD_SPEC[op][0]
                    )
                if addr + size > len(mem):
                    raise WasmTrap(
                        f"out of bounds memory access (addr={addr}, "
                        f"size={size}, memory={len(mem)} bytes)"
                    )
                if op in _STORE_SPEC:
                    mem[addr : addr + size] = (
                        v & ((1 << (8 * size)) - 1)
                    ).to_bytes(size, "little")
                elif op == 0x39:  # f64.store
                    mem[addr : addr + 8] = struct.pack("<d", v)
                elif op == 0x38:  # f32.store
                    mem[addr : addr + 4] = struct.pack("<f", v)
                elif op == 0x2B:  # f64.load
                    push(struct.unpack("<d", bytes(mem[addr : addr + 8]))[0])
                elif op == 0x2A:  # f32.load
                    push(struct.unpack("<f", bytes(mem[addr : addr + 4]))[0])
                else:
                    _, signed = _LOAD_SPEC[op]
                    push(
                        int.from_bytes(
                            bytes(mem[addr : addr + size]), "little", signed=signed
                        )
                    )
            elif op == 0x10:  # call (module function index space)
                idx = r.uleb()
                if self.image is None:
                    raise NotImplementedError(
                        f"call to function index {idx} unavailable "
                        "(constructed without a module image)"
                    )
                target = self.image.resolve(idx)
                n = len(target.params)
                cargs = stack[len(stack) - n :] if n else []
                if n:
                    del stack[len(stack) - n :]
                stack.extend(self._invoke(target, cargs))
            elif op == 0x11:  # call_indirect via funcref table 0
                type_idx = r.uleb()
                r.uleb()  # table index (0 in MVP)
                i = pop()
                img = self.image
                if img is None:
                    raise NotImplementedError(
                        "call_indirect without a module image"
                    )
                if not (0 <= i < len(img.table)) or img.table[i] is None:
                    raise WasmTrap(f"undefined table element {i}")
                target = img.resolve(img.table[i])
                if (target.params, target.results) != img.types[type_idx]:
                    raise WasmTrap(
                        f"indirect call type mismatch at table element {i}"
                    )
                n = len(target.params)
                cargs = stack[len(stack) - n :] if n else []
                if n:
                    del stack[len(stack) - n :]
                stack.extend(self._invoke(target, cargs))
            elif op == 0x23:  # global.get
                push(self.globals_[r.uleb()])
            elif op == 0x24:  # global.set
                self.globals_[r.uleb()] = pop()
            elif op == 0x0E:  # br_table
                n = r.uleb()
                depths = [r.uleb() for _ in range(n)]
                default = r.uleb()
                i = pop()
                depth = depths[i] if 0 <= i < n else default
                if depth >= len(frames):
                    frames.clear()
                    break
                kind, start, end_pos = frames[len(frames) - 1 - depth]
                del frames[len(frames) - 1 - depth :]
                r.pos = start if kind == "loop" else end_pos + 1
            elif op == 0x3F:  # memory.size
                r.byte()
                push(0 if self.memory is None else len(self.memory) // _PAGE)
            elif op == 0x40:  # memory.grow (capped: declared max under
                # the host's 256-page arena, like the reference's
                # preallocated guest memory — past the cap returns -1)
                r.byte()
                n = pop()
                if self.memory is None:
                    push(-1)
                else:
                    old = len(self.memory) // _PAGE
                    if n < 0 or old + n > self._page_cap:
                        push(-1)
                    else:
                        self.memory.extend(bytes(n * _PAGE))
                        push(old)
            elif op == 0x6D:  # i32.div_s
                b = pop(); push(_wrap32(_trunc_div(pop(), b)))
            elif op == 0x6E:  # i32.div_u
                b = pop() & (_U32 - 1); a = pop() & (_U32 - 1)
                if b == 0:
                    raise ZeroDivisionError("wasm i32.div_u by zero")
                push(_wrap32(a // b))
            elif op == 0x6F:  # i32.rem_s
                b = pop(); push(_wrap32(_trunc_rem(pop(), b)))
            elif op == 0x70:  # i32.rem_u
                b = pop() & (_U32 - 1); a = pop() & (_U32 - 1)
                if b == 0:
                    raise ZeroDivisionError("wasm i32.rem_u by zero")
                push(_wrap32(a % b))
            elif op == 0x67:  # i32.clz
                v = pop() & (_U32 - 1); push(32 - v.bit_length())
            elif op == 0x68:  # i32.ctz
                v = pop() & (_U32 - 1)
                push(32 if v == 0 else (v & -v).bit_length() - 1)
            elif op == 0x69:  # i32.popcnt
                push((pop() & (_U32 - 1)).bit_count())
            elif op == 0x77:  # i32.rotl
                b = pop() & 31; a = pop() & (_U32 - 1)
                push(_wrap32((a << b) | (a >> (32 - b))) if b else _wrap32(a))
            elif op == 0x78:  # i32.rotr
                b = pop() & 31; a = pop() & (_U32 - 1)
                push(_wrap32((a >> b) | (a << (32 - b))) if b else _wrap32(a))
            elif op == 0x4D:  # i32.le_u
                b = pop() & (_U32 - 1); push(1 if (pop() & (_U32 - 1)) <= b else 0)
            elif op == 0x80:  # i64.div_u
                b = pop() & (_U64 - 1); a = pop() & (_U64 - 1)
                if b == 0:
                    raise ZeroDivisionError("wasm i64.div_u by zero")
                push(_wrap64(a // b))
            elif op == 0x82:  # i64.rem_u
                b = pop() & (_U64 - 1); a = pop() & (_U64 - 1)
                if b == 0:
                    raise ZeroDivisionError("wasm i64.rem_u by zero")
                push(_wrap64(a % b))
            elif op == 0x79:  # i64.clz
                v = pop() & (_U64 - 1); push(64 - v.bit_length())
            elif op == 0x7A:  # i64.ctz
                v = pop() & (_U64 - 1)
                push(64 if v == 0 else (v & -v).bit_length() - 1)
            elif op == 0x7B:  # i64.popcnt
                push((pop() & (_U64 - 1)).bit_count())
            elif op == 0x89:  # i64.rotl
                b = pop() & 63; a = pop() & (_U64 - 1)
                push(_wrap64((a << b) | (a >> (64 - b))) if b else _wrap64(a))
            elif op == 0x8A:  # i64.rotr
                b = pop() & 63; a = pop() & (_U64 - 1)
                push(_wrap64((a >> b) | (a << (64 - b))) if b else _wrap64(a))
            elif op == 0x54:  # i64.lt_u
                b = pop() & (_U64 - 1); push(1 if (pop() & (_U64 - 1)) < b else 0)
            elif op == 0x56:  # i64.gt_u
                b = pop() & (_U64 - 1); push(1 if (pop() & (_U64 - 1)) > b else 0)
            elif op == 0x58:  # i64.le_u
                b = pop() & (_U64 - 1); push(1 if (pop() & (_U64 - 1)) <= b else 0)
            elif op == 0x5A:  # i64.ge_u
                b = pop() & (_U64 - 1); push(1 if (pop() & (_U64 - 1)) >= b else 0)
            elif op == 0x61:  # f64.eq
                b = pop(); push(1 if pop() == b else 0)
            elif op == 0x62:  # f64.ne
                b = pop(); push(1 if pop() != b else 0)
            elif op == 0x63:  # f64.lt
                b = pop(); push(1 if pop() < b else 0)
            elif op == 0x64:  # f64.gt
                b = pop(); push(1 if pop() > b else 0)
            elif op == 0x65:  # f64.le
                b = pop(); push(1 if pop() <= b else 0)
            elif op == 0x66:  # f64.ge
                b = pop(); push(1 if pop() >= b else 0)
            elif op == 0x9B:  # f64.ceil
                push(float(math.ceil(pop())))
            elif op == 0x9C:  # f64.floor
                push(float(math.floor(pop())))
            elif op == 0x9D:  # f64.trunc
                push(float(math.trunc(pop())))
            elif op == 0xB7:  # f64.convert_i32_s
                push(float(pop()))
            elif op == 0xB8:  # f64.convert_i32_u
                push(float(pop() & (_U32 - 1)))
            elif op == 0xBA:  # f64.convert_i64_u
                push(float(pop() & (_U64 - 1)))
            elif op == 0xAA:  # i32.trunc_f64_s
                push(_wrap32(int(pop())))
            elif op == 0x43:  # f32.const
                push(struct.unpack("<f", r.take(4))[0])
            elif op in (0x5B, 0x5C, 0x5D, 0x5E, 0x5F, 0x60):  # f32 cmps
                b = pop(); a = pop()
                push(
                    1
                    if {
                        0x5B: a == b, 0x5C: a != b, 0x5D: a < b,
                        0x5E: a > b, 0x5F: a <= b, 0x60: a >= b,
                    }[op]
                    else 0
                )
            elif op == 0x8B:  # f32.abs
                push(_f32(abs(pop())))
            elif op == 0x8C:  # f32.neg
                push(_f32(-pop()))
            elif op == 0x8D:  # f32.ceil
                push(_f32(math.ceil(pop())))
            elif op == 0x8E:  # f32.floor
                push(_f32(math.floor(pop())))
            elif op == 0x8F:  # f32.trunc
                push(_f32(math.trunc(pop())))
            elif op == 0x90:  # f32.nearest (ties to even, like round())
                push(_f32(round(pop())))
            elif op == 0x91:  # f32.sqrt
                push(_f32(pop() ** 0.5))
            elif op == 0x92:  # f32.add
                b = pop(); push(_f32(pop() + b))
            elif op == 0x93:  # f32.sub
                b = pop(); push(_f32(pop() - b))
            elif op == 0x94:  # f32.mul
                b = pop(); push(_f32(pop() * b))
            elif op == 0x95:  # f32.div
                b = pop(); push(_f32(pop() / b))
            elif op == 0x96:  # f32.min
                b = pop(); a = pop(); push(_f32(min(a, b)))
            elif op == 0x97:  # f32.max
                b = pop(); a = pop(); push(_f32(max(a, b)))
            elif op == 0x98:  # f32.copysign
                b = pop(); push(_f32(math.copysign(pop(), b)))
            elif op == 0x9E:  # f64.nearest
                push(float(round(pop())))
            elif op == 0xA6:  # f64.copysign
                b = pop(); push(math.copysign(pop(), b))
            elif op == 0xB2:  # f32.convert_i32_s
                push(_f32(float(pop())))
            elif op == 0xB3:  # f32.convert_i32_u
                push(_f32(float(pop() & (_U32 - 1))))
            elif op == 0xB4:  # f32.convert_i64_s
                push(_f32(float(pop())))
            elif op == 0xB5:  # f32.convert_i64_u
                push(_f32(float(pop() & (_U64 - 1))))
            elif op == 0xB6:  # f32.demote_f64
                push(_f32(pop()))
            elif op == 0xBB:  # f64.promote_f32
                push(float(pop()))
            elif op == 0xA8:  # i32.trunc_f32_s
                push(_wrap32(int(pop())))
            elif op == 0xA9:  # i32.trunc_f32_u
                push(_wrap32(int(pop()) & (_U32 - 1)))
            elif op == 0xAE:  # i64.trunc_f32_s
                push(_wrap64(int(pop())))
            elif op == 0xAF:  # i64.trunc_f32_u
                push(_wrap64(int(pop()) & (_U64 - 1)))
            elif op == 0xAB:  # i32.trunc_f64_u
                push(_wrap32(int(pop()) & (_U32 - 1)))
            elif op == 0xB1:  # i64.trunc_f64_u
                push(_wrap64(int(pop()) & (_U64 - 1)))
            elif op == 0xBC:  # i32.reinterpret_f32
                push(_wrap32(int.from_bytes(struct.pack("<f", pop()), "little")))
            elif op == 0xBD:  # i64.reinterpret_f64
                push(_wrap64(int.from_bytes(struct.pack("<d", pop()), "little")))
            elif op == 0xBE:  # f32.reinterpret_i32
                push(struct.unpack("<f", (pop() & (_U32 - 1)).to_bytes(4, "little"))[0])
            elif op == 0xBF:  # f64.reinterpret_i64
                push(struct.unpack("<d", (pop() & (_U64 - 1)).to_bytes(8, "little"))[0])
            else:
                raise NotImplementedError(
                    f"wasm opcode 0x{op:02x} outside the scalar-UDF profile"
                )
        n_res = len(f.results)
        return stack[len(stack) - n_res :] if n_res else []

    def signature(self) -> str:
        p = ", ".join(_VALTYPE_NAMES.get(t, hex(t)) for t in self.func.params)
        res = ", ".join(_VALTYPE_NAMES.get(t, hex(t)) for t in self.func.results)
        return f"{self.func.name}({p}) -> ({res})"


# ---------------------------------------------------------------------------
# vectorized compilation — the scale path
# ---------------------------------------------------------------------------
#
# Per-row interpretation is the UDF slow path Spark docs warn about. A
# wasm body is a pure dataflow over its locals, so we can symbolically
# execute it with numpy arrays on the stack instead of scalars and get
# a whole-batch kernel: i64 ops run in uint64 (C wrap-around == wasm
# wrap-around), signed views where sign matters, `select` becomes
# np.where. Structured control flow — block/loop/if with VOID block
# types plus br/br_if, the exact shape LLVM emits for -O2 scalar
# functions (fib_wrap/popcount64 in functions/guests/splitmix_guest.rs)
# — runs SIMT-style under a lane mask: a taken branch deactivates its
# lanes and parks them on the target label; a loop re-runs its body
# until no lane takes the back-edge, exited lanes riding along masked.
# ~100x over the scalar interpreter on Arrow-sized batches; semantics
# pinned equal by tests/test_wasm.py.

#: opcodes the vectorized tier executes. Membership is validated
#: STATICALLY before a kernel is built, so tier selection happens at
#: compile time — a masked executor must never discover an unsupported
#: opcode mid-job on a control path the 1-element probe didn't reach.
_VEC_OPS = frozenset(
    {
        0x02, 0x03, 0x04, 0x05, 0x0B, 0x0C, 0x0D,        # structured control
        0x1A, 0x1B, 0x20, 0x21, 0x22,                     # drop/select/locals
        0x41, 0x42, 0x44,                                 # consts
        0x45, 0x46, 0x47, 0x71, 0x72, 0x73,               # i32 eqz/eq/ne, bitwise
        0x48, 0x49, 0x4A, 0x4B, 0x4C, 0x4D, 0x4E, 0x4F,   # i32 ordered cmps
        0x6A, 0x6B, 0x6C, 0x74, 0x75, 0x76,               # i32 alu/shifts
        0xA7, 0xAC, 0xAD,                                 # i32 <-> i64
        0x50, 0x51, 0x52, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A,
        0x7C, 0x7D, 0x7E, 0x7F, 0x80, 0x81, 0x82,         # i64 arithmetic
        0x83, 0x84, 0x85, 0x86, 0x87, 0x88,               # i64 bitwise/shifts
        0x99, 0x9A, 0x9F, 0xA0, 0xA1, 0xA2, 0xA3, 0xA4, 0xA5,  # f64
        0xB0, 0xB9,                                        # f64 <-> i64
        0x43, 0x8B, 0x8C, 0x91, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97,  # f32
        0xB6, 0xBB,                                        # f32 <-> f64
    }
)

#: runaway-guest guard: max re-entries of one loop frame per batch.
#: A counted loop converges in <= the max lane trip count (popcount64:
#: 64; the 8x-unrolled fib_wrap: 13); anything near this cap is a
#: non-terminating guest and traps like wasmtime's fuel mechanism.
_VEC_MAX_LOOP_ITERS = 65_536


def _validate_vectorizable(
    body: bytes,
    allow_loads: bool = False,
    allow_indirect: bool = False,
    types: tuple = (),
    allow_call: bool = False,
) -> tuple[bool, list[int]]:
    """Static profile check for :func:`compile_vectorized`.

    Raises NotImplementedError naming the first out-of-profile
    construct: non-void block types, br/br_if targeting the function
    label (early return), br_table, memory STORES (per-lane write
    order is undefined under a mask), or any opcode outside
    ``_VEC_OPS``. Memory LOADS are allowed only when the caller
    supplies a readable memory image (the module's static data image,
    or per-lane row memory); ``call_indirect`` only when the module
    carries a funcref table (whose every target the caller validates
    too); direct ``call`` only when a module image can resolve the
    target (validated transitively too). Returns ``(has_indirect,
    direct_call_targets)``.
    """
    r = _Reader(body)
    depth = 0
    has_indirect = False
    call_targets: list[int] = []
    while not r.eof():
        op = r.byte()
        if op in _BLOCK_OPS:  # block / loop / if
            if r.byte() != _VOID_BT:
                raise NotImplementedError(
                    "wasm non-void block types not vectorizable in this profile"
                )
            depth += 1
        elif op == 0x0B:
            if depth:
                depth -= 1
        elif op in (0x0C, 0x0D):  # br / br_if
            if r.uleb() >= depth:
                raise NotImplementedError(
                    "wasm br targeting the function label (early return) "
                    "not vectorizable in this profile"
                )
        elif op in _LOAD_SPEC and allow_loads:  # read-only gathers
            r.uleb()
            r.uleb()
        elif op == 0x10 and allow_call:  # direct call, resolved statically
            call_targets.append(r.uleb())
        elif op == 0x11 and allow_indirect:  # lane-dispatched call_indirect
            tidx = r.uleb()
            r.uleb()
            if tidx < len(types) and not types[tidx][1]:
                # A void-result indirect call would desync the operand
                # stack in the vectorized executor (the live==0 branch
                # pushes a zeros placeholder, the dispatch branch pushes
                # the callee's None) — decline to the scalar tier.
                raise NotImplementedError(
                    "wasm call_indirect with a void-result signature "
                    "not vectorizable in this profile"
                )
            has_indirect = True
        elif op not in _VEC_OPS:
            raise NotImplementedError(
                f"wasm opcode 0x{op:02x} not vectorizable in this profile"
            )
        elif op in (0x20, 0x21, 0x22):
            r.uleb()
        elif op in (0x41, 0x42):
            r.sleb()
        elif op == 0x43:
            r.take(4)
        elif op == 0x44:
            r.take(8)
    return has_indirect, call_targets


def _validate_vectorizable_tree(
    func: WasmFunc, image: "ModuleImage | None", allow_loads: bool
) -> None:
    """Validate ``func`` AND every statically-known callee — direct
    ``call`` immediates and (if it uses call_indirect) every non-null
    funcref-table target, transitively — the table is static, so the
    possible callee set is known at compile time and the whole tree
    either vectorizes or the export declines to another tier."""
    allow_indirect = image is not None and bool(image.table)
    allow_call = image is not None
    types = image.types if image is not None else ()
    visited: set[bytes] = set()

    def walk(f: WasmFunc) -> None:
        if f.body in visited:
            return
        visited.add(f.body)
        has_indirect, call_targets = _validate_vectorizable(
            f.body, allow_loads, allow_indirect, types, allow_call
        )
        for t in call_targets:
            walk(image.resolve(t))
        if has_indirect:
            for t in image.table:
                if t is not None:
                    walk(image.resolve(t))

    walk(func)


def compile_vectorized(
    func: WasmFunc,
    image: "ModuleImage | None" = None,
    row_memory: bool = False,
):
    """Build a numpy batch kernel for a structured body.

    Returns ``kernel(*arrays) -> array``: i64 params/results use
    int64 arrays (two's-complement), f32/f64 use floats. Raises
    NotImplementedError at BUILD time for bodies outside the profile
    (see :func:`_validate_vectorizable_tree`) — callers fall back to
    wasmtime / the scalar interpreter.

    ``image``: the parsed module image, enabling three more constructs:

    - linear-memory LOADS become numpy GATHERS against the module's
      STATIC memory (data segments only — the profile admits no
      stores/grow, so the image is immutable and identical across
      lanes; the shape of LUT guests like
      functions/guests/table_guest.rs). OOB on any active lane traps.
    - direct ``call`` runs the (statically-resolved) callee's body
      under the caller's lane mask — the intra-module helper shape
      every compiled guest has (wasm_modules.TOKENIZER_MODULE).
    - ``call_indirect`` over the (static) funcref table dispatches
      per lane: each distinct selector value among the active lanes
      runs its callee's body once under the sub-mask, results merged
      with np.where — the vectorized rendering of the trait-object /
      fn-pointer shape (functions/guests/dispatch_guest.rs,
      wasm_modules.ROUTE_MODULE). Type mismatch / null / OOB entries
      trap exactly like the scalar tier and wasmtime.

    ``row_memory=True`` builds the BYTE-STREAM kernel instead (round-5
    verdict task #3): the export must be the host calling convention
    ``(ptr: i32, len: i32) -> value``, and the returned kernel's
    signature is ``kernel(mat, lens)`` where ``mat`` is an (n_lanes,
    width) uint8 matrix — one row per lane holding that lane's record
    bytes at offset 0 — and ``lens`` the per-lane byte counts. Memory
    LOADS gather PER LANE (``mat[lane, addr]``), so each lane scans
    its own record under the masked-lane loop machinery and the whole
    Arrow batch advances one byte-position per loop iteration instead
    of one interpreter opcode per row. Semantics: each lane sees a
    fresh zero page carrying the module's data segments overlaid with
    its record bytes (the per-instance contract; the per-row scalar
    tier reuses one memory across rows, so a guest reading past its
    input is out of contract on both tiers). Reads past the matrix
    return 0 up to the page cap and trap beyond it, like the scalar
    tier's page-aligned zero growth.
    """
    import numpy as np

    mem_img = None
    if image is not None and image.memory_pages and not row_memory:
        mem_img = np.zeros(image.memory_pages * _PAGE, np.uint8)
        for off, data in image.data_segments:
            if off + len(data) > mem_img.size:
                raise WasmTrap("data segment out of bounds")
            mem_img[off : off + len(data)] = np.frombuffer(data, np.uint8)
    if row_memory:
        if image is None or not image.memory_pages:
            raise NotImplementedError(
                "row-memory vectorization needs a module with linear memory"
            )
        if tuple(func.params) != (I32, I32) or len(func.results) != 1:
            raise NotImplementedError(
                "row-memory vectorization needs a (ptr: i32, len: i32) -> "
                "value export"
            )
    _validate_vectorizable_tree(
        func, image, allow_loads=mem_img is not None or row_memory
    )
    # per-call mutable state for the row-memory tier: the 2D byte
    # matrix, the lane index vector, the OOB trap cap, and the loop
    # budget (>= the widest record, so a byte-per-iteration scan of a
    # long record is not mistaken for a runaway guest)
    mem_mode: dict = {
        "mat": None,
        "lanes": None,
        "cap": 0,
        "max_iters": _VEC_MAX_LOOP_ITERS,
    }
    ctrl_cache: dict[bytes, dict] = {}

    def ctrl_for(f: WasmFunc) -> dict:
        c = ctrl_cache.get(f.body)
        if c is None:
            c = ctrl_cache[f.body] = _scan_control(f.body)
        return c

    def zeros_for(vt, n):
        if vt == F64:
            return np.zeros(n, np.float64)
        if vt == F32:
            return np.zeros(n, np.float32)
        return np.zeros(n, np.uint64)

    # All i64 stack values are uint64 ndarrays or np.uint64 scalars —
    # never Python ints (mixing those with uint64 promotes to float64
    # on numpy<2 and would silently lose precision).
    def _u(v):  # uint64 domain for wrap-correct i64 arithmetic
        if isinstance(v, np.ndarray):
            return v.view(np.uint64)
        if isinstance(v, np.uint64):
            return v
        return np.uint64(int(v) & (_U64 - 1))

    def _s(v):  # signed reinterpretation for comparisons / signed shifts
        if isinstance(v, np.ndarray):
            return v.view(np.int64)
        return np.uint64(v).astype(np.int64)  # C cast: bit pattern kept

    def run(f: WasmFunc, locals_: list, entry_active, n: int, all_true, depth: int):
        """Execute one function body over full-lane arrays under the
        ``entry_active`` mask; returns the raw result value (uint64 /
        float32 / float64 array or scalar). Recursion = call_indirect."""
        if depth > 64:
            raise WasmTrap("vectorized call depth exceeded 64")
        ctrl = ctrl_for(f)

        # --- SIMT lane-mask machinery -------------------------------
        # ``active`` is the bool mask of lanes executing the current
        # instruction. It is only ever REASSIGNED (mask arrays are
        # never mutated in place), so ``all_true`` doubles as a cheap
        # identity sentinel: straight-line bodies never leave it and
        # pay zero masking overhead. ``frames`` holds the enclosing
        # block/loop/if labels (innermost last); a branch parks its
        # lanes on the target frame's ``pending`` mask, and those
        # lanes rejoin where wasm says they do — a block's end, a
        # loop's header, an if's end.
        active = entry_active
        frames: list[dict] = []

        def lanes(cond):
            """Normalize a (possibly scalar) wasm condition to a mask."""
            c = np.asarray(cond) != 0
            if c.ndim == 0:
                return all_true if bool(c) else np.zeros(n, bool)
            return c

        def set_local(i, v):
            if active is all_true:
                locals_[i] = v
            else:
                locals_[i] = np.where(active, v, locals_[i])

        def div_guard(b, one):
            """Active-lane zero check; inactive lanes' divisors are
            replaced so masked-out garbage can't fault the batch."""
            bz = np.asarray(b == 0)
            if bz.ndim == 0:
                if bool(bz) and (active is all_true or active.any()):
                    raise ZeroDivisionError("wasm i64 div/rem by zero")
                return b
            if np.any(bz if active is all_true else (bz & active)):
                raise ZeroDivisionError("wasm i64 div/rem by zero")
            return np.where(bz, one, b) if bz.any() else b

        def fast_forward(r):
            """No lane active: jump to the innermost offset where lanes
            can rejoin — the else arm of an if (so its lanes get
            swapped in), else the construct's end."""
            fr = frames[-1]
            if (
                fr["kind"] == "if"
                and fr["else_mask"] is not None
                and fr["else_off"] is not None
                and r.pos <= fr["else_off"]
            ):
                r.pos = fr["else_off"]
            else:
                r.pos = fr["end_off"]

        stack: list = []
        push = stack.append
        pop = stack.pop
        r = _Reader(f.body)
        with np.errstate(over="ignore"):
            while True:
                op = r.byte()
                if op == 0x0B:  # end of function / block / loop / if
                    if not frames:
                        break
                    fr = frames.pop()
                    if fr["kind"] == "loop":
                        exited = fr["exited"]
                        if active.any():
                            exited = active if exited is None else exited | active
                        pend = fr["pending"]
                        if pend is not None and pend.any():
                            fr["iters"] += 1
                            if fr["iters"] > mem_mode["max_iters"]:
                                raise WasmTrap(
                                    "vectorized loop exceeded "
                                    f"{mem_mode['max_iters']} iterations"
                                )
                            fr["pending"] = None
                            fr["exited"] = exited
                            frames.append(fr)
                            active = pend
                            r.pos = fr["body_start"]
                            continue
                        active = exited if exited is not None else np.zeros(n, bool)
                    elif fr["kind"] == "block":
                        if fr["pending"] is not None:
                            active = active | fr["pending"]
                    else:  # if: rejoin arm survivors, skipped lanes, brs
                        for extra in (fr["then_mask"], fr["else_mask"], fr["pending"]):
                            if extra is not None:
                                active = active | extra
                    if frames and not active.any():
                        fast_forward(r)
                elif op == 0x02:  # block (void)
                    end_off, _els = ctrl[r.pos - 1]
                    r.byte()  # blocktype (validated void)
                    frames.append({"kind": "block", "end_off": end_off, "pending": None})
                elif op == 0x03:  # loop (void)
                    end_off, _els = ctrl[r.pos - 1]
                    r.byte()
                    frames.append(
                        {
                            "kind": "loop",
                            "end_off": end_off,
                            "body_start": r.pos,
                            "pending": None,
                            "exited": None,
                            "iters": 0,
                        }
                    )
                elif op == 0x04:  # if (void)
                    end_off, else_off = ctrl[r.pos - 1]
                    r.byte()
                    c = lanes(pop())
                    frames.append(
                        {
                            "kind": "if",
                            "end_off": end_off,
                            "else_off": else_off,
                            "pending": None,
                            "then_mask": None,
                            "else_mask": active & ~c,
                        }
                    )
                    active = active & c
                    if not active.any():
                        fast_forward(r)
                elif op == 0x05:  # else: park then-arm, run else-arm
                    fr = frames[-1]
                    fr["then_mask"] = active
                    active = fr["else_mask"]
                    fr["else_mask"] = None
                    if not active.any():
                        fast_forward(r)
                elif op == 0x0C:  # br
                    d = r.uleb()
                    fr = frames[-1 - d]
                    fr["pending"] = (
                        active if fr["pending"] is None else fr["pending"] | active
                    )
                    active = np.zeros(n, bool)
                    fast_forward(r)
                elif op == 0x0D:  # br_if
                    d = r.uleb()
                    c = lanes(pop())
                    br_m = active & c
                    if br_m.any():
                        fr = frames[-1 - d]
                        fr["pending"] = (
                            br_m if fr["pending"] is None else fr["pending"] | br_m
                        )
                        active = active & ~c
                        if not active.any():
                            fast_forward(r)
                elif op == 0x10:  # direct call: callee runs under the mask
                    fidx = r.uleb()
                    callee = image.resolve(fidx)
                    cargs = [pop() for _ in range(len(callee.params))][::-1]
                    loc = list(cargs)
                    for vt in callee.locals:
                        loc.append(zeros_for(vt, n))
                    res = run(callee, loc, active, n, all_true, depth + 1)
                    if callee.results:
                        push(res)
                elif op == 0x11:  # call_indirect: per-lane table dispatch
                    tidx = r.uleb()
                    r.uleb()  # table index (single-table MVP)
                    exp_params, exp_results = image.types[tidx]
                    sel = _u(pop()) & np.uint64(_U32 - 1)
                    args = [pop() for _ in range(len(exp_params))][::-1]

                    def dispatch_one(v: int, m):
                        if v >= len(image.table) or image.table[v] is None:
                            raise WasmTrap(
                                f"call_indirect: table index {v} out of "
                                "range or uninitialized"
                            )
                        callee = image.resolve(image.table[v])
                        if (
                            callee.params != exp_params
                            or callee.results != exp_results
                        ):
                            raise WasmTrap(
                                "call_indirect: callee signature does not "
                                "match the instruction's type"
                            )
                        loc = list(args)
                        for vt in callee.locals:
                            loc.append(zeros_for(vt, n))
                        return run(callee, loc, m, n, all_true, depth + 1)

                    sel_a = np.asarray(sel)
                    if sel_a.ndim == 0:  # uniform selector
                        push(dispatch_one(int(sel_a), active))
                    else:
                        live = sel_a[active] if active is not all_true else sel_a
                        if live.size == 0:
                            push(zeros_for(exp_results[0] if exp_results else I64, n))
                        else:
                            out = None
                            for v in np.unique(live):
                                m = sel_a == v
                                if active is not all_true:
                                    m = m & active
                                sub = dispatch_one(int(v), m)
                                out = sub if out is None else np.where(m, sub, out)
                            push(out)
                elif op == 0x20:
                    push(locals_[r.uleb()])
                elif op == 0x21:
                    set_local(r.uleb(), pop())
                elif op == 0x22:
                    set_local(r.uleb(), stack[-1])
                elif op == 0x1A:  # drop
                    pop()
                elif op == 0x1B:  # select
                    c = pop(); b = pop(); a = pop()
                    push(np.where(c != 0, a, b))
                elif op == 0x41:  # i32.const (low-32 value, zero-extended)
                    push(np.uint64(r.sleb() & (_U32 - 1)))
                elif op == 0x42:
                    push(np.uint64(r.sleb() & (_U64 - 1)))
                elif op == 0x43:  # f32.const
                    push(np.float32(struct.unpack("<f", r.take(4))[0]))
                elif op == 0x44:
                    push(np.float64(struct.unpack("<d", r.take(8))[0]))
                elif op == 0x45:  # i32.eqz
                    push(((_u(pop()) & np.uint64(_U32 - 1)) == 0).astype(np.uint64))
                elif op in (0x46, 0x47):  # i32.eq / i32.ne (low 32 bits)
                    b = _u(pop()) & np.uint64(_U32 - 1)
                    a = _u(pop()) & np.uint64(_U32 - 1)
                    push(((a == b) if op == 0x46 else (a != b)).astype(np.uint64))
                elif op in (0x49, 0x4B, 0x4D, 0x4F):  # i32 unsigned cmps
                    b = _u(pop()) & np.uint64(_U32 - 1)
                    a = _u(pop()) & np.uint64(_U32 - 1)
                    cmp = {
                        0x49: a < b, 0x4B: a > b, 0x4D: a <= b, 0x4F: a >= b,
                    }[op]
                    push(np.asarray(cmp).astype(np.uint64))
                elif op in (0x48, 0x4A, 0x4C, 0x4E):  # i32 signed cmps
                    sb32 = np.uint64(1 << 31)

                    def _s32(v):
                        # sign-extend the low 32 bits in the uint64
                        # domain, then reinterpret as int64
                        x = (_u(v) & np.uint64(_U32 - 1)) ^ sb32
                        x = x - sb32
                        if isinstance(x, np.ndarray):
                            return x.view(np.int64)
                        return np.uint64(x).astype(np.int64)

                    b = pop()
                    a = pop()
                    a_s, b_s = _s32(a), _s32(b)
                    cmp = {
                        0x48: a_s < b_s, 0x4A: a_s > b_s,
                        0x4C: a_s <= b_s, 0x4E: a_s >= b_s,
                    }[op]
                    push(np.asarray(cmp).astype(np.uint64))
                elif op in (0x71, 0x72, 0x73):  # i32.and / or / xor
                    b = _u(pop()); a = _u(pop())
                    v = {0x71: a & b, 0x72: a | b, 0x73: a ^ b}[op]
                    push(v & np.uint64(_U32 - 1))
                elif op in (0x6A, 0x6B, 0x6C):  # i32.add / sub / mul (wrap 32)
                    b = _u(pop()); a = _u(pop())
                    v = {0x6A: a + b, 0x6B: a - b, 0x6C: a * b}[op]
                    push(v & np.uint64(_U32 - 1))
                elif op == 0x74:  # i32.shl
                    b = pop()
                    push((_u(pop()) << (_u(b) & np.uint64(31))) & np.uint64(_U32 - 1))
                elif op == 0x75:  # i32.shr_s (arithmetic on low-32 signed view)
                    b = pop()
                    a32 = ((_u(pop()) & np.uint64(_U32 - 1))
                           ^ np.uint64(1 << 31)) - np.uint64(1 << 31)
                    shifted = a32.view(np.int64) if isinstance(a32, np.ndarray) \
                        else np.uint64(a32).astype(np.int64)
                    shifted = shifted >> (_s(b) & np.int64(31))
                    push(np.asarray(shifted).view(np.uint64) & np.uint64(_U32 - 1))
                elif op == 0x76:  # i32.shr_u
                    b = pop()
                    push((_u(pop()) & np.uint64(_U32 - 1)) >> (_u(b) & np.uint64(31)))
                elif op == 0xA7:  # i32.wrap_i64
                    push(_u(pop()) & np.uint64(_U32 - 1))
                elif op == 0xAD:  # i64.extend_i32_u
                    push(_u(pop()) & np.uint64(_U32 - 1))
                elif op == 0xAC:  # i64.extend_i32_s (sign-extend low 32)
                    v = _u(pop()) & np.uint64(_U32 - 1)
                    push((v ^ np.uint64(1 << 31)) - np.uint64(1 << 31))
                elif op in _LOAD_SPEC:  # read-only gather (static or per-lane)
                    r.uleb()  # align hint
                    moff = r.uleb()
                    width, signed = _LOAD_SPEC[op]
                    to32 = op in (0x28, 0x2C, 0x2D, 0x2E, 0x2F)
                    ea = (_u(pop()) & np.uint64(_U32 - 1)) + np.uint64(moff)
                    mat = mem_mode["mat"]
                    if mat is not None:  # per-lane row memory
                        ea_arr = np.asarray(ea)
                        if ea_arr.ndim == 0:
                            ea_arr = np.full(n, ea, np.uint64)
                        if active is not all_true:
                            # masked-out lanes may carry garbage addresses
                            ea_arr = np.where(active, ea_arr, np.uint64(0))
                        idx = ea_arr.astype(np.int64)
                        wp = mat.shape[1]
                        oob = idx + width > wp
                        if oob.any():
                            # beyond the matrix but under the page cap
                            # the (zero-filled) page reads 0; the matrix
                            # carries >= 8 zero-padded columns past any
                            # written byte, so a whole-width zero is
                            # exact. Past the cap traps like the scalar
                            # tier's bounds check.
                            if int(ea_arr.max()) + width > mem_mode["cap"]:
                                raise WasmTrap(
                                    f"wasm memory OOB load (+{width}) in "
                                    "vectorized row-memory tier"
                                )
                            idx = np.where(oob, 0, idx)
                        lanes_ix = mem_mode["lanes"]
                        val = np.zeros(n, np.uint64)
                        for k in range(width):
                            val |= mat[lanes_ix, idx + k].astype(np.uint64) << np.uint64(8 * k)
                        if oob.any():
                            val = np.where(oob, np.uint64(0), val)
                    elif isinstance(ea, np.ndarray) and ea.ndim:
                        if active is not all_true:
                            # masked-out lanes may carry garbage addresses
                            ea = np.where(active, ea, np.uint64(0))
                        if int(ea.max()) + width > mem_img.size:
                            raise WasmTrap(
                                f"wasm memory OOB load (+{width}) in vectorized tier"
                            )
                        idx = ea.astype(np.int64)
                        val = np.zeros(ea.shape, np.uint64)
                        for k in range(width):
                            val |= mem_img[idx + k].astype(np.uint64) << np.uint64(8 * k)
                    else:
                        o = int(ea)
                        if o + width > mem_img.size:
                            raise WasmTrap(
                                f"wasm memory OOB load (+{width}) in vectorized tier"
                            )
                        val = np.uint64(
                            int.from_bytes(mem_img[o : o + width].tobytes(), "little")
                        )
                    bits = width * 8
                    tgt = 32 if to32 else 64
                    if signed and bits < tgt:
                        sb = np.uint64(1 << (bits - 1))
                        val = ((val ^ sb) - sb) & np.uint64((1 << tgt) - 1)
                    push(val)
                elif op == 0x7C:
                    b = pop(); push(_u(pop()) + _u(b))
                elif op == 0x7D:
                    b = pop(); push(_u(pop()) - _u(b))
                elif op == 0x7E:
                    b = pop(); push(_u(pop()) * _u(b))
                elif op in (0x7F, 0x81):  # i64.div_s / rem_s (trunc toward 0)
                    b = _s(pop()); a = _s(pop())
                    b = div_guard(b, np.int64(1))
                    q = (np.abs(a.astype(object)) // np.abs(b.astype(object)))
                    q = np.where((a < 0) != (b < 0), -q, q)
                    if op == 0x7F:
                        out = q
                    else:
                        out = a.astype(object) - q * b.astype(object)
                    push(np.array([_wrap64(int(x)) for x in out], np.int64).view(np.uint64))
                elif op in (0x80, 0x82):  # i64.div_u / rem_u
                    b = _u(pop()); a = _u(pop())
                    b = div_guard(b, np.uint64(1))
                    push(a // b if op == 0x80 else a % b)
                elif op == 0x83:
                    b = pop(); push(_u(pop()) & _u(b))
                elif op == 0x84:
                    b = pop(); push(_u(pop()) | _u(b))
                elif op == 0x85:
                    b = pop(); push(_u(pop()) ^ _u(b))
                elif op == 0x86:
                    b = pop(); push(_u(pop()) << (_u(b) & np.uint64(63)))
                elif op == 0x87:  # shr_s: arithmetic shift on signed view
                    b = pop()
                    shifted = _s(pop()) >> (_s(b) & np.int64(63))
                    push(np.asarray(shifted).view(np.uint64))
                elif op == 0x88:
                    b = pop(); push(_u(pop()) >> (_u(b) & np.uint64(63)))
                elif op == 0x50:
                    push((pop() == 0).astype(np.uint64))
                elif op in (0x51, 0x52, 0x53, 0x55, 0x57, 0x59):
                    b = _s(pop()); a = _s(pop())
                    cmp = {
                        0x51: a == b, 0x52: a != b, 0x53: a < b,
                        0x55: a > b, 0x57: a <= b, 0x59: a >= b,
                    }[op]
                    push(cmp.astype(np.uint64))
                elif op in (0x54, 0x56, 0x58, 0x5A):  # i64 unsigned cmps
                    b = _u(pop()); a = _u(pop())
                    cmp = {
                        0x54: a < b, 0x56: a > b, 0x58: a <= b, 0x5A: a >= b,
                    }[op]
                    push(cmp.astype(np.uint64))
                elif op in (0x92, 0xA0):  # f32/f64.add
                    b = pop(); push(pop() + b)
                elif op in (0x93, 0xA1):  # f32/f64.sub
                    b = pop(); push(pop() - b)
                elif op in (0x94, 0xA2):  # f32/f64.mul
                    b = pop(); push(pop() * b)
                elif op in (0x95, 0xA3):  # f32/f64.div
                    b = pop(); push(pop() / b)
                elif op in (0x8B, 0x99):  # f32/f64.abs
                    push(np.abs(pop()))
                elif op in (0x8C, 0x9A):  # f32/f64.neg
                    push(-pop())
                elif op in (0x91, 0x9F):  # f32/f64.sqrt
                    push(np.sqrt(pop()))
                elif op in (0x96, 0xA4):  # f32/f64.min
                    b = pop(); push(np.minimum(pop(), b))
                elif op in (0x97, 0xA5):  # f32/f64.max
                    b = pop(); push(np.maximum(pop(), b))
                elif op == 0xB6:  # f32.demote_f64
                    v = pop()
                    push(v.astype(np.float32) if isinstance(v, np.ndarray)
                         else np.float32(v))
                elif op == 0xBB:  # f64.promote_f32
                    v = pop()
                    push(v.astype(np.float64) if isinstance(v, np.ndarray)
                         else np.float64(v))
                elif op == 0xB9:
                    push(_s(pop()).astype(np.float64))
                elif op == 0xB0:
                    push(np.trunc(pop()).astype(np.int64).view(np.uint64))
                else:
                    raise NotImplementedError(
                        f"wasm opcode 0x{op:02x} not vectorizable in this profile"
                    )
        return pop() if stack else None

    def _finish(result, n: int):
        f = func
        if f.results and f.results[0] == F64:
            return np.asarray(result, np.float64)
        if f.results and f.results[0] == F32:
            # match the scalar tier: f32 values surface as f32-rounded doubles
            return np.asarray(result, np.float32).astype(np.float64)
        result = np.asarray(result)
        if result.dtype == np.uint64:
            result = result.view(np.int64)
        return np.broadcast_to(result, (n,)) if result.ndim == 0 else result

    def kernel(*arrays):
        f = func
        if len(arrays) != len(f.params):
            raise TypeError(f"{f.name} expects {len(f.params)} arrays")
        locals_: list = []
        for vt, a in zip(f.params, arrays):
            a = np.asarray(a)
            if vt == F64:
                locals_.append(a.astype(np.float64, copy=False))
            elif vt == F32:
                locals_.append(a.astype(np.float32, copy=False))
            else:
                locals_.append(a.astype(np.int64, copy=False).view(np.uint64))
        n = len(arrays[0]) if arrays else 1
        for vt in f.locals:
            locals_.append(zeros_for(vt, n))
        all_true = np.ones(n, bool)
        result = run(f, locals_, all_true, n, all_true, 0)
        return _finish(result, n)

    if row_memory:
        seg_list = image.data_segments
        page_bytes = max(image.memory_pages, 1) * _PAGE

        def bytes_kernel(mat, lens):
            """kernel(mat: (n, W) uint8, lens: (n,) int64) -> values.
            ``mat`` must carry >= 8 zero-padded columns past any
            written byte (padded here if not)."""
            mat = np.ascontiguousarray(mat, np.uint8)
            lens = np.asarray(lens).astype(np.int64, copy=False)
            n = len(lens)
            if mat.shape[0] != n:
                raise TypeError(
                    f"mat has {mat.shape[0]} rows but lens has {n} entries"
                )
            if mat.shape[1] < 8 or mat[:, -8:].any():
                mat = np.concatenate(
                    [mat, np.zeros((n, 8), np.uint8)], axis=1
                )
            # each lane's fresh page = data segments overlaid by its
            # record bytes: segment bytes show through only past the
            # lane's input (the per-instance instantiation order)
            for off, data in seg_list:
                end = off + len(data)
                if end + 8 > mat.shape[1]:
                    mat = np.concatenate(
                        [mat, np.zeros((n, end + 8 - mat.shape[1]), np.uint8)],
                        axis=1,
                    )
                cols = np.arange(off, end)
                vis = cols[None, :] >= lens[:, None]
                if vis.any():
                    seg = np.frombuffer(data, np.uint8)
                    region = mat[:, off:end]
                    region[vis] = np.broadcast_to(seg, region.shape)[vis]
            mem_mode["mat"] = mat
            mem_mode["lanes"] = np.arange(n)
            mem_mode["cap"] = max(page_bytes, mat.shape[1])
            mem_mode["max_iters"] = max(_VEC_MAX_LOOP_ITERS, mat.shape[1] + 64)
            try:
                locals_: list = [
                    np.zeros(n, np.uint64),  # ptr: records start at 0
                    lens.view(np.uint64),
                ]
                for vt in func.locals:
                    locals_.append(zeros_for(vt, n))
                all_true = np.ones(n, bool)
                result = run(func, locals_, all_true, n, all_true, 0)
                return _finish(result, n)
            finally:
                mem_mode["mat"] = None
                mem_mode["lanes"] = None
                mem_mode["cap"] = 0
                mem_mode["max_iters"] = _VEC_MAX_LOOP_ITERS

        # eager probe: one lane holding a 1-byte record, so bad bodies
        # fail at build time, not mid-job
        probe_mat = np.zeros((1, 9), np.uint8)
        probe_mat[0, 0] = 0x61
        bytes_kernel(probe_mat, np.array([1], np.int64))
        return bytes_kernel

    # validate the body once, eagerly, on a 1-element probe so bad
    # modules fail at build time, not mid-job
    probe = [
        np.zeros(
            1,
            np.float64 if t == F64 else np.float32 if t == F32 else np.int64,
        )
        for t in func.params
    ]
    kernel(*probe)
    return kernel
