"""Scalar function surface used by the reference (SURVEY §2.2).

The complete allowlist observed across selium's examples/runtime, each
mapped to a built-in JVM expression — zero custom SQL functions are
needed for parity; these named wrappers exist so engine programs read
like their selium counterparts (citations per function).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def contains(col: str | Column, needle: str) -> Column:
    """``path.contains("/admin")`` — examples/waf/src/lib.rs:102."""
    return _c(col).contains(needle)


def split_once(col: str | Column, sep: str) -> Column:
    """``split_once`` -> struct(head, rest) — examples/rest-api/src/lib.rs:59-71."""
    c = _c(col)
    idx = F.instr(c, sep)
    return F.struct(
        F.when(idx > 0, c.substr(F.lit(1), idx - 1)).alias("head"),
        F.when(idx > 0, c.substr(idx + len(sep), F.length(c))).alias("rest"),
    )


def eq_ignore_case(a: str | Column, b: str | Column) -> Column:
    """``eq_ignore_ascii_case`` — examples/rest-api/src/lib.rs:64."""
    return F.lower(_c(a)) == F.lower(_c(b))


def format_str(fmt: str, *cols: Column) -> Column:
    """``format!`` string building — examples/orchestrator/src/lib.rs:91."""
    return F.format_string(fmt, *cols)


def clamp_min(col: str | Column, lo) -> Column:
    """``.max(1)`` clamp — examples/orchestrator/src/lib.rs:85."""
    return F.greatest(_c(col), F.lit(lo))


def utf8_valid(col: str | Column) -> Column:
    """utf8 validation — examples/rest-api/src/lib.rs:77. Binary that
    survives a string round-trip unchanged is valid UTF-8."""
    c = _c(col)
    return c.cast("string").cast("binary") == c.cast("binary")


def hex_decode(col: str | Column) -> Column:
    """hex decode — system/runtime/src/modules.rs:599-624."""
    return F.unhex(_c(col))


def unix_ms(col: str | Column) -> Column:
    """unix-ms timestamps — system/userland/src/logging.rs:488-493."""
    return F.unix_millis(_c(col))
