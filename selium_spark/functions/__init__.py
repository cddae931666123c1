from .scalar import (  # noqa: F401
    clamp_min,
    contains,
    eq_ignore_case,
    format_str,
    hex_decode,
    split_once,
    unix_ms,
    utf8_valid,
)
from .wasm import wasm_pandas_udf  # noqa: F401
