"""Record-at-a-time transforms (SURVEY §2.2, T1-T11).

Selium expresses these as ``futures::StreamExt`` combinators over typed
subscribers; here each is a thin declarative DataFrame wrapper so
Catalyst keeps pushdown/pruning/codegen. All operators work identically
on batch and streaming DataFrames (the batch twin is the oracle).

Scale note: everything in this module is a narrow (no-shuffle)
transformation built from JVM-side expressions — no Python in the hot
path, whole-stage-codegen friendly, safe at any scale factor.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def map_rows(df: DataFrame, **exprs: Column) -> DataFrame:
    """T1 map: 1->1 transform of named columns.

    Reference: ``.map_ok(|item| item * 2)`` / ``item + 5`` in
    examples/data-pipeline/src/lib.rs:47,64.
    """
    out = df
    for name, col in exprs.items():
        out = out.withColumn(name, col)
    return out


def where(df: DataFrame, predicate: Column | str) -> DataFrame:
    """T2 filter: keep rows matching predicate.

    Reference: ``.filter(|item| item % 2 == 0)``
    examples/data-pipeline/src/lib.rs:82.
    """
    return df.where(predicate)


def filter_map(df: DataFrame, error_col: str = "error") -> DataFrame:
    """T3 filter_map: drop rows whose decode/compute errored.

    Reference: ``.filter_map(|res| res.ok())``
    examples/log-analyser/src/lib.rs:65. Here: drop rows with a
    non-null error column (PERMISSIVE-parse convention).
    """
    return df.where(F.col(error_col).isNull()).drop(error_col)


def classify(
    df: DataFrame,
    out_col: str,
    rules: list[tuple[Column, str]],
    default: str,
    reason_col: str | None = None,
    reasons: list[str] | None = None,
) -> DataFrame:
    """T4 per-record classify: first-match-wins rule list -> label.

    Reference: the WAF verdict (block if path contains "/admin",
    else allow) examples/waf/src/lib.rs:101-110.
    """
    expr: Column | None = None
    for cond, label in reversed(rules):
        expr = F.when(cond, F.lit(label)).otherwise(
            expr if expr is not None else F.lit(default)
        )
    out = df.withColumn(out_col, expr if expr is not None else F.lit(default))
    if reason_col is not None and reasons is not None:
        rexpr: Column | None = None
        for (cond, _), reason in zip(reversed(rules), reversed(reasons)):
            rexpr = F.when(cond, F.lit(reason)).otherwise(
                rexpr if rexpr is not None else F.lit("default")
            )
        out = out.withColumn(reason_col, rexpr)
    return out


def decode_json(
    df: DataFrame, src_col: str, schema: T.StructType | str, out_col: str = "decoded"
) -> DataFrame:
    """T5 decode: bytes/str -> typed struct, checked (NULL on failure).

    Reference: ``FlatMsg::decode`` use sites, e.g.
    examples/orchestrator/src/lib.rs:167. Wire format here is JSON
    (columnar engines don't speak flatbuffers natively; the schema-hash
    gate in the catalog supplies the same strictness).
    """
    col = F.col(src_col)
    if dict(df.dtypes)[src_col] == "binary":
        col = col.cast("string")
    return df.withColumn(out_col, F.from_json(col, schema))


def encode_json(df: DataFrame, cols: list[str], out_col: str = "encoded") -> DataFrame:
    """T6 encode: typed struct -> wire bytes (JSON) at the sink.

    Reference: ``FlatMsg::encode`` e.g. examples/orchestrator/src/lib.rs:148.
    """
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c) for c in cols])))


def pipe(df: DataFrame, *fns) -> DataFrame:
    """T7 forward: compose a chain of operators (stream -> sink wiring).

    Reference: ``.forward(alerts)`` examples/log-analyser/src/lib.rs:69.
    """
    out = df
    for fn in fns:
        out = fn(out)
    return out


def parse_and_validate(
    df: DataFrame,
    src_col: str,
    schema: T.StructType | str,
    checks: Mapping[str, Column],
) -> DataFrame:
    """T10 JSON parse + validate: parse body, run named checks, keep a
    per-check boolean plus an overall ``valid`` flag.

    Reference: examples/rest-api/src/lib.rs:106-130 (serde_json parse,
    extract field, compare secret).
    """
    out = decode_json(df, src_col, schema, out_col="_parsed")
    valid = F.col("_parsed").isNotNull()
    for name, cond in checks.items():
        out = out.withColumn(name, cond)
        valid = valid & F.col(name)
    return out.withColumn("valid", valid)


def scan_http_frames(df: DataFrame, raw_col: str) -> DataFrame:
    """T11 byte-protocol scan: split raw HTTP-ish text into request line
    + headers + body using JVM string functions (no state machine needed
    once records are row-framed).

    Reference: the incremental header/content-length framing loop in
    examples/rest-api/src/lib.rs:52-104. In a columnar engine the
    ingest adapter frames bytes into rows; the in-engine equivalent is
    pure string surgery, kept JVM-side.
    """
    from ..sources.layout import fan_out

    df = fan_out(df)  # regex + substring surgery per row: CPU-bound
    raw = F.col(raw_col)
    head = F.substring_index(raw, "\r\n\r\n", 1)
    request_line = F.substring_index(head, "\r\n", 1)
    return (
        df.withColumn("method", F.split(request_line, " ").getItem(0))
        .withColumn("path", F.split(request_line, " ").getItem(1))
        .withColumn(
            "content_length",
            # no header -> regexp_extract yields '' which ANSI cast
            # rejects; absent content-length must be NULL, not an error
            F.nullif(
                F.regexp_extract(head, r"(?i)content-length:\s*(\d+)", 1), F.lit("")
            ).cast("long"),
        )
        .withColumn(
            "body",
            F.when(
                F.instr(raw, "\r\n\r\n") > 0,
                # char(13)||char(10) instead of literal CR/LF so the SQL
                # string survives the expression parser
                F.expr(
                    f"substring({raw_col}, instr({raw_col}, "
                    "char(13)||char(10)||char(13)||char(10)) + 4)"
                ),
            ),
        )
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic weighted dataset mixing: keep each row of group g
    with probability ``rates[g]``, decided by an md5 hash of the row id
    (no RNG state — the same rows survive at every scale factor and on
    every engine, which is what makes a training-data mixture
    reproducible).

    Bucket = first byte of md5(id) (0..255); keep iff
    bucket < round(rate * 256). Pure expression work: the mixture is a
    map-side filter, no shuffle, and composes with partition pruning.
    """
    bucket = (
        (F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)) - 1) * 16
        + (F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(F.col(id_col).cast("string")), 2, 1)) - 1)
    )
    threshold = F.lit(int(round(default_rate * 256)))
    for g, rate in sorted(rates.items()):
        threshold = F.when(F.col(group_col) == g, F.lit(int(round(rate * 256)))).otherwise(threshold)
    return df.where(bucket < threshold)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    round_to: int = 9,
) -> DataFrame:
    """Weighted sample WITHOUT replacement of k rows (Efraimidis-
    Spirakis A-ES): priority = u^(1/w) with u a deterministic
    md5-derived uniform in (0,1); the k highest priorities win. A row
    with twice the weight is twice as likely to make the sample, and
    the whole draw is reproducible (no RNG state) — the standard way to
    bias a training mixture toward high-quality documents.

    Scale shape: priorities are map-side expressions; selection is
    orderBy().limit(k) = TakeOrderedAndProject (per-partition top-k
    heaps merged at the driver), so NO global sort and no shuffle of
    the corpus. Priorities are rounded before comparison so the
    JVM/libm pow ulp can't flip an order the oracle disagrees with;
    exact ties break on id.
    """
    from .sketches import hash52

    c_id = F.col(id_col)
    u = (hash52(c_id) + F.lit(0.5)) / F.lit(float(1 << 52))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-12))
    priority = F.round(F.pow(u, F.lit(1.0) / w), round_to)
    return (
        df.withColumn("sample_priority", priority)
        .orderBy(F.col("sample_priority").desc(), c_id.asc())
        .limit(k)
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float],
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: the md5-bucket of the id
    (0..255) is mapped onto cumulative weight ranges, so every engine,
    run, and scale factor assigns the same rows to the same split —
    and adding rows later never reshuffles existing assignments
    (hash-stable, unlike a random or modulo-on-count split). Map-side
    expression only; composes with partition pruning.
    """
    total = sum(weights.values())
    bucket = (
        (F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)) - 1) * 16
        + (F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(F.col(id_col).cast("string")), 2, 1)) - 1)
    )
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cut = int(round(acc * 256))
        cond = bucket < cut
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)
