"""Text-analysis operators for training-data pipelines (north star).

Language-ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (md5 +
min-shingle winnowing). Every function is pure JVM-side expression work
(split/transform/aggregate/md5) — no Python UDFs — so plans stay inside
whole-stage codegen and scale linearly with no shuffle.

Cross-engine determinism: all hashing is md5 (identical in DuckDB),
ratios are single double divisions of integer counts, so the DuckDB
oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the heuristic language ID.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "nicht"],
    "fr": ["le", "la", "les", "et", "un", "une", "est", "pas"],
    "es": ["el", "la", "los", "y", "un", "una", "es", "no"],
}

# BPE-ish pre-tokenizer: words | numbers | single non-space symbols.
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: str | Column) -> Column:
    """Whitespace tokens of a trimmed string (empty string -> [])."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: str | Column) -> Column:
    """Sub-word-ish token count via the BPE pre-tokenizer regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_REGEX), 0))


def stopword_ratio(col: str | Column, lang: str = "en") -> Column:
    toks = tokens(col)
    sw = STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(sw)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_id(col: str | Column, threshold: float = 0.05) -> Column:
    """Heuristic language ID: language with the highest stopword ratio,
    'unknown' when no language clears the threshold. Deterministic
    tie-break = language order en < de < fr < es (strictly-greater
    comparisons keep first-seen on ties)."""
    best_lang = F.lit("unknown")
    best_ratio = F.lit(threshold)
    for lang in ["es", "fr", "de", "en"]:  # reversed => earlier wins ties
        r = stopword_ratio(col, lang)
        keep = r > best_ratio
        best_lang = F.when(keep, F.lit(lang)).otherwise(best_lang)
        best_ratio = F.when(keep, r).otherwise(best_ratio)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token stats, punct/digit/upper
    ratios, stopword ratio, mean token length."""
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "punct_ratio",
            F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", "")) / safe_chars,
        )
        .withColumn("digit_ratio", F.length(F.regexp_replace(c, r"[^0-9]", "")) / safe_chars)
        .withColumn("upper_ratio", F.length(F.regexp_replace(c, r"[^A-Z]", "")) / safe_chars)
        .withColumn("stopword_ratio", stopword_ratio(text_col, "en"))
        .withColumn(
            "mean_token_len",
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / safe_tokens,
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]-ish: rewards mid-length docs and
    stopword presence, penalizes punct/digit noise. Fixed expression
    order keeps the double arithmetic cross-engine deterministic."""
    feat = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * F.lit(5.0), F.lit(1.0))) * F.lit(0.2)
        + (F.lit(1.0) - F.least(F.col("digit_ratio") * F.lit(5.0), F.lit(1.0))) * F.lit(0.1)
    )
    return feat.withColumn("quality_score", score)


def normalize_text(col: str | Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint_md5(col: str | Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def min_shingle_fingerprint(col: str | Column, shingle_len: int = 8) -> Column:
    """Winnowing-style fingerprint: minimum md5 over all character
    shingles of the normalized text (rolling-hash analogue; robust to
    local edits away from the minimizing shingle).

    NOTE: ``col`` is evaluated per shingle position — pass an already-
    materialized normalized column (see fingerprint_table) rather than
    a raw-text expression in hot paths.
    """
    norm = F.col(col) if isinstance(col, str) else col
    positions = F.sequence(
        F.lit(1), F.greatest(F.length(norm) - F.lit(shingle_len - 1), F.lit(1))
    )
    return F.array_min(
        F.transform(positions, lambda i: F.md5(norm.substr(i, F.lit(shingle_len))))
    )


def fingerprint_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Both fingerprints with the normalization materialized once: the
    regex-normalize runs once per doc, not once per shingle."""
    normed = df.select(F.col(id_col), normalize_text(text_col).alias("_norm"))
    return normed.select(
        F.col(id_col),
        F.md5(F.col("_norm")).alias("fp_md5"),
        min_shingle_fingerprint(F.col("_norm"), 8).alias("fp_min_shingle"),
    )
