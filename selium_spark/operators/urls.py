"""URL hygiene operators for web-corpus curation (north star).

CommonCrawl-style pipelines filter and budget documents by URL: strip
tracking noise so the same page isn't counted twice, extract the
registered domain, and cap how many documents any one domain may
contribute to the training mix (a handful of boilerplate-heavy hosts
otherwise dominates the token budget).

Everything here is pure JVM-side expression work (lower/regexp) plus
one hash shuffle for the per-domain cap — no UDFs, no driver loops.
The cap uses a deterministic md5 order so the surviving set is
identical on every run, engine, and scale factor.

Reference analogue: selium routes on string keys of the record
(examples/waf/src/lib.rs:101-110 path matching); URL normalization is
the same record-key surgery rendered for corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .relational import salted_top_k_per_group

# scheme://host[/path...] — capture groups used by the extractors below.
_URL_RE = r"^([a-z][a-z0-9+.-]*)://([^/?#]+)(.*)$"


def url_normalize(col: str | Column) -> Column:
    """Canonical URL: lowercase, strip ?query and #fragment, strip a
    leading ``www.`` on the host, strip one trailing slash. Pure
    string expressions — identical in the DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.lower(c)
    u = F.regexp_replace(u, r"[?#].*$", "")          # query + fragment
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://)www\.", r"$1")
    return F.regexp_replace(u, r"/$", "")


def url_host(col: str | Column) -> Column:
    """Host part of a normalized URL ('' when the URL doesn't parse)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, _URL_RE, 2)


def url_domain(col: str | Column) -> Column:
    """Registered domain: last two dot-labels of the host (the public-
    suffix list is out of scope; two labels is the standard cheap
    approximation)."""
    return F.regexp_extract(url_host(col), r"([^.]+\.[^.]+)$", 1)


def domain_cap(
    df: DataFrame,
    url_col: str,
    id_col: str,
    cap: int,
    domain_col: str = "domain",
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-domain document budget: keep at most ``cap`` rows per
    registered domain, chosen by deterministic md5-of-id order (a
    content-blind uniform sample, stable across runs and engines).

    Skew-hardened: the cap runs as a two-phase salted top-k
    (relational.salted_top_k_per_group) because mega-domains are the
    NORM in web corpora — one host can carry 30%+ of all rows, and a
    single-window plan would push that whole domain through one task.
    Phase 1 caps within (domain, salt) slices, phase 2 re-ranks the
    <= salt_buckets*cap survivors; output is identical to the
    single-window form since (md5(id), id) is a total order.
    """
    normed = df.withColumn("_url_norm", url_normalize(url_col)).withColumn(
        domain_col, url_domain(F.col("_url_norm"))
    )
    capped = salted_top_k_per_group(
        normed,
        [domain_col],
        [F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()],
        cap,
        salt_col=F.col(id_col),
        salt_buckets=salt_buckets,
        rank_col="_rn",
    )
    return capped.drop("_rn", "_url_norm")
