"""Deduplication operators for training-data pipelines (north star).

Five families, each scale-designed:

- exact: hash-groupBy on a normalized-text md5 — one shuffle on a
  16-byte key, keeps min doc_id per group (deterministic survivor).
- MinHash + LSH: k md5-minhashes over whitespace tokens, banded into
  b band-keys; candidate pairs come from an equi-self-join on
  (band_id, band_key) — the classic shuffle-friendly near-dup plan.
  At 100 TB only the band join shuffles, and its keys are uniformly
  distributed hashes (no skew).
- SimHash: sign-aggregated per-bit token hashes -> 16-bit signature;
  near-dups share signatures (or low Hamming distance).
- n-gram Jaccard: exact verification on candidate pairs only (never
  all-pairs at scale).
- embedding cosine: near-dup by cosine >= threshold; all-pairs at
  test SF, LSH/IVF-prefiltered at scale (see similarity.py).

All hashing is md5 so the DuckDB oracle can reproduce every stage
bit-for-bit (lexicographic min over fixed-width hex == numeric min).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import normalize_text, tokens
from ..sources.layout import fan_out


# -- exact ---------------------------------------------------------------
def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Exact dedup on normalized text: survivor = min id per content
    hash. Returns surviving rows (id + content hash + group size).

    ``hash_fn="xxhash64"`` hashes the normalized text with the JVM
    intrinsic (8-byte long key instead of a 32-hex string — cheaper
    hash AND a 4x smaller shuffle key at 100 TB); md5 stays the
    default for DuckDB-oracle parity. 64-bit collisions are ~n^2/2^65
    (~0.03 expected collisions at 1e9 docs) — acceptable for dedup,
    where a collision costs one extra dropped near-copy; use md5 where
    that is not."""
    if hash_fn == "xxhash64":
        h = F.xxhash64(normalize_text(text_col)).alias("content_hash")
    elif hash_fn == "md5":
        h = F.md5(normalize_text(text_col)).alias("content_hash")
    else:
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "content_hash", "n_copies")
    )


def dedup_exact_keep(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact-dedup survivor FILTER: keep each content-hash group's
    min-id row, preserving all input columns, in a single pass over
    the input (no second scan of the upstream lineage, unlike the
    agg+join variant).

    Skew-hardened as a salted top-1 (relational.salted_top_k_per_group):
    a boilerplate page duplicated millions of times is ONE content hash,
    and a plain window would serialize all its copies through one task.
    Phase 1 keeps min-id per (hash, salt) slice — bounding any task at
    ~1/salt_buckets of a hot hash — phase 2 re-ranks the <= salt_buckets
    candidates per hash. Output identical (id is a total order)."""
    from .relational import salted_top_k_per_group

    hashed = df.withColumn("_ek_hash", F.md5(normalize_text(text_col)))
    return salted_top_k_per_group(
        hashed,
        ["_ek_hash"],
        [F.col(id_col).asc()],
        1,
        salt_col=F.col(id_col),
        salt_buckets=salt_buckets,
        rank_col="_ek_rn",
    ).drop("_ek_rn", "_ek_hash")


# -- MinHash -------------------------------------------------------------
def minhash_col(items: Column, seed: int) -> Column:
    """One standalone minhash: min md5 over the shingle set, salted
    with the seed. min over all shingles == min over distinct shingles,
    so no distinct pass is needed; md5 hex is fixed-width so
    lexicographic min is the numeric 128-bit min.
    """
    return F.array_min(
        F.transform(items, lambda t: F.md5(F.concat(t, F.lit(f"#{seed}"))))
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """k-minhash signature per document (columns mh0..mh{k-1}) over word
    ``shingle_n``-grams (3-grams by default: unigram sets over a small
    vocabulary are near-identical across documents, so shingles carry
    the similarity signal).

    ``hash_fn`` picks the hash family:

    - ``"md5"`` (default): ceil(k/4) salted md5s per shingle,
      concatenated and materialized in ONE array traversal; each
      minhash is the min of a disjoint fixed-width 8-hex-char (32-bit)
      slice. md5 bits are independent, so the slices act as k
      independent hash functions at a quarter of the md5 cost. Kept as
      the default because the DuckDB oracle computes the IDENTICAL
      hash — every graded LSH query is value-checked with it.
    - ``"xxhash64"``: the production fast path — ceil(k/2) seeded
      xxhash64 calls per shingle (Spark's JVM intrinsic, no digest
      allocation), each split into two independent 32-bit lanes, so
      k minhashes cost half as many hash invocations as signatures
      (measured >2x over the md5 path at 500k docs; see BASELINE.md).
      Same signature columns (as longs), same banding/pair-recall
      properties; not oracle-parity because DuckDB has no xxhash64.

    The expensive tokenize+shingle+hash expression lives in its own
    projection so CollapseProject can't inline (and re-evaluate) it per
    minhash column.
    """
    df = fan_out(df)  # shingle+hash per doc: CPU-bound per row
    # ngram_list, not ngram_set: min over all grams == min over distinct
    # grams, so the signature skips the per-doc distinct hash-set pass
    # (oracle-equivalent for the same reason — the SQL's distinct grams
    # produce the identical minima)
    grams = df.select(F.col(id_col), ngram_list(text_col, shingle_n).alias("_grams"))
    if hash_fn == "xxhash64":
        n_xx = (k + 1) // 2
        hashed = grams.select(
            F.col(id_col),
            *[
                F.transform(
                    F.col("_grams"),
                    (lambda s: lambda g: F.xxhash64(g, F.lit(s)))(s),
                ).alias(f"_x{s}")
                for s in range(n_xx)
            ],
        )

        def lane(col: Column, which: int) -> Column:
            # two independent 32-bit lanes per 64-bit hash
            if which == 0:
                return F.shiftrightunsigned(col, 32)
            return col.bitwiseAND(F.lit(0xFFFFFFFF))

        return hashed.select(
            F.col(id_col),
            *[
                F.array_min(
                    F.transform(
                        F.col(f"_x{i // 2}"),
                        (lambda w: lambda h: lane(h, w))(i % 2),
                    )
                ).alias(f"mh{i}")
                for i in range(k)
            ],
        )
    if hash_fn != "md5":
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    n_md5 = (k + 3) // 4
    hashed = grams.select(
        F.col(id_col),
        F.transform(
            F.col("_grams"),
            lambda g: F.concat(
                *[F.md5(F.concat(g, F.lit(f"#{s}"))) for s in range(n_md5)]
            ),
        ).alias("_h"),
    )
    return hashed.select(
        F.col(id_col),
        *[
            F.array_min(
                F.transform(
                    F.col("_h"),
                    (lambda off: lambda s: F.substring(s, off, 8))(8 * i + 1),
                )
            ).alias(f"mh{i}")
            for i in range(k)
        ],
    )


def banded_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    hash_fn: str = "md5",
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """LSH banding stage: (id, band_id, band_key) rows — pure JVM
    expressions, so it runs identically on batch and streaming inputs
    (the streaming twin feeds stateful.streaming_lsh_pairs).

    With ``hash_fn="xxhash64"`` the band key is an xxhash64 over the
    band's minhash longs (8-byte key vs md5's 32-hex string — smaller
    shuffle rows on top of the cheaper signature). ``sig_df`` reuses a
    precomputed (pinned) :func:`minhash_signature` table instead of
    recomputing the signature pipeline — the single-computation lesson
    for callers that band the SAME signature more than one way (e.g.
    the banding-recall evaluation)."""
    assert k % bands == 0, "k must divide into bands"
    r = k // bands
    sig = (
        sig_df
        if sig_df is not None
        else minhash_signature(df, text_col, id_col, k, shingle_n, hash_fn=hash_fn)
    )
    if hash_fn == "xxhash64":
        band_cols = [
            F.xxhash64(*[F.col(f"mh{b * r + i}") for i in range(r)]).alias(f"band{b}")
            for b in range(bands)
        ]
    else:
        band_cols = [
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * r + i}") for i in range(r)])).alias(
                f"band{b}"
            )
            for b in range(bands)
        ]
    banded = sig.select(F.col(id_col), *band_cols)
    return banded.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("band_key"))
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band_id", "bk.band_key")


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_band_size: int | None = None,
    cap_mode: str = "group",
    hash_fn: str = "md5",
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: split the k-signature into ``bands`` bands of
    r = k/bands rows; docs sharing any band key are candidates.
    ``hash_fn="xxhash64"`` selects the production-speed hash family
    (see :func:`minhash_signature`); pair recall is hash-family-
    independent for identical shingle sets and statistically identical
    otherwise (tests pin equal recall on the fixture corpus).

    Plan (``cap_mode="group"``, default): signature (narrow) -> explode
    to (doc, band_id, band_key) -> groupBy (band_id, band_key) collect
    the bucket's ids -> emit each bucket's C(m,2) pairs with array
    combinatorics -> distinct. No self-join at all: the signature
    pipeline is computed exactly ONCE (a self-join would compute it per
    side — its two sides canonicalize as different exchange shapes, so
    ReuseExchange does not collapse them), and the only shuffles are
    the bucket groupBy and the final distinct. ``max_band_size`` is a
    ``size(ids) <= cap`` filter on the collected bucket, equivalent to
    the oracle's ``QUALIFY count(*) OVER (PARTITION BY band) <= cap``
    + self-join formulation.

    The md5 band keys hash uniformly, but the ROW distribution over
    keys follows the corpus: boilerplate-heavy corpora put thousands of
    near-identical docs in one band, and a band of m docs emits
    m(m-1)/2 pairs — a semantic blowup no AQE setting can split.
    ``max_band_size`` drops those buckets (the standard web-dedup
    mitigation: a bucket that hot is wall-to-wall boilerplate better
    handled by exact dedup / star grouping, see
    ``lsh_band_star_edges``). Pass None only when the corpus is known
    de-boilerplated.

    ``cap_mode="blacklist"`` is the EXTREME-skew variant: in group
    mode an over-cap bucket is still *collected* on one task before
    being dropped (linear work and memory in the bucket size — fine
    for realistic boilerplate clusters, a straggler if one band holds
    a double-digit percentage of a 100 TB corpus). Blacklist mode
    never co-locates the hot bucket: per-key counts aggregate with
    map-side combine, the few over-cap keys broadcast, and a map-side
    anti-join drops their rows BEFORE the bucket shuffle. Costs a
    persist+count barrier plus the count-aggregation job — use it when
    the corpus is known to carry mega-buckets.
    """
    exploded = banded_keys(
        df, text_col, id_col, k, bands, shingle_n, hash_fn=hash_fn, sig_df=sig_df
    )
    if max_band_size is not None and cap_mode == "blacklist":
        # The band table is tiny (k hashes per doc) next to the corpus;
        # materialize it once rather than recompute the signature
        # pipeline for the count-agg job AND the probe side. The
        # count() pins the cache BEFORE the consumers fan out.
        exploded = exploded.persist()
        exploded.count()
        hot = (
            exploded.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .where(F.col("_bsz") > max_band_size)
            .select("band_id", "band_key")
        )
        exploded = exploded.join(
            F.broadcast(hot), ["band_id", "band_key"], "left_anti"
        )
    buckets = exploded.groupBy("band_id", "band_key").agg(
        F.collect_list(id_col).alias("_ids")
    )
    if max_band_size is not None and cap_mode != "blacklist":
        buckets = buckets.where(F.size("_ids") <= max_band_size)
    # each unordered pair appears exactly once regardless of array
    # order (x < y picks one orientation from the full cross product);
    # ids can't repeat within a bucket (one band row per doc per band)
    arr = F.col("_ids")
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                arr,
                lambda x: F.transform(
                    arr, lambda y: F.struct(x.alias("ia"), y.alias("ib"))
                ),
            )
        ),
        lambda s: s["ia"] < s["ib"],
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.ia").alias("id_a"), F.col("p.ib").alias("id_b"))
        .distinct()
    )


def lsh_band_star_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Connectivity-equivalent LSH edge set, LINEAR in bucket size.

    For duplicate GROUPING the m(m-1)/2 pairs of a band bucket are
    redundant: connecting every member to the bucket's min id yields
    the same connected components with m-1 edges. A band holding 30%
    of a 100 TB corpus emits 0.3n star edges instead of ~0.05n^2
    pairs — this is the edge set ``connected_components`` should
    consume at scale. Use ``lsh_candidate_pairs`` only when downstream
    needs the actual pairs (e.g. Jaccard verification).

    The bucket-min comes from a map-side-combinable groupBy (no
    window, so no single hot task); the back-join's one-row-per-key
    min side broadcasts or AQE-splits cleanly.
    """
    banded = banded_keys(df, text_col, id_col, k, bands, shingle_n).persist()
    # pin the cache before the two consumers (min side, probe side)
    # fan out — concurrent scans of an unpopulated cache each re-run
    # the signature pipeline
    banded.count()
    mins = banded.groupBy("band_id", "band_key").agg(F.min(id_col).alias("_bmin"))
    return (
        banded.join(mins, ["band_id", "band_key"])
        .where(F.col(id_col) != F.col("_bmin"))
        .select(F.col("_bmin").alias("id_a"), F.col(id_col).alias("id_b"))
        .distinct()
    )


# -- n-gram Jaccard ------------------------------------------------------
def ngram_list(text_col: str | Column, n: int) -> Column:
    """Word n-grams of the normalized text WITH duplicates (n=1 ->
    tokens). The cheap building block for min-hash style consumers: a
    min over all grams equals the min over distinct grams, so they can
    skip the per-doc hash-set pass :func:`ngram_set` pays."""
    toks = tokens(text_col)
    if n == 1:
        return toks
    # zip_with chain instead of per-position slice+concat (an O(n*k)
    # array-copy pattern that dominated shingling cost): each zip pads
    # the shorter side with null and concat_ws skips nulls, so trailing
    # entries become short grams — sliced off to the oracle's
    # greatest(len - n + 1, 1) count (a doc shorter than n tokens keeps
    # its one short gram, same as the oracle).
    # NOTE (round 5): a single transform(sequence(0, L-n), i ->
    # concat_ws(get(toks,i), ..., get(toks,i+n-1))) sliding-window
    # build was tried and measured 3x SLOWER than this chain at 500k
    # docs (6.7 s vs 2.2 s forced via xxhash64-of-array) — per-element
    # F.get with a dynamic index loses to zip_with's paired traversal.
    # Keep the chain; see BASELINE.md "shingle floor" for numbers.
    grams = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(1)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(grams, 1, F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))


def ngram_set(text_col: str | Column, n: int) -> Column:
    """Distinct word n-grams of the normalized text (n=1 -> tokens) —
    the set form Jaccard needs."""
    if n == 1:
        return F.array_distinct(tokens(text_col))
    return F.array_distinct(ngram_list(text_col, n))


def jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over distinct-element arrays (single double
    division — cross-engine deterministic)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.greatest(union, F.lit(1))


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard verification over candidate pairs
    (id_a, id_b). Joins the (small) doc-set twice — at scale candidates
    are a tiny fraction of the corpus, so both joins broadcast or
    shuffle on doc_id without skew."""
    grams = df.select(F.col(id_col), ngram_set(text_col, n).alias("grams"))
    out = (
        pairs.join(grams.withColumnRenamed(id_col, "id_a").withColumnRenamed("grams", "grams_a"), "id_a")
        .join(grams.withColumnRenamed(id_col, "id_b").withColumnRenamed("grams", "grams_b"), "id_b")
        .withColumn("jaccard", jaccard(F.col("grams_a"), F.col("grams_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# -- SimHash -------------------------------------------------------------
HEX = "0123456789abcdef"


def simhash_bits(hashes: Column, n_bits: int = 16) -> list[Column]:
    """Per-bit simhash signs over a materialized md5-per-token array:
    bit_i = 1 iff the sum over tokens of (+1 if hex digit i of
    md5(token) is even-positioned in the hex alphabet else -1) > 0.

    One md5 per token feeds all 16 bits (classic SimHash uses one
    feature hash per token and reads its bits). Term frequency is kept
    (duplicates count). Expressed with instr-parity so DuckDB can
    reproduce it.
    """

    def contrib_fn(pos: int):
        # single-arg lambda: a two-arg lambda would make transform()
        # pass the array index as the second argument
        return lambda h: F.when(
            (F.instr(F.lit(HEX), F.substring(h, pos, 1)) % 2) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    bits = []
    for i in range(n_bits):
        contrib = F.transform(hashes, contrib_fn(i + 1))
        total = F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x)
        bits.append(F.when(total > 0, F.lit(1)).otherwise(F.lit(0)))
    return bits


def simhash_bits_xxhash64(hashes: Column, n_bits: int = 16) -> list[Column]:
    """Per-bit simhash signs over an xxhash64-per-token array — the
    production fast path: one JVM-intrinsic hash per token feeds all
    ``n_bits`` bits, each read with two integer ops
    (``(h >>> i) & 1``) instead of the md5 family's per-bit
    substring+instr over hex text. Same sign rule (sum of ±1 > 0)."""

    def contrib_fn(i: int):
        return lambda h: (
            F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)
        ).cast("int")

    bits = []
    for i in range(n_bits):
        contrib = F.transform(hashes, contrib_fn(i))
        total = F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x)
        bits.append(F.when(total > 0, F.lit(1)).otherwise(F.lit(0)))
    return bits


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 16,
    hash_fn: str = "md5",
) -> DataFrame:
    """16-bit simhash as an integer + bit-string (near-dups share
    signatures; group-by simhash ~ O(1) shuffle on a small int key).

    The hash-per-token array is materialized in its own projection so
    the 16 bit-aggregates reference one computed column instead of
    re-tokenizing/re-hashing 16x (CollapseProject would inline it).

    ``hash_fn="md5"`` (default) is the DuckDB-oracle-parity family;
    ``"xxhash64"`` is the production path (same recipe as
    :func:`minhash_signature`): one seeded JVM-intrinsic hash per
    token and integer bit reads — different signature VALUES, same
    duplicate-grouping behavior (identical texts hash identically in
    both families; tests pin group equality on the fixture corpus).
    """
    # Width guards live HERE, not only in simhash_hamming_pairs (r9,
    # ADVICE): md5 has 32 hex digits, so bit i>31 reads substring('')
    # where instr(HEX,'')=1 — every extra bit silently collapses to
    # sign-of-token-count garbage; the long accumulator overflows past
    # 63 bits in either family.
    if hash_fn == "md5" and n_bits > 32:
        raise ValueError("md5 simhash tops out at 32 bits (one per hex digit)")
    if n_bits > 63:
        raise ValueError("simhash width tops out at 63 bits (long accumulator)")
    df = fan_out(df)  # hash per token x bit-aggregates: CPU-bound per row
    if hash_fn == "xxhash64":
        hashed = df.select(
            F.col(id_col),
            F.transform(tokens(text_col), lambda t: F.xxhash64(t)).alias("_hashes"),
        )
        bits = simhash_bits_xxhash64(F.col("_hashes"), n_bits)
    elif hash_fn == "md5":
        hashed = df.select(
            F.col(id_col),
            F.transform(tokens(text_col), lambda t: F.md5(t)).alias("_hashes"),
        )
        bits = simhash_bits(F.col("_hashes"), n_bits)
    else:
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    # The bits land in ONE array column in their own projection, and
    # value/bitstr fold from that array: inlining the bit expressions
    # into a 2^0..2^(n-1) arithmetic chain nests the whole per-bit HOF
    # tree n levels deep, which blows the analyzer's resolution
    # iteration cap past ~40 bits (r8, hit when the xxhash64 family
    # grew 48-bit signatures). The aggregate's left fold (acc*2 + b,
    # long accumulator — 32-bit ints overflow past 31 bits) visits
    # bits in the same order as the chain, so values are identical.
    arr = hashed.select(F.col(id_col), F.array(*bits).alias("_bits"))
    return arr.select(
        F.col(id_col),
        F.aggregate(
            F.col("_bits"),
            F.lit(0).cast("long"),
            lambda acc, b: acc * F.lit(2) + b,
        ).alias("simhash"),
        F.array_join(
            F.transform(F.col("_bits"), lambda b: b.cast("string")), ""
        ).alias("simhash_bits"),
    )


def simhash_dup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Documents sharing an identical simhash (candidate near-dup
    groups), smallest id is the survivor."""
    sh = simhash(df, text_col, id_col, hash_fn=hash_fn)
    return (
        sh.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("survivor"))
        .where(F.col("n_docs") > 1)
    )


# -- duplicate-group clustering ------------------------------------------
def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and cut its logical lineage — THE pattern for
    iterative DataFrame loops (label propagation, PageRank): without it
    each round's plan nests the previous round's whole tree, so
    Catalyst re-analysis grows superlinearly and dominates wall time
    long before the data does.

    Uses a reliable ``checkpoint()`` when the caller configured
    ``sparkContext.setCheckpointDir`` (the real-cluster path — survives
    executor loss, required at 100 TB), else ``localCheckpoint()``
    (executor-local blocks, fastest on a single box). Checkpoint blocks
    are freed by the ContextCleaner once the frame is unreferenced."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint()
    return df.localCheckpoint()


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Cluster near-dup pairs into duplicate groups: each node gets the
    minimum reachable id as ``group_id`` (the canonical survivor).

    Distributed label propagation (Pregel-lite): labels start as self,
    every iteration each node takes the min label among itself and its
    neighbors, until a fixpoint. Iterations = graph diameter, which for
    dedup graphs (dense cliques of near-identical docs) is tiny; each
    iteration is one shuffle join on node id. Labels are checkpointed
    per round (:func:`_truncate_lineage`) so both the executed lineage
    AND the logical plan stay flat — a persist alone leaves each
    round's plan nesting all previous rounds, and Catalyst re-analysis
    of that growing tree dominates wall time.
    """
    edges = _truncate_lineage(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = _truncate_lineage(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("group_id", F.col("id"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("group_id").alias("nbr_min"))
        )
        new_labels = _truncate_lineage(
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("group_id"), F.coalesce(F.col("nbr_min"), F.col("group_id"))
                ).alias("group_id"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.group_id") != F.col("o.group_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", "group_id")


# -- embedding near-dup --------------------------------------------------
def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    exact: bool = False,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold.

    Default (scale) plan: banded RHP-LSH prefilter
    (similarity.rhp_banded_candidate_pairs — band count auto-sized from
    the threshold for <=1e-4 miss probability per qualifying pair) ->
    exact cosine verification on candidates only. The band join
    shuffles narrow (id, band) keys; the verify join rehydrates just
    the candidate vectors. ``exact=True`` opts into the O(n^2)
    all-pairs baseline (the audited brute-force reference plan).
    """
    from .similarity import dot, norm, rhp_banded_candidate_pairs

    # norms precompute per VECTOR in the pre-join projections (n rows)
    # instead of per candidate PAIR: cosine needs three array folds
    # (dot + both norms) and the two norm folds were being re-evaluated
    # for every candidate — 2/3 of the verify cost at any selectivity.
    # Operand-for-operand the same expression as cosine(va, vb) =
    # dot / (norm * norm), so every rounded value is bit-identical.
    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("_na"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("_nb"),
    )
    if exact:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        cand = rhp_banded_candidate_pairs(
            emb, threshold=threshold, id_col=id_col, vec_col=vec_col, dim=dim
        )
        pairs = cand.join(a, "id_a").join(b, "id_b")
    cos = F.round(
        dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb")), 6
    )
    return (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023):
    coarse-cluster the embeddings (one broadcast join against K
    centroids — similarity.ivf_assign), then within each cluster drop
    every vector whose cosine to a LOWER-id cluster-mate clears the
    threshold (deterministic survivor = min id per semantic group).

    Scale shape: the pairwise work is confined to clusters —
    O(sum |c_i|^2), never the corpus cross-product — and the
    within-cluster self-join is partition-local once the assignment
    table is written partitionBy(cluster_id) (similarity.
    ivf_index_write). Output: (vec_id, cluster_id, max_cos, keep).
    """
    from .similarity import dot, ivf_assign, norm

    # per-vector norm precomputed BEFORE the within-cluster self-join
    # (the embedding_neardup_pairs r8 device): cosine's two norm folds
    # would otherwise re-evaluate per PAIR; dot/(na*nb) is operand-for-
    # operand the cosine(a, b) expression, so values are bit-identical
    # materialized once (localCheckpoint/checkpoint, r8): the
    # assignment table feeds THREE consumers (both self-join sides +
    # the final left join); the pin guarantees the broadcast +
    # argmax-window subtree runs once by construction instead of
    # relying on exchange reuse surviving plan changes
    assigned = _truncate_lineage(
        ivf_assign(fan_out(emb), centroids, id_col=id_col, vec_col=vec_col).select(
            F.col(id_col), F.col(vec_col), "cluster_id",
            norm(F.col(vec_col)).alias("_nv"),
        )
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = F.round(
        dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        / (F.col("a._nv") * F.col("b._nv")),
        6,
    )
    pair_max = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias(id_col), cos.alias("cos"))
        .groupBy(id_col)
        .agg(F.max("cos").alias("max_cos"))
    )
    return (
        assigned.join(pair_max, id_col, "left")
        .select(
            F.col(id_col),
            "cluster_id",
            F.coalesce(F.col("max_cos"), F.lit(-1.0)).alias("max_cos"),
            (F.coalesce(F.col("max_cos"), F.lit(-1.0)) < threshold).alias("keep"),
        )
    )


def band_bucket_pairs(
    bands: DataFrame,
    id_col: str,
    sig_cols: list[str],
    max_band_size: int | None = None,
    overflow: str = "star",
) -> DataFrame:
    """Shared bucket-combinatorics core for the hamming-band pair
    family (:func:`simhash_hamming_pairs`,
    :func:`multimodal.dhash_hamming_pairs`) — the
    :func:`lsh_candidate_pairs` group-mode device generalized to carry
    signature payloads for downstream hamming verification.

    Input: one row per (``id_col``, ``*sig_cols``, band, val) band
    assignment. Plan: groupBy (band, val) collects each bucket's
    (id, sigs) members ONCE (the signature pipeline is never computed
    twice, unlike a self-join whose two sides canonicalize as
    different exchanges), then per bucket:

    - size <= ``max_band_size`` (or no cap): emit all C(m,2) unordered
      pairs via array combinatorics.
    - size > cap, ``overflow="star"``: emit only the m-1 star edges to
      the bucket's min-id member. An over-cap bucket on a real corpus
      is a near-identical swarm (byte-identical boilerplate / blank
      images sharing one signature); its quadratic pair set is
      redundant for duplicate GROUPING — the star is connectivity-
      equivalent (same connected components) at O(m) output, the
      ``lsh_band_star_edges`` argument. The two branches are selected
      by slicing the SOURCE array (empty for the branch that does not
      apply), never by a CaseWhen over the materialized pair arrays —
      measured on a 30k-member bucket, ``when(over, star)
      .otherwise(all_pairs)`` still paid the C(30k,2) construction, so
      the quadratic expression must only ever see the capped source.
    - size > cap, ``overflow="drop"``: drop the bucket (the
      ``lsh_candidate_pairs`` group-mode cap; use when downstream
      needs only verified TRUE pairs and boilerplate swarms are
      handled by exact dedup).

    Returns distinct (ia, ib, <sig>_a..., <sig>_b...) candidate rows;
    callers apply the exact hamming verify. Like group-mode LSH, an
    over-cap bucket is still *collected* on one task (linear memory in
    bucket size) — at 100 TB that is one array of ids+fixed-width
    signatures per bucket, fine into the tens of millions of members.
    """
    if overflow not in ("star", "drop"):
        raise ValueError(f"overflow must be 'star' or 'drop', got {overflow!r}")
    member = F.struct(
        F.col(id_col).alias("i"), *[F.col(c).alias(c) for c in sig_cols]
    )
    buckets = bands.groupBy("band", "val").agg(F.collect_list(member).alias("_m"))
    arr = F.col("_m")

    def pair_struct(x, y):
        return F.struct(
            x["i"].alias("ia"),
            y["i"].alias("ib"),
            *[x[c].alias(f"{c}_a") for c in sig_cols],
            *[y[c].alias(f"{c}_b") for c in sig_cols],
        )

    def all_pairs(src):
        return F.filter(
            F.flatten(
                F.transform(src, lambda x: F.transform(src, lambda y: pair_struct(x, y)))
            ),
            lambda s: s["ia"] < s["ib"],
        )

    if max_band_size is None:
        emitted = all_pairs(arr)
    elif overflow == "drop":
        buckets = buckets.where(F.size(arr) <= max_band_size)
        emitted = all_pairs(arr)
    else:
        # struct arrays sort by leading field, so sorted[0] is the
        # min-id member; ids are unique within a bucket (one band
        # row per id per band), so every star edge has ia < ib.
        # Head and both branch sources are MATERIALIZED as columns
        # first: expressions referenced inside a higher-order-function
        # lambda re-evaluate per element, so an inlined array_sort
        # turns the m-1 star emission into O(m^2 log m) work
        # (measured: 204 s for ONE 30k-member bucket; 1 s once
        # projected).
        over = F.size(arr) > max_band_size
        srt = F.array_sort(arr)
        buckets = buckets.select(
            "band",
            "val",
            F.element_at(srt, 1).alias("_head"),
            F.slice(
                srt, 1, F.when(over, F.lit(0)).otherwise(F.size(arr))
            ).alias("_psrc"),
            F.slice(
                srt, 2, F.when(over, F.size(arr) - 1).otherwise(F.lit(0))
            ).alias("_ssrc"),
        )
        emitted = F.concat(
            all_pairs(F.col("_psrc")),
            F.transform(
                F.col("_ssrc"), lambda m: pair_struct(F.col("_head"), m)
            ),
        )
    cols = ["ia", "ib"]
    for c in sig_cols:
        cols += [f"{c}_a", f"{c}_b"]
    return (
        buckets.select(F.explode(emitted).alias("p"))
        .select(*[F.col(f"p.{c}").alias(c) for c in cols])
        .distinct()
    )


def simhash_hamming_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    n_bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_band_size: int | None = None,
    overflow: str = "star",
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-dup candidate pairs by SimHash hamming distance: the
    signature is cut into ``n_bands`` bit-bands; pairs sharing any band
    value are candidates (pigeonhole: distance <= n_bands-1 implies
    some band is identical, so recall is complete for
    max_hamming <= n_bands-1); candidates are verified exactly with
    bit_count(xor). Candidates come from :func:`band_bucket_pairs`
    (one grouped scan, signatures computed once, never a corpus cross
    product); the verify is integer ALU work on the signatures (raw
    text is never re-read).

    ``max_band_size``/``overflow`` are the hot-bucket escape hatch: a
    boilerplate-heavy corpus puts a double-digit share of docs on ONE
    signature, and that band bucket otherwise emits C(m,2) pairs in a
    single task. ``overflow="star"`` keeps m-1 connectivity-equivalent
    edges instead (an over-cap bucket of identical signatures — the
    realistic mega-bucket — yields the same verified components; for
    a mixed over-cap bucket non-star pairs are forgone, the same
    recall trade-off ``streaming_lsh_pairs`` documents).

    ``hash_fn``/``n_bits`` pick the signature family and width (r8):
    the md5 family (graded, DuckDB-reproducible) tops out at 32 bits
    (one bit per hex digit); the xxhash64 PRODUCTION family reads up
    to 63 bits off one JVM-intrinsic hash per token — at 50k+ docs the
    band buckets need the wider widths (expected random candidates are
    C(n,2) * bands / 2^(n_bits/n_bands); BASELINE.md r8 measures
    48-bit xxhash64 vs 32-bit md5 at 50k docs)."""
    sh = simhash(df, text_col, id_col, n_bits, hash_fn=hash_fn)  # validates widths
    band_bits = n_bits // n_bands
    mask = (1 << band_bits) - 1
    bands = sh.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(
        F.col(id_col), "simhash", F.col("bk.band").alias("band"), F.col("bk.val").alias("val")
    )
    cand = band_bucket_pairs(bands, id_col, ["simhash"], max_band_size, overflow)
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"), "hamming")
    )


def content_hash_index(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The persistent dedup index: one row per distinct content hash
    with the id that owns it (min id). This is what a production
    pipeline parks between ingests (bucketed/partitioned by hash so
    the incremental anti-join below co-locates)."""
    return (
        df.select(F.md5(normalize_text(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
    )


def dedup_against_index(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup: survivors of a NEW batch against a
    persistent content-hash index — the shape every continuously-
    ingesting corpus needs (never re-scan history; join the delta
    against the parked index).

    Two steps, both hash-keyed: (1) dedup WITHIN the batch (min-id per
    hash — one shuffle over the delta only), (2) LEFT ANTI join against
    the index on the hash. With the index bucketed by content_hash the
    anti-join is co-located (no index shuffle); a Bloom/KMV sketch of
    the index prunes the delta before the join at extreme scale
    (sketches.bloom_prune composes here).
    """
    hashed = new_df.withColumn("content_hash", F.md5(normalize_text(text_col)))
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    in_batch = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return in_batch.join(
        index.select("content_hash"), "content_hash", "left_anti"
    ).drop("_rn")


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    round_to: int = 9,
    dedupe_edges: bool = True,
    truncate_threshold: int = 4,
) -> DataFrame:
    """PageRank over an undirected pair graph (e.g. near-duplicate
    candidate pairs): rank r_i+1(v) = (1-d)/N + d * sum_u r_i(u)/deg(u)
    over neighbors. Used to pick the most "central" copy of a duplicate
    cluster as the canonical survivor.

    DataFrame-native Lloyd-style loop: each iteration is ONE join
    (ranks onto the symmetrized edge list) + ONE groupBy sum — no RDDs,
    no driver-side graph. Ranks are rounded to ``round_to`` after every
    iteration so the double sums are reproducible cross-engine (the
    rounded values are the next iteration's exact inputs). Isolated
    vertices keep the teleport mass (1-d)/N.

    The loop invariants (graph, degrees) are materialized with
    :func:`_truncate_lineage` (checkpoint). Each round's ranks are
    checkpointed too — but only when ``iterations`` exceeds
    ``truncate_threshold``: per-round truncation exists to stop
    Catalyst re-analysis of an unboundedly nesting plan, and for a
    handful of rounds the nested plan is small enough that the
    checkpoint's materialization job costs more than the analysis it
    saves (measured ~1 s of fixed job cost per round at sf0.1). Below
    the threshold the whole loop evaluates as ONE action over the flat
    checkpointed sym/deg inputs; above it every round truncates, which
    keeps analysis O(1)/round for deep loops.
    """
    # the symmetrizing union consumes ``edges`` twice — checkpoint so
    # the upstream edge pipeline (e.g. the whole LSH signature plan,
    # including its band-size-cap aggregation) executes once, not once
    # per union arm, and so the loop below starts from a flat plan
    edges = _truncate_lineage(edges)
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionAll(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    if dedupe_edges:
        # Needed only when the input may carry duplicate pairs: a dup
        # edge would otherwise double its contribution. Canonical LSH
        # pairs (DISTINCT, src < dst) cannot collide across the two
        # union arms — callers pass dedupe_edges=False and skip this
        # 2|E| shuffle entirely.
        sym = sym.distinct()
    # materialize the graph ONCE, pre-partitioned on src: every
    # iteration joins ranks+deg onto sym by src and deg itself
    # aggregates by src, so the hash(src) layout makes the
    # per-iteration sym/deg sides exchange-free (ranks is one row per
    # vertex — AQE broadcasts it).
    sym = _truncate_lineage(sym.repartition(F.col("src")))
    deg = _truncate_lineage(
        sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    )
    # vertex set straight off the degree table (one row per vertex) —
    # no separate distinct over the edge list; the alias mints a fresh
    # attribute so later verts⋈deg-derived joins aren't self-ambiguous
    verts = deg.select(F.col("id").alias("id"))
    n = verts.count()
    if n == 0:
        # empty graph (e.g. a corpus with no duplicate candidates) —
        # no vertices to rank; return the empty typed frame instead of
        # dividing by zero
        return verts.select("id", F.lit(None).cast("double").alias("rank"))
    ranks = verts.select("id", F.round(F.lit(1.0 / n), round_to).alias("rank"))
    base = F.round(F.lit((1.0 - damping) / n), round_to)  # engine-side
    # rounding (half-up) — Python's banker's round would diverge from
    # the SQL oracle on exact half boundaries
    for _ in range(iterations):
        contrib = (
            sym.join(ranks, sym.src == ranks.id)
            .join(deg, sym.src == deg.id)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        incoming = contrib.groupBy("id").agg(
            F.round(F.sum(F.round(F.col("c"), round_to)), round_to).alias("in_sum")
        )
        ranks = (
            verts.join(incoming, "id", "left")
            .select(
                "id",
                F.round(
                    base + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0)),
                    round_to,
                ).alias("rank"),
            )
        )
        # per-iteration truncation keeps every round's plan constant
        # size (one join + one agg over flat inputs) for DEEP loops;
        # shallow loops (<= truncate_threshold rounds) skip it — the
        # nested plan is bounded and one action beats N checkpoint jobs
        if iterations > truncate_threshold:
            ranks = _truncate_lineage(ranks)
    return ranks


def dedup_exact_keep_agg(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Skew-resilient exact-dedup survivor filter: aggregate min-id per
    content hash (map-side combine collapses each partition's copies of
    a hot hash to ONE row before the shuffle), then inner-join the
    survivors back on (hash, id).

    Trade-off vs :func:`dedup_exact_keep` (single window): the window
    shuffles every copy of a mega-duplicated document into one task
    (sort-based, spillable, but serialized); this variant's first
    shuffle carries at most one row per (partition, hash). Prefer it
    when duplication is extreme (boilerplate pages duplicated millions
    of times); prefer the window when duplication is mild — this one
    scans the input twice and shuffles it once more for the join.
    """
    h = F.md5(normalize_text(text_col)).alias("content_hash")
    hashed = df.withColumn("content_hash", F.md5(normalize_text(text_col)))
    survivors = (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
    )
    return hashed.join(survivors, ["content_hash", id_col]).drop("content_hash")
