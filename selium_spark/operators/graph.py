"""Graph analytics beyond the dedup-specific ops (connected components
and PageRank live in :mod:`selium_spark.operators.dedup` where they
canonicalize duplicate clusters).

No reference analogue: selium has no graph operators. These are the
standard distributed-graph additions a relationship-heavy corpus needs
(co-occurrence graphs, similarity graphs from LSH candidate pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _truncate_lineage


def triangle_count(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Exact triangle counting via degree orientation (the
    Ortmann/Brandes // Suri-Vassilvitskii "node-iterator with
    orientation" scheme): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, build wedges from
    co-oriented arc pairs, and close each wedge against the arc set.

    Why this shape at scale: naive wedge generation fans out
    quadratically on hub nodes (a node with degree d spawns C(d,2)
    wedges). Orientation caps every node's OUT-degree at O(sqrt(m))
    for arbitrary graphs (and at the arboricity for sparse ones), so
    the wedge table — the only superlinear intermediate — is bounded
    by sum(outdeg^2) <= m^1.5 instead of sum(deg^2), which is the
    difference between a skew-killed shuffle and a balanced one at
    100 TB. Three shuffles total: degree agg, wedge self-join on the
    pivot, closing equi-join on (v, w).

    Input ``edges`` must be distinct undirected pairs with
    ``src < dst``. Returns a single row: (n_nodes, n_edges, n_wedges,
    n_triangles).
    """
    # the census needs four aggregates over subtrees of the same edge
    # pipeline; materialize the (small, support-pruned) edge list once
    # so the branches share blocks instead of each re-running the
    # upstream build (4x the pipeline cost otherwise -- measured)
    e = _truncate_lineage(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by (deg, id): lower endpoint -> higher endpoint
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("_db"))
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("_da") < F.col("_db"))
                | ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("arc")
        )
        .select("arc.u", "arc.v")
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").where(F.col("x") < F.col("y"))
    # close against the ORIGINAL id-sorted edge set, not the oriented
    # arcs: the wedge pair (x, y) is id-ordered, while the arc between
    # them is (deg, id)-ordered and may point y -> x
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tris = wedges.join(closing, ["x", "y"])
    return (
        tris.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(F.broadcast(e.agg(F.count(F.lit(1)).alias("n_edges"))))
        .crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes"))))
        .crossJoin(F.broadcast(wedges.agg(F.count(F.lit(1)).alias("n_wedges"))))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    )


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
) -> DataFrame:
    """Co-occurrence edges: items appearing in the same order, kept
    when the pair recurs in >= ``min_support`` orders (support
    pruning keeps the edge set linear-ish in orders, not quadratic in
    basket size — baskets are small and bounded, so the within-order
    pair explode is map-side O(k^2) with k = basket size).

    One shuffle on the order key builds baskets; the pair explode is
    map-side; the support count shuffles once on the (a, b) pair key.
    """
    baskets = lineitem.groupBy(order_col).agg(
        F.array_sort(F.collect_set(F.col(item_col))).alias("items")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (x, i) -> "
                "transform(slice(items, i + 2, size(items)), y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
        .select("a", "b")
    )
