"""Degree-ordered triangle counting (north-rule kernel; feeds Forman faces).

Each undirected edge is oriented from its lower-(degree, id) endpoint to the
higher one, bounding per-key join fan-out at O(sqrt(m)) even on power-law hub
vertices. Triangles = wedge join (two oriented edges sharing the apex) +
semi-join on the closing oriented edge. Exact vs ``nx.triangles``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .degrees import degree_table
from ..sources.edges import canonicalize


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient canonical edges low-rank -> high-rank by (degree, node id)."""
    und = canonicalize(edges)
    deg = degree_table(und).select("node", "degree")
    e = (
        und.join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "deg_src"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "deg_dst"), "dst")
    )
    lower_first = F.struct("deg_src", "src") < F.struct("deg_dst", "dst")
    return e.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("b"),
        F.when(lower_first, F.col("deg_src")).otherwise(F.col("deg_dst")).alias("deg_a"),
        F.when(lower_first, F.col("deg_dst")).otherwise(F.col("deg_src")).alias("deg_b"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles as rows ``(a, b, c)`` (each triangle exactly once)."""
    o = oriented_edges(edges).cache()
    x = o.select(F.col("a"), F.col("b").alias("b1"), F.col("deg_b").alias("db1"))
    y = o.select(F.col("a"), F.col("b").alias("b2"), F.col("deg_b").alias("db2"))
    wedges = x.join(y, "a").filter(F.struct("db1", "b1") < F.struct("db2", "b2"))
    closing = o.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    tri = wedges.join(closing, ["b1", "b2"], "left_semi")
    return tri.select(F.col("a"), F.col("b1").alias("b"), F.col("b2").alias("c"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts ``(node, triangles)`` (0 rows omitted).

    Corners come from one explode of each triangle row — the 3-way
    union form re-ran the wedge-join subplan three times.
    """
    tri = triangles(edges)
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(F.count("*").alias("triangles"))


def triangle_count_global(edges: DataFrame) -> DataFrame:
    return triangles(edges).agg(F.count("*").alias("n_triangles"))


def transitivity(edges: DataFrame) -> DataFrame:
    """Global clustering coefficient (transitivity): ``3*T / W`` where
    ``T`` is the triangle count and ``W = sum_v d(v)*(d(v)-1)/2`` the
    wedge (open-triad) count — ``nx.transitivity`` semantics. One row
    ``(n_triangles, n_wedges, transitivity)``; 0.0 on a wedge-free graph.

    Scale: the degree-ordered triangle join (per-key fan-out O(sqrt(m)))
    plus one map-side-combinable degree aggregate; both sides collapse to
    a single row before the broadcast cross join, so nothing here grows
    with |E|. d*(d-1) is always even, so the per-node integer halving is
    exact.
    """
    und = canonicalize(edges)
    deg = degree_table(und).select("node", "degree")
    wed = deg.agg(
        F.coalesce(
            F.sum(F.expr("degree * (degree - 1) div 2")), F.lit(0)
        ).alias("n_wedges")
    )
    tri = triangle_count_global(edges)
    return tri.crossJoin(F.broadcast(wed)).select(
        "n_triangles",
        "n_wedges",
        F.when(
            F.col("n_wedges") > 0,
            F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
        )
        .otherwise(F.lit(0.0))
        .alias("transitivity"),
    )


def edge_embeddedness(edges: DataFrame) -> DataFrame:
    """Per-edge embeddedness: ``common_neighbors`` = |N(u) ∩ N(v)| (the
    number of triangles through the edge) and ``jaccard`` = the
    neighborhood overlap cn / (deg_u + deg_v - 2 - cn) — the standard
    tie-strength feature (Easley-Kleinberg ch. 3; strong links embed in
    triangles, bridges don't). Bridges are kept with cn = 0, and a
    degenerate edge between two degree-1 nodes gets jaccard 0.0.

    Scale: reuses the degree-ordered triangle enumeration (per-key join
    fan-out O(sqrt(m)) even on power-law hubs); the per-edge rollup is
    one map-side-combinable groupBy on the canonical edge key, then two
    degree joins on a table of size |V| — no new shuffle shape beyond
    ``triangles()``.
    """
    und = canonicalize(edges)
    tri = triangles(edges)
    # one explode, not a 3-way union: the union form repeats the whole
    # triangle-enumeration subplan three times (3x the wedge join at any
    # scale); exploding each triangle into its three canonical sides
    # references it once
    sides = tri.select(
        F.explode(
            F.array(
                F.struct(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")),
                F.struct(F.least("a", "c").alias("src"), F.greatest("a", "c").alias("dst")),
                F.struct(F.least("b", "c").alias("src"), F.greatest("b", "c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    cn = sides.groupBy("src", "dst").agg(F.count("*").alias("cn"))
    deg = degree_table(und).select("node", "degree")
    out = (
        und.select("src", "dst")
        .join(cn, ["src", "dst"], "left")
        .join(
            deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "deg_src"),
            "src",
        )
        .join(
            deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "deg_dst"),
            "dst",
        )
    )
    c = F.coalesce(F.col("cn"), F.lit(0)).cast("long")
    denom = (F.col("deg_src") + F.col("deg_dst") - F.lit(2) - c).cast("double")
    return out.select(
        "src",
        "dst",
        c.alias("common_neighbors"),
        F.when(denom > 0, c.cast("double") / denom).otherwise(F.lit(0.0)).alias("jaccard"),
    )


def square_count(edges: DataFrame) -> DataFrame:
    """Global 4-cycle (square) count: ``#C4 = (1/2) * sum over node pairs
    {u,v} of C(codegree(u,v), 2)`` — every square is counted once per
    diagonal pair and has exactly two diagonals. Squares are the
    bipartite-exchange graphlet (link farms and mutual-promotion rings
    are square-dense but can be triangle-free), so #C4 alongside
    #triangles separates clique-like from bipartite-like density.

    Shape: one self-join of the symmetrized edge table on the shared
    middle node (the wedge enumeration triangle counting already pays —
    Σ deg² rows, hub-capped upstream if needed), one map-side-combinable
    codegree aggregate keyed by the (u,v) pair, one 1-row reduction.
    Returns one row ``(n_squares, n_codegree_pairs)``.
    """
    und = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst")).distinct()
    sym = und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    wedges = (
        sym.select(F.col("src").alias("u"), F.col("dst").alias("x"))
        .join(sym.select(F.col("src").alias("x"), F.col("dst").alias("v")), "x")
        .filter(F.col("u") < F.col("v"))
    )
    codeg = wedges.groupBy("u", "v").agg(F.count(F.lit(1)).alias("cn"))
    return codeg.agg(
        (F.sum(F.col("cn") * (F.col("cn") - 1) / 2) / 2).cast("long").alias("n_squares"),
        F.count(F.lit(1)).alias("n_codegree_pairs"),
    )
