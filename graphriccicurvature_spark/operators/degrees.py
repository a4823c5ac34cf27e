"""Degree tables — the basic aggregation every other operator shares."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_table(edges: DataFrame, directed: bool = False) -> DataFrame:
    """Per-node degree.

    Undirected (canonical src<dst rows): ``degree`` = incident edge count
    and ``wdegree`` = incident weight sum. Directed: also ``in_degree`` /
    ``out_degree`` and the total ``degree`` = in+out (matching
    ``nx.DiGraph.degree`` used by the reference's node aggregation,
    OllivierRicci.py:518).
    """
    outs = edges.select(F.col("src").alias("node"), "weight").withColumn("is_out", F.lit(1))
    ins = edges.select(F.col("dst").alias("node"), "weight").withColumn("is_out", F.lit(0))
    both = outs.union(ins)
    agg = both.groupBy("node").agg(
        F.count("*").alias("degree"),
        F.sum("weight").alias("wdegree"),
        F.sum("is_out").alias("out_degree"),
        F.sum(1 - F.col("is_out")).alias("in_degree"),
    )
    if directed:
        return agg
    return agg.select("node", "degree", "wdegree")


def degree_powerlaw(edges: DataFrame, dmin: int = 2) -> DataFrame:
    """Discrete power-law exponent MLE over the degree distribution.

    Clauset-Shalizi-Newman (SIAM Rev. 2009, eq. 3.7) approximation for the
    tail ``degree >= dmin``::

        alpha = 1 + n_tail / sum_i ln(d_i / (dmin - 1/2))

    The one-number heavy-tail summary of a web link graph (real crawls sit
    near alpha ~ 2.1 in-degree). Returns one row
    ``(dmin, n_tail, alpha)``; ``alpha`` is NULL when the tail is empty.

    Scale: one shuffle for the degree table (shared, map-side combinable),
    then a single global aggregate — two numbers cross the wire per
    partition. ln() replays in DuckDB; the driver query rounds to 1e-6 so
    last-ulp libm differences can't flip the compare.
    """
    if dmin < 1:
        raise ValueError(f"dmin must be >= 1, got {dmin}")
    deg = degree_table(edges).select("degree")
    tail = deg.filter(F.col("degree") >= dmin)
    return tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.sum(F.log(F.col("degree") / F.lit(dmin - 0.5))).alias("_lsum"),
    ).select(
        F.lit(int(dmin)).alias("dmin"),
        "n_tail",
        (F.lit(1.0) + F.col("n_tail") / F.col("_lsum")).alias("alpha"),
    )
