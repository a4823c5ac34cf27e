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
