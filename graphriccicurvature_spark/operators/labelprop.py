"""Synchronous label propagation (north-rule kernel).

Deterministic semantics (no randomness, exact-match testable):

- ``mode="majority"``: each round every node adopts the most frequent label
  among its neighbors (ties -> smallest label; nodes with no neighbors keep
  their own). Classic LPA with a deterministic tie-break.
- ``mode="min"``: each round ``label(v) = min(label(v), min over neighbors)``
  — bounded-round min-label propagation (after >= diameter rounds this equals
  connected components; SQL-oracle-expressible as a recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.lineage import truncate_plan


def label_propagation(
    edges: DataFrame,
    mode: str = "majority",
    max_iter: int = 10,
    directed: bool = False,
    check_convergence: bool = True,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """Returns ``(node, label)`` after synchronous rounds.

    ``vertices`` (optional single-column DataFrame) adds isolated nodes,
    which keep their own label forever."""
    assert mode in ("majority", "min")
    sym = edges.select("src", "dst")
    if not directed:
        sym = sym.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    # per-round neighbor join keys on sym.dst — cache the view partitioned
    # by that key so rounds reshuffle only the |V|-sized label table
    sym = sym.dropDuplicates(["src", "dst"]).repartition(n_part, "dst").cache()
    nodes = sym.select(F.col("src").alias("node")).union(
        sym.select(F.col("dst").alias("node"))
    )
    if vertices is not None:
        nodes = nodes.union(vertices.select(F.col(vertices.columns[0]).alias("node")))
    nodes = nodes.distinct().cache()

    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(max_iter):
        nbr_labels = sym.join(
            labels.withColumnRenamed("node", "dst").withColumnRenamed("label", "nbr_label"),
            "dst",
        ).select(F.col("src").alias("node"), "nbr_label")
        if mode == "min":
            picked = nbr_labels.groupBy("node").agg(F.min("nbr_label").alias("new_label"))
            new_labels = (
                labels.join(picked, "node", "left")
                .select("node", F.least(F.col("label"), F.coalesce("new_label", "label")).alias("label"))
            )
        else:
            counts = nbr_labels.groupBy("node", "nbr_label").agg(F.count("*").alias("c"))
            w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("nbr_label"))
            picked = (
                counts.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("node", F.col("nbr_label").alias("new_label"))
            )
            new_labels = (
                labels.join(picked, "node", "left")
                .select("node", F.coalesce("new_label", "label").alias("label"))
            )
        if check_convergence:
            # carry the previous label in-row so the convergence test is a
            # scalar aggregate on the round's own checkpoint — no
            # change-detection join, and the aggregate is the action that
            # materializes the round
            staged = truncate_plan(
                new_labels.join(
                    labels.select("node", F.col("label").alias("_old")), "node"
                ),
                eager=False,
            )
            changed = staged.agg(
                F.count(F.when(F.col("label") != F.col("_old"), 1))
            ).collect()[0][0]
            labels = staged.drop("_old")
            if changed == 0:
                break
        else:
            labels = new_labels.transform(truncate_plan)
    sym.unpersist()
    return labels
