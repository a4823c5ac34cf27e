"""Louvain local-moving phase as synchronous DataFrame rounds.

The modularity-ascent workhorse of web-graph community detection (Blondel
et al. 2008 §2, phase 1): every round, each node evaluates the modularity
gain of moving into each neighboring community and takes the best
strictly-positive move. The classic algorithm applies moves one node at a
time — inherently sequential — so the distributed form applies all
best-moves SYNCHRONOUSLY per round (the "parallel Louvain" variant of
Staudt & Meyerhenke 2016): gains are computed against the previous
round's labels, every node moves at once, bounded rounds. That trades
the sequential guarantee of monotone modularity for a constant number of
shuffles per round; ties and oscillations are broken deterministically
by (gain desc, community id asc) and the strict gain>0 gate.

Determinism note: with integer-valued edge weights (web link graphs:
weight 1, host graphs: link counts) every sum here is exact in doubles,
so gains replay bit-for-bit in the DuckDB oracle (`louvain_4r`). With
arbitrary float weights the gains depend on float summation order and
only the Spark-side result is defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.lineage import truncate_plan
from ..sources.edges import canonicalize


def louvain_moves(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Bounded synchronous Louvain move rounds. Returns ``(node,
    community)`` after exactly ``rounds`` rounds (labels start as node
    ids, so round 0 is the singleton partition).

    Per-round shape (constant number of shuffles, no driver action):
    one |V|-sized groupBy for community weight totals, one edge-keyed
    groupBy for per-(node, neighbor-community) weights — map-side
    combinable, the heavy stage, O(|E|) rows in and at most |E| out —
    two broadcast-ready joins against the community-total table, a
    row_number window per node (group size = distinct neighbor
    communities, bounded by degree), and one label join. Lineage is
    truncated per round so plans stay constant-size.

    Gain of moving i from its community a into neighbor community b
    (no self-loops; standard Blondel et al. delta with i removed from a
    first)::

        gain = (w_ib - w_ia) / m  -  k_i * (tot_b - (tot_a - k_i)) / (2 m^2)
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    und = canonicalize(edges).select("src", "dst", "weight")
    sym = und.unionAll(
        und.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    # the symmetrized edge table is joined on ``dst`` every round — cache it
    # partitioned by that key so rounds reshuffle only the |V|-sized label
    # table (guide §2.4); ki is read twice per round, cache it too
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    sym = truncate_plan(sym).repartition(n_part, "dst").cache()
    ki = (
        sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("k")).cache()
    )
    m = und.agg(F.sum("weight").alias("m"))
    lab = ki.select("node", F.col("node").alias("c"))

    for _ in range(rounds):
        tot = (
            lab.join(ki, "node")
            .groupBy("c")
            .agg(F.sum("k").alias("tot"))
        )
        nbr = (
            sym.join(
                lab.select(F.col("node").alias("dst"), F.col("c").alias("cj")),
                "dst",
            )
            .groupBy(F.col("src").alias("node"), "cj")
            .agg(F.sum("weight").alias("w"))
        )
        cur = lab.select("node", F.col("c").alias("ci"))
        # one consumption of nbr: attach the own-community weight in-row
        # with a window over the join's existing node clustering instead of
        # re-joining a second filtered copy of the nbr subtree (nbr is
        # grouped by (node, cj), so the own row is unique and the window
        # sum equals the old join's w_own exactly)
        w_node = Window.partitionBy("node")
        x = (
            nbr.join(cur, "node")
            .withColumn(
                "w_own",
                F.sum(F.when(F.col("cj") == F.col("ci"), F.col("w"))).over(w_node),
            )
        )
        cand = (
            x.filter(F.col("cj") != F.col("ci"))
            .join(ki, "node")
            .join(tot.select(F.col("c").alias("cj"), F.col("tot").alias("tot_b")), "cj")
            .join(tot.select(F.col("c").alias("ci"), F.col("tot").alias("tot_a")), "ci")
            .crossJoin(F.broadcast(m))
            .select(
                "node",
                "cj",
                (
                    (F.col("w") - F.coalesce(F.col("w_own"), F.lit(0.0))) / F.col("m")
                    - F.col("k")
                    * (F.col("tot_b") - (F.col("tot_a") - F.col("k")))
                    / (F.lit(2.0) * F.col("m") * F.col("m"))
                ).alias("gain"),
            )
        )
        best = (
            cand.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("gain")).alias("ng"), F.col("cj").alias("cj"))
                ).alias("b")
            )
            .filter(F.col("b.ng") < 0)
            .select("node", F.col("b.cj").alias("c_new"))
        )
        lab = (
            lab.join(best, "node", "left")
            .select("node", F.coalesce("c_new", "c").alias("c"))
            .transform(lambda df: truncate_plan(df, eager=False))
        )
    out = truncate_plan(lab.select("node", F.col("c").alias("community")))
    sym.unpersist()
    ki.unpersist()
    return out
