"""Minimum spanning forest via distributed Borůvka rounds.

The backbone-extraction primitive of weighted link graphs (host-affinity
backbones, visualization skeletons, clustering pre-steps). Borůvka is THE
shuffle-friendly MST algorithm: every round each component picks its
minimum incident cross-edge (one join + one map-side-combinable min
aggregate), components merge, and the component count at least halves —
O(log n) rounds regardless of graph shape, each round a constant number
of shuffles. Kruskal/Prim are inherently sequential and never considered.

Determinism: edges are totally ordered by ``(weight, src, dst)``, so the
per-component minimum is unique even on constant-weight web graphs and
the result is exactly the MST under that total order (equal to the unique
MST whenever weights are distinct). The bounded-``rounds`` form unrolls
identically in the DuckDB oracle (`mst_forest` driver query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.lineage import truncate_plan
from ..sources.edges import canonicalize
from .components import connected_components_hybrid


def minimum_spanning_forest(
    edges: DataFrame,
    rounds: int | None = None,
    max_rounds: int = 40,
    collect_cap: int = 100_000,
) -> DataFrame:
    und = canonicalize(edges).select("src", "dst", "weight")
    live = truncate_plan(und)
    forest: DataFrame | None = None
    fixpoint = rounds is None

    nodes = (
        und.select(F.col("src").alias("node"))
        .union(und.select(F.col("dst").alias("node")))
        .distinct()
    )

    if fixpoint:
        spark = edges.sparkSession
        n_nodes = nodes.count()
        if n_nodes <= collect_cap:
            return _msf_driver_labels(spark, live, n_nodes, max_rounds)
    # distributed-label path (rounds=k declarative form, and the
    # above-cap fixpoint fallback) — identical to round 5
    n_rounds = rounds if rounds is not None else max_rounds
    lab = nodes.select("node", F.col("node").alias("component"))
    for _ in range(n_rounds):
        cu = lab.select(F.col("node").alias("src"), F.col("component").alias("cu"))
        cv = lab.select(F.col("node").alias("dst"), F.col("component").alias("cv"))
        cross = (
            live.join(cu, "src")
            .join(cv, "dst")
            .filter(F.col("cu") != F.col("cv"))
        )
        cand = F.struct("weight", "src", "dst").alias("cand")
        both = cross.select(F.col("cu").alias("comp"), cand).unionAll(
            cross.select(F.col("cv").alias("comp"), cand)
        )
        chosen = (
            both.groupBy("comp")
            .agg(F.min("cand").alias("m"))
            .select("m.src", "m.dst", "m.weight")
            .distinct()
        )
        chosen = truncate_plan(chosen, eager=fixpoint)
        if fixpoint and chosen.isEmpty():
            break
        live = truncate_plan(cross.select("src", "dst", "weight"), eager=False)
        forest = chosen if forest is None else forest.unionAll(chosen)
        forest = truncate_plan(forest, eager=False)
        lab = connected_components_hybrid(forest.select("src", "dst"), vertices=nodes)
    if forest is None:
        return und.filter(F.lit(False)).select("src", "dst", "weight")
    return forest.select("src", "dst", "weight")


def _msf_driver_labels(spark, live: DataFrame, n_nodes: int, max_rounds: int):
    """Borůvka fixpoint with driver union-find labels (n_nodes under the
    collect cap). Per round: attach labels via one BROADCAST map (zero
    exchange on the edge side), pick each component's min cross-edge with
    one map-side-combinable aggregate, collect the <= #components chosen
    edges (the same rows the emptiness check already materializes), and
    merge them into the union-find. Chosen edges and final labels are
    identical to the distributed path (same (weight, src, dst) total
    order, same min-root merge)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    forest_rows: list[tuple[int, int, float]] = []
    for _ in range(max_rounds):
        merged = [(x, find(x)) for x in parent if find(x) != x]
        if merged:
            lab = spark.createDataFrame(merged, "n long, c long")
            cu = F.broadcast(lab.select(F.col("n").alias("src"), F.col("c").alias("_cu")))
            cv = F.broadcast(lab.select(F.col("n").alias("dst"), F.col("c").alias("_cv")))
            cross = (
                live.join(cu, "src", "left")
                .join(cv, "dst", "left")
                .select(
                    "src",
                    "dst",
                    "weight",
                    F.coalesce("_cu", F.col("src")).alias("cu"),
                    F.coalesce("_cv", F.col("dst")).alias("cv"),
                )
                .filter(F.col("cu") != F.col("cv"))
            )
        else:
            cross = live.select(
                "src", "dst", "weight", F.col("src").alias("cu"), F.col("dst").alias("cv")
            ).filter(F.col("cu") != F.col("cv"))
        cand = F.struct("weight", "src", "dst").alias("cand")
        both = cross.select(F.col("cu").alias("comp"), cand).unionAll(
            cross.select(F.col("cv").alias("comp"), cand)
        )
        rows = (
            both.groupBy("comp")
            .agg(F.min("cand").alias("m"))
            .select("m.src", "m.dst", "m.weight")
            .collect()
        )
        if not rows:
            break
        seen = set()
        for r in rows:
            key = (r["src"], r["dst"])
            if key in seen:
                continue
            seen.add(key)
            forest_rows.append((r["src"], r["dst"], r["weight"]))
            for x in key:
                parent.setdefault(x, x)
            ra, rb = find(key[0]), find(key[1])
            if ra == rb:
                continue
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
        live = truncate_plan(cross.select("src", "dst", "weight"), eager=False)
    if not forest_rows:
        return spark.createDataFrame([], "src long, dst long, weight double")
    return spark.createDataFrame(forest_rows, "src long, dst long, weight double")
