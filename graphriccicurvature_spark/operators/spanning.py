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
) -> DataFrame:
    """Borůvka minimum spanning forest. Returns the forest's edge rows
    ``(src, dst, weight)`` (canonical ``src < dst``; |components| fewer
    rows than nodes).

    ``rounds=None`` runs to fixpoint with ONE count action per round
    (component count at least halves per round, so it takes <= ceil(log2 n)
    rounds); ``rounds=k`` runs exactly k rounds with no driver action —
    the unrolled-oracle form. Labels between rounds come from the hybrid
    connected-components over the accumulated forest (driver union-find
    under its cap, distributed large/small-star fixpoint above it); the
    forest never exceeds n-1 edges no matter how big |E| is, so the label
    step scales with |V|, not |E|.

    Scale shape per round: two broadcast-ready label joins against the
    (|V|-sized) label table, one filter dropping intra-component edges
    (the edge frontier shrinks monotonically), one min aggregate keyed by
    component (map-side combinable; the struct min is the deterministic
    total order), lineage truncated so round plans stay constant-size.
    """
    und = canonicalize(edges).select("src", "dst", "weight")
    live = truncate_plan(und)
    forest: DataFrame | None = None
    n_rounds = rounds if rounds is not None else max_rounds
    fixpoint = rounds is None

    # initial labels: every endpoint is its own component
    nodes = (
        und.select(F.col("src").alias("node"))
        .union(und.select(F.col("dst").alias("node")))
        .distinct()
    )
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
        # only edges still crossing (old) components can cross new ones:
        # the live frontier shrinks monotonically, so late rounds scan a
        # fraction of |E| on mostly-merged graphs
        live = truncate_plan(cross.select("src", "dst", "weight"), eager=False)
        forest = chosen if forest is None else forest.unionAll(chosen)
        forest = truncate_plan(forest, eager=False)
        lab = connected_components_hybrid(forest.select("src", "dst"), vertices=nodes)
    if forest is None:
        return und.filter(F.lit(False)).select("src", "dst", "weight")
    return forest.select("src", "dst", "weight")
