"""PageRank power iteration (north-rule kernel).

Exactly NetworkX's update so fixture parity holds to 1e-6:

    r'(v) = (1-d)/N + d * ( sum_{u->v} r(u) * w(u,v) / wout(u) + dangle/N )
    dangle = sum of r over nodes with no out-edges
    stop when sum |r' - r| < N * tol   (or after a fixed iteration count)

Structure per iteration: one shuffle join (ranks ⋈ edges on src) + one
aggregation on dst; the node table and normalized edge table are computed
once and reused. ``localCheckpoint`` truncates lineage every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.lineage import truncate_plan


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    num_iterations: int | None = None,
    directed: bool = True,
    init: DataFrame | None = None,
) -> DataFrame:
    """Returns ``(node, pagerank)``.

    ``num_iterations`` set → run exactly that many rounds with no
    convergence action (deterministic, SQL-oracle-friendly). Undirected
    input (canonical rows) is symmetrized first, matching ``nx.pagerank``
    on a ``Graph``.

    ``init`` (optional ``(node, pagerank)``) warm-starts the iteration
    from prior scores instead of the uniform vector — the incremental
    crawl-update pattern: after a recrawl adds/changes edges, a few warm
    rounds from last crawl's ranks converge far faster than a cold
    restart (nx.pagerank's ``nstart``). Nodes absent from ``init`` (pages
    first seen this crawl) start at 1/N of the CURRENT graph; the vector
    is NOT renormalized, exactly like ``nstart``-style warm starts, so a
    fixed iteration count stays a pure function of (edges, init).
    """
    if not directed:
        edges = edges.select("src", "dst", "weight").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    wout = edges.groupBy("src").agg(F.sum("weight").alias("wout"))
    # normalized transition edges, computed once
    trans = edges.join(wout, "src").select(
        "src", "dst", (F.col("weight") / F.col("wout")).alias("p")
    ).cache()
    trans.count()
    out_nodes = wout.select(F.col("src").alias("node"))
    dangling = nodes.join(out_nodes, "node", "left_anti").cache()

    if init is None:
        ranks = nodes.withColumn("pagerank", F.lit(1.0 / n))
    else:
        ranks = (
            nodes.join(
                init.select("node", F.col("pagerank").alias("_init")), "node", "left"
            )
            .select(
                "node", F.coalesce("_init", F.lit(1.0 / n)).alias("pagerank")
            )
        )
    base = (1.0 - damping) / n
    iters = num_iterations if num_iterations is not None else max_iter
    for _ in range(iters):
        # dangling mass folded in as a broadcast scalar aggregate — keeps the
        # whole round a single job (no driver-side collect for the formula)
        dangle_df = (
            ranks.join(dangling, "node", "left_semi")
            .agg(F.coalesce(F.sum("pagerank"), F.lit(0.0)).alias("_dangle"))
        )
        contrib = (
            trans.join(ranks, trans.src == ranks.node)
            .select("dst", (F.col("p") * F.col("pagerank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        new_rank = (
            F.lit(base)
            + F.lit(damping)
            * (F.coalesce("c", F.lit(0.0)) + F.col("_dangle") / F.lit(float(n)))
        )
        if num_iterations is None:
            # convergence mode, ONE job per round: joining `ranks` (same node
            # set as `nodes`) keeps the previous rank in-row, so the L1 delta
            # is a plain column — and the lazy plan truncation makes the
            # delta aggregate the very action that materializes the round.
            staged = (
                ranks.join(contrib, ranks.node == contrib.dst, "left")
                .crossJoin(F.broadcast(dangle_df))
                .select(
                    "node",
                    new_rank.alias("new_pagerank"),
                    F.abs(new_rank - F.col("pagerank")).alias("_delta"),
                )
                .withColumnRenamed("new_pagerank", "pagerank")
                .transform(lambda d: truncate_plan(d, eager=False))
            )
            err = staged.agg(F.sum("_delta")).collect()[0][0]
            ranks = staged.drop("_delta")
            if err < n * tol:
                break
        else:
            ranks = (
                nodes.join(contrib, nodes.node == contrib.dst, "left")
                .crossJoin(F.broadcast(dangle_df))
                .select("node", new_rank.alias("pagerank"))
                .transform(truncate_plan)
            )
    return ranks
