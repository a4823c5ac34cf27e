"""Link-graph analytics beyond the reference's operator set: HITS,
k-core decomposition, and co-citation Jaccard similarity.

These are webtext-pipeline operators a Common-Crawl-scale link graph
needs alongside PageRank/CC/LPA (BASELINE.json north_rule): hub/authority
scoring for crawl prioritization, k-core for dense-subgraph extraction,
and co-citation similarity for related-page discovery. The reference repo
(saibalmars/GraphRicciCurvature) has no analog — semantics here are the
standard published definitions (Kleinberg 1999 for HITS; Seidman 1983 for
k-core), pinned by the DuckDB oracles in ``__spark_entry__.py``.

Scale design: every operator below is pure DataFrame joins + codegen
aggregations (no Python UDFs, no collect loops). Iterative operators take
an explicit ``num_iterations``/``rounds`` so a bounded run is a single
declarative plan the oracle can replay; fixpoint modes pay one scalar
action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.lineage import truncate_plan


def hits(
    edges: DataFrame,
    num_iterations: int = 3,
    directed: bool = True,
) -> DataFrame:
    """Kleinberg HITS by power iteration; returns ``(node, hub, authority)``.

    Per iteration (L1 normalization, weights respected):

        auth(v) = sum_{u->v} w(u,v) * hub(u);   auth /= sum(auth)
        hub(u)  = sum_{u->v} w(u,v) * auth(v);  hub  /= sum(hub)

    started from hub = 1/N. Nodes with no in-edges (out-edges) hold
    authority (hub) 0. Per iteration: two shuffle joins + two partial-agg
    reductions; each L1 norm is an in-plan broadcast scalar (no driver
    collect), mirroring the pagerank dangling-mass pattern
    (pagerank.py:63-67). Lineage is truncated every round so the plan
    stays bounded at any iteration count.
    """
    if not directed:
        edges = edges.select("src", "dst", "weight").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    e = edges.select("src", "dst", "weight").cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    hub = nodes.withColumn("hub", F.lit(1.0 / n))
    auth = None
    for _ in range(num_iterations):
        a_raw = (
            e.join(hub, e.src == hub.node)
            .select("dst", (F.col("weight") * F.col("hub")).alias("x"))
            .groupBy("dst")
            .agg(F.sum("x").alias("x"))
        )
        a_norm = a_raw.agg(F.sum("x").alias("_na"))
        auth = (
            nodes.join(a_raw, nodes.node == a_raw.dst, "left")
            .crossJoin(F.broadcast(a_norm))
            .select(
                "node",
                (F.coalesce("x", F.lit(0.0)) / F.col("_na")).alias("authority"),
            )
            .transform(truncate_plan)
        )
        h_raw = (
            e.join(auth, e.dst == auth.node)
            .select("src", (F.col("weight") * F.col("authority")).alias("x"))
            .groupBy("src")
            .agg(F.sum("x").alias("x"))
        )
        h_norm = h_raw.agg(F.sum("x").alias("_nh"))
        hub = (
            nodes.join(h_raw, nodes.node == h_raw.src, "left")
            .crossJoin(F.broadcast(h_norm))
            .select(
                "node",
                (F.coalesce("x", F.lit(0.0)) / F.col("_nh")).alias("hub"),
            )
            .transform(truncate_plan)
        )
    out = hub.join(auth, "node")
    e.unpersist()
    return out


def _sym_degree(und: DataFrame) -> DataFrame:
    sym = und.select("src", "dst").union(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return sym.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("degree"))


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
) -> DataFrame:
    """k-core peel (Seidman); returns surviving ``(node, degree)``.

    Input is the canonical undirected edge table (src < dst, deduped).
    Each round drops every node whose degree in the current induced
    subgraph is < k, then induces the subgraph on the survivors.

    ``rounds=R`` runs exactly R peels as one declarative plan, zero
    driver actions — the form the DuckDB oracle replays (an unrolled
    R-round CTE chain). ``rounds=None`` peels to fixpoint, paying one
    scalar count per round (caches swap each round, previous unpersisted);
    at fixpoint every reported degree is >= k. Degrees in the output are
    measured in the final induced subgraph.

    Scale: each round is one groupBy (degree) + two semi-joins (induce);
    the node filter shrinks monotonically so later rounds get cheaper.
    Peel depth on web graphs is small (degeneracy ordering converges in
    tens of rounds at billions of edges).
    """
    cur = edges.select("src", "dst")
    if rounds is not None:
        for _ in range(rounds):
            keep = _sym_degree(cur).filter(F.col("degree") >= k).select("node")
            cur = (
                cur.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
                .select("src", "dst")
                # each round reads the previous edge set 3x (degree union x2
                # + induce); without a cut the plan re-evaluates the base
                # scan 3^rounds times. localCheckpoint bounds it to one
                # materialization per round — same cost shape as fixpoint
                # mode, minus its count actions.
                .transform(truncate_plan)
            )
        return _sym_degree(cur)

    cur = cur.cache()
    n_prev = cur.count()
    while True:
        keep = _sym_degree(cur).filter(F.col("degree") >= k).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .transform(truncate_plan)
            .cache()
        )
        n_next = nxt.count()
        cur.unpersist()
        cur = nxt
        if n_next == n_prev:
            break
        n_prev = n_next
    out = _sym_degree(cur)
    return out


def cocitation_jaccard(
    edges: DataFrame,
    min_shared: int = 2,
    max_out_degree: int = 1000,
) -> DataFrame:
    """Co-citation similarity: pairs of pages linked from common sources.

    For distinct targets a < b, ``shared`` = number of sources linking to
    both, and ``jaccard`` = shared / (indeg(a) + indeg(b) - shared), with
    in-degrees counted over the same (capped) source set. Returns
    ``(a, b, shared, jaccard)`` for pairs with shared >= ``min_shared``.

    Sources with out-degree > ``max_out_degree`` are excluded BEFORE the
    pair join (standard co-citation practice: a directory page linking
    100k targets contributes 10^10 pairs and no signal). The cap bounds
    the self-join fan-out at cap^2 per source; the same cap is applied in
    the oracle so results stay value-comparable. Pure codegen: one
    groupBy for the cap, one self-join + count for pairs, two broadcast-
    able in-degree joins.
    """
    ok = (
        edges.groupBy("src")
        .agg(F.count("*").alias("_od"))
        .filter(F.col("_od") <= max_out_degree)
        .select("src")
    )
    ce = edges.join(ok, "src", "left_semi").select("src", "dst")
    ind = ce.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("indeg"))
    e1 = ce.select("src", F.col("dst").alias("a"))
    e2 = ce.select("src", F.col("dst").alias("b"))
    pairs = (
        e1.join(e2, "src")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(ind.withColumnRenamed("node", "a").withColumnRenamed("indeg", "ia"), "a")
        .join(ind.withColumnRenamed("node", "b").withColumnRenamed("indeg", "ib"), "b")
        .select(
            "a",
            "b",
            "shared",
            (
                F.col("shared").cast("double")
                / (F.col("ia") + F.col("ib") - F.col("shared"))
            ).alias("jaccard"),
        )
    )
