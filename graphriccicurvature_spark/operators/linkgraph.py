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


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    num_iterations: int = 5,
    directed: bool = True,
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank; returns ``(node, ppr)``.

    Reset mass and dangling mass both land on the seed set (uniformly),
    matching ``nx.pagerank(G, personalization=p, dangling=p)`` with ``p``
    uniform over seeds — the TrustRank/topic-PageRank formulation
    (Haveliwala 2002):

        r0(v) = 1/N
        r'(v) = (1-d)*s(v) + d*( sum_{u->v} r(u)*w(u,v)/wout(u)
                                 + dangle * s(v) )
        s(v)  = 1/|S| for v in seeds, else 0

    ``seeds`` is a DataFrame with a ``node`` column; seeds not present in
    the graph are ignored. Per-iteration cost is identical to
    :func:`~graphriccicurvature_spark.operators.pagerank.pagerank`: one
    shuffle join + one reduction, dangling mass as an in-plan broadcast
    scalar, lineage truncated per round. The seed indicator rides the node
    table (computed once, cached) so no extra per-round join appears.
    """
    if not directed:
        edges = edges.select("src", "dst", "weight").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    e = edges.select("src", "dst", "weight")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    seeds = seeds.select("node").distinct().join(nodes, "node", "left_semi")
    ns = seeds.count()
    if ns == 0:
        raise ValueError("personalized_pagerank: no seed nodes present in the graph")
    base_nodes = (
        nodes.join(seeds.withColumn("_s", F.lit(1.0)), "node", "left")
        .select("node", (F.coalesce("_s", F.lit(0.0)) / ns).alias("s"))
        .cache()
    )
    wout = e.groupBy("src").agg(F.sum("weight").alias("wout"))
    trans = (
        e.join(wout, "src")
        .select("src", "dst", (F.col("weight") / F.col("wout")).alias("p"))
        .cache()
    )
    trans.count()
    dangling = nodes.join(
        wout.select(F.col("src").alias("node")), "node", "left_anti"
    ).cache()
    ranks = base_nodes.withColumn("ppr", F.lit(1.0 / n))
    for _ in range(num_iterations):
        dangle_df = ranks.join(dangling, "node", "left_semi").agg(
            F.coalesce(F.sum("ppr"), F.lit(0.0)).alias("_dangle")
        )
        contrib = (
            trans.join(ranks, trans.src == ranks.node)
            .select("dst", (F.col("p") * F.col("ppr")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        new_rank = F.lit(1.0 - damping) * F.col("s") + F.lit(damping) * (
            F.coalesce("c", F.lit(0.0)) + F.col("_dangle") * F.col("s")
        )
        ranks = (
            base_nodes.join(contrib, base_nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangle_df))
            .select("node", "s", new_rank.alias("ppr"))
            .transform(truncate_plan)
        )
    out = ranks.select("node", "ppr")
    trans.unpersist()
    return out


def adamic_adar(
    edges: DataFrame,
    min_common: int = 2,
    max_degree: int = 1000,
    exclude_edges: bool = True,
) -> DataFrame:
    """Adamic–Adar link prediction over the canonical undirected edge set.

    For node pairs a < b sharing at least ``min_common`` neighbors:

        AA(a,b) = sum over common neighbors u of 1 / ln(deg(u))

    (Adamic & Adar 2003). Returns ``(a, b, common_neighbors, adamic_adar)``.
    ``exclude_edges`` drops pairs already connected (the link-prediction
    convention). Common-neighbor hubs with degree > ``max_degree`` are
    excluded BEFORE the wedge self-join — a hub of degree D contributes
    D^2/2 candidate pairs and (by the 1/ln weighting's own argument) near-
    zero signal; the cap bounds the join fan-out exactly like the
    co-citation cap above. Pure codegen: one degree aggregation, one
    wedge self-join + sum, one anti-join.
    """
    und = edges.select("src", "dst")
    deg = _sym_degree(und)
    nb = (
        und.select(F.col("src").alias("u"), F.col("dst").alias("x"))
        .union(und.select(F.col("dst").alias("u"), F.col("src").alias("x")))
        .join(
            # degree-1 nodes can never be a common neighbor (they have one
            # wedge arm) and would divide 1/ln(1) — drop them with the hubs
            deg.filter(
                (F.col("degree") <= max_degree) & (F.col("degree") >= 2)
            ).withColumnRenamed("node", "u"),
            "u",
        )
        .select("u", "x", (F.lit(1.0) / F.log(F.col("degree"))).alias("invln"))
    )
    n2 = nb.select(F.col("u"), F.col("x").alias("b"))
    pairs = (
        nb.select("u", F.col("x").alias("a"), "invln")
        .join(n2, "u")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.sum("invln").alias("adamic_adar"),
        )
        .filter(F.col("common_neighbors") >= min_common)
    )
    if exclude_edges:
        pairs = pairs.join(
            und.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"],
            "left_anti",
        )
    return pairs


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient (Watts–Strogatz).

    c(v) = 2*T(v) / (deg(v)*(deg(v)-1)), 0 when deg < 2; T(v) from the
    degree-ordered triangle counter (triangles.py — O(sqrt(m)) per-key
    fan-out on power-law graphs). Returns ``(node, degree, clustering)``
    for every node incident to an edge. One left join on top of the
    existing degree + triangle aggregations; no new shuffle shape.
    """
    from .triangles import triangle_counts

    deg = _sym_degree(edges.select("src", "dst"))
    tri = triangle_counts(edges)
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            2.0 * F.coalesce("triangles", F.lit(0)) / (F.col("degree") * (F.col("degree") - 1))
        )
        .alias("clustering"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the undirected
    graph: the Pearson correlation of endpoint degrees over the
    symmetrized edge list. Returns one row ``(assortativity)``.

    Web link graphs are canonically disassortative (hubs link to leaves);
    this is the standard scalar that quantifies it. Input: canonical
    undirected edges. One degree aggregation + two joins + a single
    codegen ``corr`` aggregate — no driver math.
    """
    und = edges.select("src", "dst")
    deg = _sym_degree(und)
    sym = und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    j = (
        sym.join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "dx"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "dy"), "dst")
    )
    return j.agg(F.corr("dx", "dy").alias("assortativity"))


def reciprocity(edges: DataFrame) -> DataFrame:
    """Directed-graph reciprocity: the fraction of arcs whose reverse arc
    also exists (self-loops excluded). Returns one row
    ``(n_arcs, n_reciprocal, reciprocity)``.

    One dedup + one self-join on the reversed key (both sides the same
    table — co-partitioned after one exchange) + a scalar aggregate.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .cache()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    out = e.agg(F.count("*").alias("n_arcs")).crossJoin(
        F.broadcast(recip.agg(F.count("*").alias("n_reciprocal")))
    )
    return out.select(
        "n_arcs",
        "n_reciprocal",
        (F.col("n_reciprocal") / F.col("n_arcs")).alias("reciprocity"),
    )


def average_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Per-node mean degree of its neighbors (undirected; Barrat 2004's
    unweighted k_nn). Returns ``(node, degree, avg_neighbor_degree)``.

    The standard web-graph companion to assortativity: k_nn(k) falling
    with k is the per-node view of a disassortative graph. One degree
    aggregation + one join + one reduction, all codegen.
    """
    und = edges.select("src", "dst")
    deg = _sym_degree(und)
    sym = und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nbr = sym.join(
        deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "nd"), "dst"
    )
    knn = nbr.groupBy(F.col("src").alias("node")).agg(
        F.avg("nd").alias("avg_neighbor_degree")
    )
    return deg.join(knn, "node")


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
