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
    authority (hub) 0.

    Round-6 shape. The edge table is cached twice, hash-partitioned by
    ``src`` and by ``dst`` (its two per-round join keys), so each round
    reshuffles only the |V|-sized score vector — the |E| table crosses an
    exchange once per run, not once per round (guide §2.4). Both
    half-iterations run in ONE materialized plan per round: the authority
    update feeds the hub join UN-normalized, which is exact because L1
    normalization cancels any positive scalar on its input
    (hub = H/sum(H) with H built from c·auth equals the same built from
    auth); the hub vector is then re-normalized from the checkpointed raw
    sums via a 1-row scalar read, so per-round magnitudes — and the
    emitted values — match the reference formulation to float ulps. The
    old form paid two materializations per round plus an in-plan
    broadcast norm whose build re-evaluated the join+aggregate subtree
    (measured 17 jobs/round at sf0.1; this shape runs ~7)."""
    if num_iterations < 1:
        raise ValueError(
            f"hits: num_iterations must be >= 1, got {num_iterations} "
            "(0 iterations would leave authority undefined)"
        )
    if not directed:
        edges = edges.select("src", "dst", "weight").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    e = edges.select("src", "dst", "weight")
    e_src = e.repartition(n_part, "src").cache()
    e_dst = e.repartition(n_part, "dst").cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("hits: edge DataFrame is empty (no nodes to rank)")
    hub = nodes.withColumn("hub", F.lit(1.0 / n))
    a_last = None
    for _ in range(num_iterations):
        a_raw = (
            e_src.join(hub, e_src.src == hub.node)
            .select("dst", (F.col("weight") * F.col("hub")).alias("x"))
            .groupBy("dst")
            .agg(F.sum("x").alias("x"))
        )
        auth_un = nodes.join(a_raw, nodes.node == a_raw.dst, "left").select(
            "node", F.coalesce("x", F.lit(0.0)).alias("au")
        )
        h_raw = truncate_plan(
            e_dst.join(auth_un, e_dst.dst == auth_un.node)
            .select("src", (F.col("weight") * F.col("au")).alias("x"))
            .groupBy("src")
            .agg(F.sum("x").alias("x"))
        )
        nh = h_raw.agg(F.sum("x")).collect()[0][0]
        hub = nodes.join(h_raw, nodes.node == h_raw.src, "left").select(
            "node", (F.coalesce("x", F.lit(0.0)) / F.lit(nh)).alias("hub")
        )
        a_last = a_raw
    a_fin = truncate_plan(a_last)
    na = a_fin.agg(F.sum("x")).collect()[0][0]
    auth = nodes.join(a_fin, nodes.node == a_fin.dst, "left").select(
        "node", (F.coalesce("x", F.lit(0.0)) / F.lit(na)).alias("authority")
    )
    out = truncate_plan(hub.join(auth, "node"))
    e_src.unpersist()
    e_dst.unpersist()
    nodes.unpersist()
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
    def peel(cur: DataFrame) -> DataFrame:
        """One peel round as a window pass: each symmetric row learns its
        src's degree in-row (one exchange instead of a degree aggregate
        plus two semi-joins), a row survives iff its src keeps degree >= k,
        and a canonical edge survives iff BOTH its orientations survive
        (count == 2 in the pair rollup) — the same induced edge set as the
        keep-nodes/semi-join form."""
        from pyspark.sql import Window

        sym = cur.union(
            cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        w = Window.partitionBy("src")
        return (
            sym.withColumn("_d", F.count(F.lit(1)).over(w))
            .filter(F.col("_d") >= k)
            .groupBy(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") == 2)
            .select("src", "dst")
        )

    cur = edges.select("src", "dst")
    if rounds is not None:
        for _ in range(rounds):
            # localCheckpoint bounds the plan to one materialization per
            # round — same cost shape as fixpoint mode, minus its counts
            cur = peel(cur).transform(truncate_plan)
        return _sym_degree(cur)

    cur = cur.cache()
    n_prev = cur.count()
    while True:
        # the fixpoint count is the action that materializes the round
        nxt = peel(cur).transform(lambda d: truncate_plan(d, eager=False))
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
    base_nodes = nodes.join(
        seeds.withColumn("_s", F.lit(1.0)), "node", "left"
    ).select("node", (F.coalesce("_s", F.lit(0.0)) / ns).alias("s"))
    wout = e.groupBy("src").agg(F.sum("weight").alias("wout"))
    # transition table computed once and cached, no forced layout (see the
    # pagerank.py note: a shuffle-join build is already partitioned+sorted
    # by src, a broadcast build means the rounds broadcast too); the
    # dangling indicator rides the rank vector so the per-round
    # dangling-mass scalar is a plain aggregate with no semi-join
    trans = (
        e.join(wout, "src")
        .select("src", "dst", (F.col("weight") / F.col("wout")).alias("p"))
        .cache()
    )
    trans.count()
    base_nodes = (
        base_nodes.join(
            wout.select(F.col("src").alias("node"), F.lit(1).alias("_o")),
            "node",
            "left",
        )
        .select("node", "s", F.col("_o").isNull().alias("_dang"))
        .cache()
    )
    ranks = base_nodes.withColumn("ppr", F.lit(1.0 / n))
    for _ in range(num_iterations):
        dangle_df = ranks.agg(
            F.coalesce(
                F.sum(F.when(F.col("_dang"), F.col("ppr"))), F.lit(0.0)
            ).alias("_dangle")
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
            .select("node", "s", "_dang", new_rank.alias("ppr"))
            .transform(truncate_plan)
        )
    out = ranks.select("node", "ppr")
    # per-round states are eagerly truncated, so every cached input is
    # droppable here; leaving them pinned accumulates executor storage
    # across repeated calls in a long-lived driver
    trans.unpersist()
    nodes.unpersist()
    base_nodes.unpersist()
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
    out = (
        e.agg(F.count("*").alias("n_arcs"))
        .crossJoin(F.broadcast(recip.agg(F.count("*").alias("n_reciprocal"))))
        .select(
            "n_arcs",
            "n_reciprocal",
            (F.col("n_reciprocal") / F.col("n_arcs")).alias("reciprocity"),
        )
        # 1-row result: materialize it now so the cache on e can be released
        # without handing the caller a plan that recomputes the dedup 3x
        .transform(truncate_plan)
    )
    e.unpersist()
    return out


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

def edge_support(edges: DataFrame) -> DataFrame:
    """Per-edge triangle support over the canonical undirected edge set:
    ``(src, dst, support)`` where support = |N(src) ∩ N(dst)|, i.e. the
    number of triangles the edge closes. Edges in no triangle are omitted
    (join back with a left join + coalesce(0) if you need them).

    Reuses the degree-ordered triangle enumerator (triangles.py) — each
    triangle materializes once, its three edges are re-canonicalized and
    counted with one exchange + map-side combine, so the per-key join
    fan-out stays O(sqrt(m)) on power-law hubs.
    """
    from .triangles import triangles

    # triangles() re-canonicalizes and expects the standard edge schema
    tri = triangles(edges.select("src", "dst").withColumn("weight", F.lit(1.0)))
    edges3 = (
        tri.select(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"))
        .union(tri.select(F.least("a", "c").alias("src"), F.greatest("a", "c").alias("dst")))
        .union(tri.select(F.least("b", "c").alias("src"), F.greatest("b", "c").alias("dst")))
    )
    return edges3.groupBy("src", "dst").agg(F.count("*").alias("support"))


def k_truss(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
) -> DataFrame:
    """k-truss decomposition (Cohen 2008): the maximal subgraph in which
    every edge participates in at least ``k - 2`` triangles. Returns the
    surviving canonical edges with their final in-subgraph support:
    ``(src, dst, support)``.

    The truss is the standard web/social dense-substructure refinement of
    k-core (an edge-level, triangle-witnessed cohesion condition — spam
    link farms and genuine communities separate much more sharply than by
    degree alone). Peel loop: compute per-edge support in the current
    subgraph, drop edges with support < k-2, repeat.

    ``rounds=R`` runs exactly R peels with per-round lineage truncation —
    the bounded declarative form the DuckDB oracle replays as an unrolled
    CTE chain. ``rounds=None`` peels to fixpoint (one scalar count per
    round; monotone edge shrink guarantees termination).

    Scale: each round is the degree-ordered triangle pass (O(m^1.5) work
    bound, O(sqrt(m)) per-key fan-out) + one left join + filter; the edge
    set shrinks monotonically so later rounds get cheaper. Truss peel
    depth on web graphs is small, like core peel depth.
    """

    def peel(cur: DataFrame) -> DataFrame:
        sup = edge_support(cur)
        return (
            cur.join(sup, ["src", "dst"], "left")
            .filter(F.coalesce("support", F.lit(0)) >= k - 2)
            .select("src", "dst")
        )

    cur = edges.select("src", "dst")
    if rounds is not None:
        for _ in range(rounds):
            cur = peel(cur).transform(truncate_plan)
    else:
        cur = cur.cache()
        n_prev = cur.count()
        while True:
            nxt = peel(cur).transform(truncate_plan).cache()
            n_next = nxt.count()
            cur.unpersist()
            cur = nxt
            if n_next == n_prev:
                break
            n_prev = n_next
    sup = edge_support(cur)
    return cur.join(sup, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("support", F.lit(0)).alias("support")
    )


def bfs_distance(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    directed: bool = True,
) -> DataFrame:
    """Multi-source BFS hop distance: for every node reachable from the
    seed set within ``max_hops`` arcs, the minimum hop count. Returns
    ``(node, dist)`` (seeds at dist 0; unreachable nodes omitted).

    The web-graph workhorse behind crawl-frontier depth, seed-set
    expansion (TrustRank's first stage gathers distance<=r balls) and
    link-spam neighborhood audits. Frontier-style iteration: round h
    expands only the nodes first reached at h-1 (one shuffle join) and
    anti-joins the visited set, so per-round cost tracks frontier size,
    not graph size — the textbook Pregel BFS shape expressed as two
    DataFrame joins. Lineage truncated per round; ``max_hops`` bounds the
    loop so the whole run is replayable by a recursive-CTE oracle.
    """
    e = edges.select("src", "dst")
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    # frontier expansion joins on e.src every hop — cache the arc view
    # partitioned by that key once (guide §2.4)
    e = e.repartition(n_part, "src").cache()
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    dist = (
        seeds.select("node")
        .distinct()
        .join(nodes, "node", "left_semi")
        .withColumn("dist", F.lit(0))
        .transform(truncate_plan)
    )
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        frontier = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .transform(truncate_plan)
        )
        dist = dist.union(frontier.withColumn("dist", F.lit(h))).transform(
            truncate_plan
        )
    e.unpersist()
    return dist


def neighborhood_function(
    edges: DataFrame,
    radius: int,
) -> DataFrame:
    """Exact bounded neighborhood function: for every node of the
    undirected graph, ``ball`` = number of distinct nodes within
    ``radius`` hops (self included). Returns ``(node, ball)``.

    This is the quantity HyperBall/HyperANF (Boldi & Vigna 2013)
    approximates to get effective-diameter and centrality statistics of
    web graphs. The exact form materializes the reach-pair table
    (node, x) — Σ|ball_r(v)| rows — which is fine at test scale and IS
    the oracle-checkable twin for :func:`hyperball` (the scale path).
    Each round: one shuffle join + distinct.
    """
    und = edges.select("src", "dst")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    sym = (
        und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(n_part, "src")
        .cache()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    reach = nodes.select("node", F.col("node").alias("x"))
    for _ in range(radius):
        step = (
            reach.join(sym, reach.x == sym.src)
            .select("node", F.col("dst").alias("x"))
        )
        reach = reach.union(step).distinct().transform(truncate_plan)
    out = reach.groupBy("node").agg(F.count("*").alias("ball"))
    sym.unpersist()
    return out


def hyperball(
    edges: DataFrame,
    radius: int,
    lg_config_k: int = 12,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013) over DataFrames: approximate
    ``radius``-hop neighborhood sizes via HyperLogLog sketches. Returns
    ``(node, ball_estimate)``.

    The scale path for :func:`neighborhood_function`: instead of the
    exact Σ|ball| reach-pair table (quadratic-ish on small-diameter web
    graphs — at radius 6 most of a 10^11-edge graph is in every ball),
    each node carries one fixed-size HLL sketch (2^lg_config_k registers)
    and round r unions each node's sketch with its neighbors' sketches:

        sk_{r}(v) = union(sk_{r-1}(v), ⋃_{u ~ v} sk_{r-1}(u))

    All sketch ops are Spark's built-in Datasketches HLL codegen
    functions (hll_sketch_agg / hll_union_agg / hll_union /
    hll_sketch_estimate) — JVM-side, no Python in the loop. Per round:
    one shuffle join + one sketch-merge aggregation, identical shape to
    one PageRank iteration with registers instead of ranks. Estimates are
    within HLL's standard ~1.04/sqrt(2^lg_config_k) relative error
    (~1.6% at the default 12); the pytest twin checks agreement with the
    exact operator on a fixture.
    """
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    und = edges.select("src", "dst")
    # the sketch join keys on sym.dst every round — cache the symmetric view
    # partitioned by that key once (guide §2.4)
    sym = (
        und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(n_part, "dst")
        .cache()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    sk = nodes.groupBy("node").agg(
        F.hll_sketch_agg("node", F.lit(lg_config_k)).alias("sk")
    )
    for _ in range(radius):
        nbr = (
            sym.join(sk, sym.dst == sk.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.hll_union_agg("sk", F.lit(False)).alias("nsk"))
        )
        sk = (
            sk.join(nbr, "node", "left")
            .select(
                "node",
                F.when(F.col("nsk").isNull(), F.col("sk"))
                .otherwise(F.hll_union("sk", "nsk"))
                .alias("sk"),
            )
            .transform(truncate_plan)
        )
    out = sk.select(
        "node", F.round(F.hll_sketch_estimate("sk")).cast("long").alias("ball_estimate")
    )
    sym.unpersist()
    return out


def salsa(edges: DataFrame, num_iterations: int = 3) -> DataFrame:
    """SALSA (Lempel & Moran 2000): hub/authority scores as the stationary
    distribution of an alternating random walk on the bipartite
    hub/authority view of the link graph — the algorithm behind
    large-scale who-to-follow / related-page systems. Returns
    ``(node, salsa_authority, salsa_hub)`` (0 for nodes missing a side).

    Authority chain (hub chain symmetric): step back from authority v to
    a citing hub u with prob 1/indeg(v), then forward to authority w with
    prob 1/outdeg(u):

        t(u)  = sum_{u->v} a(v) / indeg(v)
        a'(w) = sum_{u->w} t(u) / outdeg(u)

    started uniform over the authority side. Unlike HITS the steps are
    stochastic, so total mass is conserved exactly and NO normalization
    scalars (and no crossJoin broadcasts) appear in the loop — per
    iteration each chain is two shuffle joins + two partial-agg
    reductions over a transition table built once (1/indeg, 1/outdeg
    attached, cached). Arcs are deduplicated first (SALSA is defined on
    the unweighted citation structure). Lineage truncated per round.
    """
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    outd = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ind = e.groupBy("dst").agg(F.count("*").alias("indeg"))
    eb = e.join(ind, "dst").join(outd, "src").select(
        "src",
        "dst",
        (F.lit(1.0) / F.col("indeg")).alias("rin"),
        (F.lit(1.0) / F.col("outdeg")).alias("rout"),
    )
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    # the alternating-walk rounds join the transition table on BOTH keys
    # (dst for the back-step, src for the forward step) — cache one copy
    # partitioned by each so rounds reshuffle only the score vectors
    eb_dst = eb.repartition(n_part, "dst").cache()
    eb_src = eb.repartition(n_part, "src").cache()
    auths = eb_dst.select(F.col("dst").alias("node")).distinct().cache()
    hubs = eb_dst.select(F.col("src").alias("node")).distinct().cache()
    na = auths.count()
    nh = hubs.count()
    a = auths.withColumn("a", F.lit(1.0 / na))
    h = hubs.withColumn("h", F.lit(1.0 / nh))
    for _ in range(num_iterations):
        t = (
            eb_dst.join(a, eb_dst.dst == a.node)
            .groupBy("src")
            .agg(F.sum(F.col("a") * F.col("rin")).alias("t"))
        )
        a = (
            eb_src.join(t, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("t") * F.col("rout")).alias("a"))
            .transform(truncate_plan)
        )
        g = (
            eb_src.join(h, eb_src.src == h.node)
            .groupBy("dst")
            .agg(F.sum(F.col("h") * F.col("rout")).alias("g"))
        )
        h = (
            eb_dst.join(g, "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("g") * F.col("rin")).alias("h"))
            .transform(truncate_plan)
        )
    out = (
        a.join(h, "node", "full_outer")
        .select(
            "node",
            F.coalesce("a", F.lit(0.0)).alias("salsa_authority"),
            F.coalesce("h", F.lit(0.0)).alias("salsa_hub"),
        )
    )
    eb_dst.unpersist()
    eb_src.unpersist()
    auths.unpersist()
    hubs.unpersist()
    return out


def sssp_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    directed: bool = True,
) -> DataFrame:
    """Weighted multi-source shortest paths, Bellman-Ford style, bounded
    to paths of at most ``rounds`` arcs. Returns ``(node, dist)`` — the
    minimum total edge weight from any seed over such paths (seeds at 0;
    unreachable nodes omitted).

    The weighted companion of :func:`bfs_distance` (hop counts ignore
    link weights; crawl economics don't). Each round relaxes every arc
    once: one shuffle join keyed src + one min-aggregation keyed node —
    the classic iterative-relaxation shape, same per-round cost as a
    PageRank iteration. ``rounds`` bounds the loop (and path length), so
    the run is replayable by a recursive-CTE oracle; for full shortest
    paths set rounds >= the graph's weighted-path hop diameter.
    """
    e = edges.select("src", "dst", "weight")
    if not directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    # every relaxation round joins on e.src — cache the arc view
    # partitioned by that key once (guide §2.4)
    e = e.repartition(n_part, "src").cache()
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    dist = (
        seeds.select("node")
        .distinct()
        .join(nodes, "node", "left_semi")
        .withColumn("dist", F.lit(0.0))
        .transform(truncate_plan)
    )
    for _ in range(rounds):
        relaxed = (
            dist.join(e, dist.node == e.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("weight")).alias("dist"))
        )
        dist = (
            dist.union(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .transform(truncate_plan)
        )
    e.unpersist()
    return dist


def harmonic_closeness(edges: DataFrame, radius: int) -> DataFrame:
    """Exact bounded harmonic centrality on the undirected graph:

        HC_R(v) = sum over u with 0 < d(u,v) <= R of 1 / d(u,v)

    (Boldi & Vigna 2014's axiom-respecting centrality; the bounded form
    is what HyperBall estimates at web scale). Returns ``(node,
    harmonic)``. Materializes the (node, x, min-dist) reach table — the
    oracle-checkable twin of :func:`hyperball_harmonic`; per round one
    frontier join + a min-keeping distinct, cost Σ|ball_R|.
    """
    reach = _bounded_reach(edges, radius)
    return (
        reach.filter(F.col("d") > 0)
        .groupBy("node")
        .agg(F.sum(F.lit(1.0) / F.col("d")).alias("harmonic"))
    )


def _bounded_reach(edges: DataFrame, radius: int) -> DataFrame:
    """(node, x, d) table of every node x within min-distance d <= radius
    of node on the undirected graph — one frontier join + min-keeping
    distinct per round, cost Σ|ball_R|. Shared by the exact bounded
    centralities (harmonic / closeness / neighborhood)."""
    und = edges.select("src", "dst")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    # frontier expansion joins on sym.src every round — cache the symmetric
    # view partitioned by that key once (guide §2.4)
    sym = (
        und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(n_part, "src")
        .cache()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    reach = nodes.select("node", F.col("node").alias("x"), F.lit(0).alias("d"))
    for h in range(1, radius + 1):
        step = (
            reach.filter(F.col("d") == h - 1)
            .join(sym, F.col("x") == sym.src)
            .select("node", F.col("dst").alias("x"), F.lit(h).alias("d"))
        )
        reach = (
            reach.union(step)
            .groupBy("node", "x")
            .agg(F.min("d").alias("d"))
            .transform(truncate_plan)
        )
    sym.unpersist()
    return reach


def closeness_centrality(edges: DataFrame, radius: int) -> DataFrame:
    """Exact bounded closeness centrality on the undirected graph:

        CC_R(v) = n_reached_R(v) / sum_{0 < d(u,v) <= R} d(u,v)

    — reachable-count over distance-sum within the radius-R ball, the
    bounded form of the classic closeness (as R reaches the diameter
    this is Wasserman-Faust closeness times (N-1)/ n_reached's
    normalization; the bounded ratio is what web-scale systems report
    since exact all-pairs is off the table). Every node in the edge
    table has at least one neighbor, so n_reached >= 1 and the ratio is
    always finite. Returns ``(node, n_reached, sum_dist, closeness)``.

    Same materialized reach table as :func:`harmonic_closeness` — one
    frontier join + min-keeping distinct per round; everything after is
    one codegen aggregate.
    """
    reach = _bounded_reach(edges, radius)
    return (
        reach.filter(F.col("d") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum("d").alias("sum_dist"),
        )
        .select(
            "node",
            "n_reached",
            "sum_dist",
            (F.col("n_reached") / F.col("sum_dist")).alias("closeness"),
        )
    )


def hyperball_harmonic(
    edges: DataFrame,
    radius: int,
    lg_config_k: int = 12,
) -> DataFrame:
    """HyperBall harmonic-centrality estimation (Boldi & Vigna 2013 §4):

        HC_R(v) ~= sum_{r=1..R} (|B_r(v)| - |B_{r-1}(v)|) / r

    with ball sizes from per-node HLL sketches. Returns ``(node,
    harmonic_estimate)``. Same sketch loop as :func:`hyperball` (one
    src-keyed join + one hll_union_agg per round, all JVM codegen) with
    a per-round estimate column kept so the telescoping sum costs no
    extra pass. This is THE published way centrality gets computed on
    10^11-edge web graphs — per-node exact BFS is off the table there.
    """
    und = edges.select("src", "dst")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    sym = (
        und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(n_part, "dst")
        .cache()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    sk = nodes.groupBy("node").agg(
        F.hll_sketch_agg("node", F.lit(lg_config_k)).alias("sk")
    )
    sk = sk.select(
        "node", "sk", F.hll_sketch_estimate("sk").alias("prev"), F.lit(0.0).alias("hc")
    )
    for r in range(1, radius + 1):
        nbr = (
            sym.join(sk.select("node", "sk"), sym.dst == F.col("node"))
            .groupBy(F.col("src").alias("node"))
            .agg(F.hll_union_agg("sk", F.lit(False)).alias("nsk"))
        )
        merged = sk.join(nbr, "node", "left").select(
            "node",
            F.when(F.col("nsk").isNull(), F.col("sk"))
            .otherwise(F.hll_union("sk", "nsk"))
            .alias("sk"),
            "prev",
            "hc",
        )
        sk = merged.select(
            "node",
            "sk",
            F.hll_sketch_estimate("sk").alias("prev"),
            (
                F.col("hc")
                + (F.hll_sketch_estimate("sk") - F.col("prev")) / F.lit(float(r))
            ).alias("hc"),
        ).transform(truncate_plan)
    out = sk.select("node", F.col("hc").alias("harmonic_estimate"))
    sym.unpersist()
    return out


def distance_distribution(edges: DataFrame, radius: int) -> DataFrame:
    """Exact bounded distance distribution of the undirected graph:
    ``(d, pairs)`` = number of ordered (node, x) pairs at shortest-path
    distance exactly ``d``, for d = 0..radius (d=0 rows = node count).

    The quantity behind effective-diameter reporting on web graphs
    (Boldi & Vigna 2013 §5 run it on whole crawls via HyperANF);
    :func:`hyperball_distance_distribution` is the sketch-based scale
    twin. Exact form materializes the (node, x, min-d) reach table like
    :func:`harmonic_closeness` — Σ|ball_R| rows, the test-scale oracle
    path. Per round: one frontier join + a min-keeping aggregation.
    """
    und = edges.select("src", "dst")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    sym = (
        und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(n_part, "src")
        .cache()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    reach = nodes.select("node", F.col("node").alias("x"), F.lit(0).alias("d"))
    for h in range(1, radius + 1):
        step = (
            reach.filter(F.col("d") == h - 1)
            .join(sym, F.col("x") == sym.src)
            .select("node", F.col("dst").alias("x"), F.lit(h).alias("d"))
        )
        reach = (
            reach.union(step)
            .groupBy("node", "x")
            .agg(F.min("d").alias("d"))
            .transform(truncate_plan)
        )
    sym.unpersist()
    counts = reach.groupBy("d").agg(F.count("*").alias("pairs"))
    # groupBy only emits OBSERVED distances; if every ball saturates before
    # `radius` the tail rows would vanish and the output shape would depend
    # on the data. Join against the full 0..radius spine so the contract
    # "radius+1 rows, zero-filled" always holds.
    spine = edges.sparkSession.range(0, radius + 1).select(
        F.col("id").cast("int").alias("d")
    )
    return (
        spine.join(counts, "d", "left")
        .select("d", F.coalesce("pairs", F.lit(0)).alias("pairs"))
    )


def effective_diameter(
    edges: DataFrame, radius: int, quantile: float = 0.9
) -> DataFrame:
    """Effective diameter at ``quantile`` (default the standard 90%),
    bounded by ``radius``: the smallest d such that at least
    ``quantile`` of all within-``radius`` reachable pairs are within
    distance d. Returns one row ``(effective_diameter)``.

    Derived wholly from :func:`distance_distribution` — a cumulative
    window over at most radius+1 rows plus one broadcast scalar, so the
    only heavy work is the distribution itself.
    """
    from pyspark.sql import Window

    dd = distance_distribution(edges, radius)
    total = dd.agg(F.sum("pairs").alias("_t"))
    cum = dd.withColumn(
        "_c", F.sum("pairs").over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .filter(F.col("_c") >= F.lit(quantile) * F.col("_t"))
        .agg(F.min("d").alias("effective_diameter"))
    )


def hyperball_distance_distribution(
    edges: DataFrame, radius: int, lg_config_k: int = 12
) -> DataFrame:
    """HyperBall twin of :func:`distance_distribution`: per-distance pair
    counts estimated from the telescoping differences of per-node HLL
    ball sketches (Boldi & Vigna 2013) — ``(d, pairs_estimate)``.

    Same JVM-codegen sketch loop as :func:`hyperball`; the per-round
    global Σball estimate is ONE extra tiny aggregation per round (no
    reach-pair table anywhere), so the whole distribution costs what
    radius PageRank-shaped iterations cost. This is the 100 TB path:
    the exact operator's Σ|ball_R| pair table is quadratic-ish on a
    small-diameter web graph, while sketches stay |V| x 2^lg_config_k
    bytes. The pytest twin checks agreement with the exact operator.
    """
    und = edges.select("src", "dst")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    sym = (
        und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(n_part, "dst")
        .cache()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    sk = nodes.groupBy("node").agg(
        F.hll_sketch_agg("node", F.lit(lg_config_k)).alias("sk")
    )
    rows = [sk.agg(F.sum(F.hll_sketch_estimate("sk")).alias("ball")).select(
        F.lit(0).alias("d"), F.round("ball").cast("long").alias("_cum")
    )]
    for r in range(1, radius + 1):
        nbr = (
            sym.join(sk.select("node", "sk"), sym.dst == F.col("node"))
            .groupBy(F.col("src").alias("node"))
            .agg(F.hll_union_agg("sk", F.lit(False)).alias("nsk"))
        )
        sk = (
            sk.join(nbr, "node", "left")
            .select(
                "node",
                F.when(F.col("nsk").isNull(), F.col("sk"))
                .otherwise(F.hll_union("sk", "nsk"))
                .alias("sk"),
            )
            .transform(truncate_plan)
        )
        rows.append(
            sk.agg(F.sum(F.hll_sketch_estimate("sk")).alias("ball")).select(
                F.lit(r).alias("d"), F.round("ball").cast("long").alias("_cum")
            )
        )
    cums = rows[0]
    for r in rows[1:]:
        cums = cums.union(r)
    from pyspark.sql import Window

    w = Window.orderBy("d")
    out = cums.select(
        "d",
        (F.col("_cum") - F.coalesce(F.lag("_cum").over(w), F.lit(0))).alias(
            "pairs_estimate"
        ),
    )
    sym.unpersist()
    return out


def spam_mass(
    edges: DataFrame,
    trusted: DataFrame,
    damping: float = 0.85,
    num_iterations: int = 5,
) -> DataFrame:
    """Relative spam mass (Gyöngyi, Garcia-Molina & Pedersen, "Link Spam
    Detection Based on Mass Estimation", VLDB 2006): the fraction of a
    page's PageRank NOT explainable by trusted sources,

        mass(v) = (pr(v) - tr(v)) / pr(v)

    where ``pr`` is ordinary PageRank (uniform reset) and ``tr`` is
    TrustRank (the same walk with reset + dangling mass on the trusted
    seed set — :func:`personalized_pagerank`), both unit-normalized.
    Mass near 1 flags link-spam candidates (rank earned from untrusted
    regions); strongly trusted pages can go negative. Returns
    ``(node, pagerank, trustrank, spam_mass)``.

    Scale: two bounded power iterations over the same transition table —
    exactly PageRank's per-round shuffle shape twice — plus one final
    node-keyed join. The two walks are independent and share no state, so
    a scheduler can overlap them; no new shuffle shape is introduced.
    """
    from .pagerank import pagerank

    pr = pagerank(edges, damping=damping, num_iterations=num_iterations, directed=True)
    tr = personalized_pagerank(
        edges, trusted, damping=damping, num_iterations=num_iterations
    )
    j = pr.join(tr, "node")
    mass = F.when(
        F.col("pagerank") > 0,
        (F.col("pagerank") - F.col("ppr")) / F.col("pagerank"),
    ).otherwise(F.lit(0.0))
    return j.select(
        "node",
        "pagerank",
        F.col("ppr").alias("trustrank"),
        mass.alias("spam_mass"),
    )


def core_number(edges: DataFrame, max_k: int | None = None) -> DataFrame:
    """Full k-core decomposition: each node's core number = the largest
    ``k`` for which it survives the k-core peel (Seidman degeneracy
    ordering). Input is the canonical undirected edge table; returns
    ``(node, core)`` for every node with at least one edge (core >= 1).
    ``max_k`` bounds the sweep (caps both work and output values).

    Computed as a k-sweep of :func:`k_core` fixpoints, each peeling the
    PREVIOUS core's edge set (the k-core of the (k-1)-core is the k-core
    of the graph), so the edge set shrinks monotonically across the
    sweep. Sweep length = the graph degeneracy, which is small on web
    graphs (power-law graphs have degeneracy << max degree); each step
    inherits k_core's per-round cost of one degree aggregation plus two
    semi-joins on an ever-smaller edge set. Per-step lineage is
    truncated so the sweep stays resumable and the plan bounded.
    """
    cur = edges.select("src", "dst")
    out = None
    k = 1
    while max_k is None or k <= max_k:
        surv = k_core(cur, k).select("node")
        if surv.isEmpty():
            break
        lab = surv.select("node", F.lit(k).alias("core"))
        out = lab if out is None else out.unionByName(lab)
        cur = (
            cur.join(surv.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(surv.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .transform(truncate_plan)
        )
        k += 1
    if out is None:
        return edges.sparkSession.createDataFrame([], "node long, core int")
    return out.groupBy("node").agg(F.max("core").alias("core"))


def bib_coupling(
    edges: DataFrame,
    min_shared: int = 2,
    max_in_degree: int = 1000,
) -> DataFrame:
    """Bibliographic coupling: pairs of pages that link to common targets
    (Kessler 1963) — the out-link mirror of :func:`cocitation_jaccard`.

    For distinct sources a < b, ``shared`` = number of targets both link
    to, and ``jaccard`` = shared / (outdeg(a) + outdeg(b) - shared), with
    out-degrees counted over the same (capped) target set. Returns
    ``(a, b, shared, jaccard)`` for pairs with shared >= ``min_shared``.

    Targets with in-degree > ``max_in_degree`` are excluded BEFORE the
    pair join: a page cited by 100k sources contributes 10^10 coupled
    pairs and no topical signal (everyone links to the homepage). The cap
    bounds the self-join fan-out at cap^2 per target, exactly like the
    co-citation cap. Pure codegen: one groupBy for the cap, one self-join
    + count for pairs, two out-degree joins.
    """
    ok = (
        edges.groupBy("dst")
        .agg(F.count("*").alias("_id"))
        .filter(F.col("_id") <= max_in_degree)
        .select("dst")
    )
    ce = edges.join(ok, "dst", "left_semi").select("src", "dst")
    outd = ce.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("outdeg"))
    e1 = ce.select("dst", F.col("src").alias("a"))
    e2 = ce.select("dst", F.col("src").alias("b"))
    pairs = (
        e1.join(e2, "dst")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(outd.withColumnRenamed("node", "a").withColumnRenamed("outdeg", "oa"), "a")
        .join(outd.withColumnRenamed("node", "b").withColumnRenamed("outdeg", "ob"), "b")
        .select(
            "a",
            "b",
            "shared",
            (
                F.col("shared").cast("double")
                / (F.col("oa") + F.col("ob") - F.col("shared"))
            ).alias("jaccard"),
        )
    )


def rich_club(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient table (Zhou & Mondragon 2004) of the
    canonical undirected graph: for every threshold ``k`` from 0 to
    max_degree - 1,

        phi(k) = 2 * E_k / (N_k * (N_k - 1))

    where N_k = #nodes with degree > k and E_k = #edges with BOTH
    endpoints of degree > k. Returns ``(k, n_nodes, n_edges, phi)`` with
    one row per k (phi = NULL when N_k < 2). A high phi at large k means
    the hubs form a dense "rich club" — on web graphs this separates
    link-farm cores from organically sparse hub sets.

    Closed form, no per-k subgraph scan: a node of degree d survives all
    thresholds k < d, and an edge survives all k < min(d_src, d_dst), so
    N_k and E_k are suffix-sums of (a) the degree histogram and (b) the
    min-endpoint-degree edge histogram. Plan: one degree aggregation, two
    tiny histograms, a left join onto the 0..max-1 spine, and two
    descending-cumulative windows over at most max_degree rows — the
    windows run on histogram rows (#distinct degrees), never on the edge
    table. Pure codegen; scales as 2 edge-table shuffles regardless of k
    range.
    """
    from pyspark.sql import Window

    und = edges.select("src", "dst")
    deg = _sym_degree(und)
    nhist = deg.groupBy("degree").agg(F.count("*").alias("nd"))
    ehist = (
        und.join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "ds"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "dd"), "dst")
        .select(F.least("ds", "dd").alias("mindeg"))
        .groupBy("mindeg")
        .agg(F.count("*").alias("ne"))
    )
    kmax = deg.agg(F.max("degree").alias("m"))
    # spine includes k = max so the degree-max histogram bucket enters the
    # suffix sums; the k = max row itself (N_k = 0) is dropped at the end.
    spine = kmax.select(
        F.explode(F.sequence(F.lit(0), F.col("m"))).alias("k"), F.col("m")
    )
    w = Window.orderBy(F.col("k").desc()).rowsBetween(Window.unboundedPreceding, 0)
    joined = (
        spine.join(nhist.withColumnRenamed("degree", "k"), "k", "left")
        .join(ehist.withColumnRenamed("mindeg", "k"), "k", "left")
        .select(
            "k",
            "m",
            F.coalesce("nd", F.lit(0)).alias("nd"),
            F.coalesce("ne", F.lit(0)).alias("ne"),
        )
    )
    # nodes with degree > k = suffix sum of nd over degrees k+1..max =
    # cumulative-from-top sum minus this row's own bucket; same for edges.
    out = joined.select(
        "k",
        "m",
        (F.sum("nd").over(w) - F.col("nd")).alias("n_nodes"),
        (F.sum("ne").over(w) - F.col("ne")).alias("n_edges"),
    ).filter(F.col("k") < F.col("m"))
    return out.select(
        "k",
        "n_nodes",
        "n_edges",
        F.when(
            F.col("n_nodes") >= 2,
            2.0 * F.col("n_edges") / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
        ).alias("phi"),
    )


def truss_number(
    edges: DataFrame,
    max_k: int | None = None,
    rounds: int | None = None,
) -> DataFrame:
    """Full truss decomposition: each canonical undirected edge's truss
    number = the largest ``k`` for which it survives the k-truss peel
    (Cohen 2008). Returns ``(src, dst, truss)`` for EVERY input edge;
    edges in no triangle get the trivial truss = 2. ``max_k`` bounds the
    sweep; ``rounds`` bounds the peel depth per k (the declarative form
    the DuckDB oracle replays as an unrolled CTE chain; ``None`` peels
    each k to fixpoint).

    Mirrors :func:`core_number`: the k-truss of the (k-1)-truss is the
    k-truss of the graph, so step k peels the previous truss's edge set
    and the edge table shrinks monotonically across the sweep. Sweep
    length = max trussness, which tracks degeneracy (small and
    size-stable on power-law web graphs); each peel round is the
    degree-ordered triangle-support pass + one filter, so the dominant
    cost is the FIRST k=3 round on the full edge set — exactly one
    triangle enumeration more than k_truss(3) itself pays.
    """
    base = edges.select("src", "dst")
    cur = base
    out = None
    k = 3
    while max_k is None or k <= max_k:
        cur = k_truss(cur, k, rounds=rounds).select("src", "dst")
        if cur.isEmpty():
            break
        cur = cur.transform(truncate_plan)
        lab = cur.select("src", "dst", F.lit(k).alias("k"))
        out = lab if out is None else out.unionByName(lab)
        k += 1
    if out is None:
        return base.select("src", "dst", F.lit(2).alias("truss"))
    mx = out.groupBy("src", "dst").agg(F.max("k").alias("mk"))
    return base.join(mx, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("mk", F.lit(2)).alias("truss")
    )


def simrank(
    edges: DataFrame,
    num_iterations: int = 2,
    c: float = 0.8,
    min_score: float = 1e-9,
) -> DataFrame:
    """Bounded SimRank (Jeh & Widom 2002): "two pages are similar if they
    are referenced by similar pages". Returns ``(a, b, score)`` for node
    pairs with ``a < b`` and nonzero iterated score.

        R_0(a, b) = 1 if a == b else 0
        R_k(a, b) = c / (|I(a)||I(b)|) * sum_{i in I(a), j in I(b)} R_{k-1}(i, j)

    over DIRECTED in-neighborhoods I(.). The iteration is expressed
    join-first (scatter the previous pair table through one out-edge join
    per side, then one map-side-combinable sum keyed by the new pair), so
    each iteration is three shuffles and the nonzero pair table is the
    only state. R_{k-1} carries the implicit diagonal explicitly, and the
    pair table is kept SYMMETRIC between iterations so the scatter join
    needs no orientation case analysis; the output is canonicalized to
    a < b at the end.

    Scale: the exact pair table is quadratic in the worst case — this
    bounded form is for head/eval-set similarity (it also drops pairs
    below ``min_score``, the standard truncation). The published 100 TB
    path is Monte-Carlo SimRank over reverse random walks (first-meeting
    time of two c^t-discounted walks); `random_walks` provides the walk
    machinery if estimation is needed at full-corpus scale.
    """
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    # both per-round scatter joins key on e.src — cache the deduped arc
    # table partitioned by that key once; in-degrees are read twice per
    # round, cache them too
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(n_part, "src")
        .cache()
    )
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("ind")).cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # symmetric-with-diagonal previous table
    prev = nodes.select(
        F.col("node").alias("a"), F.col("node").alias("b"), F.lit(1.0).alias("score")
    )
    for _ in range(num_iterations):
        scattered = (
            prev.join(e.select(F.col("src").alias("a"), F.col("dst").alias("na")), "a")
            .join(e.select(F.col("src").alias("b"), F.col("dst").alias("nb")), "b")
            .filter(F.col("na") != F.col("nb"))
            .groupBy("na", "nb")
            .agg(F.sum("score").alias("s"))
        )
        offdiag = (
            scattered.join(ind.select(F.col("dst").alias("na"), F.col("ind").alias("ia")), "na")
            .join(ind.select(F.col("dst").alias("nb"), F.col("ind").alias("ib")), "nb")
            .select(
                F.col("na").alias("a"),
                F.col("nb").alias("b"),
                (F.lit(c) * F.col("s") / (F.col("ia") * F.col("ib"))).alias("score"),
            )
            .filter(F.col("score") >= min_score)
        )
        prev = truncate_plan(
            nodes.select(
                F.col("node").alias("a"),
                F.col("node").alias("b"),
                F.lit(1.0).alias("score"),
            ).union(offdiag)
        )
    # per-round states are eagerly truncated, so the cached inputs can be
    # released before the caller's action
    out = prev.filter(F.col("a") < F.col("b")).select("a", "b", "score")
    e.unpersist()
    ind.unpersist()
    return out


def ppr_sweep(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    num_iterations: int = 3,
    max_prefix: int = 50,
) -> DataFrame:
    """Andersen-Chung-Lang local-community sweep: rank nodes by
    ppr(v)/deg(v), then report the conductance of every prefix of the
    sweep order — the prefix with minimum conductance is the local
    community around the seed set (Andersen, Chung & Lang, FOCS 2006;
    the standard seed-expansion primitive on web graphs, where a global
    clustering of 10^12 nodes is off the table but "what is THIS page's
    community" is answerable from the PPR support alone).

    Input is the canonical undirected edge table (src < dst, deduped).
    The PPR vector comes from :func:`personalized_pagerank` over the
    symmetrized view (no dangling nodes by construction); the sweep is
    pure window algebra over the top ``max_prefix`` nodes:

        vol(k)  = sum_{rank<=k} wdeg(v)          (cumulative window)
        wint(k) = sum of edge weights with BOTH endpoints at rank<=k
                  (per-edge m = max(rank_u, rank_v), histogram, cumsum)
        cut(k)  = vol(k) - 2*wint(k)
        phi(k)  = cut(k) / min(vol(k), total_vol - vol(k))

    Ordering ties break by node id ascending (deterministic). Everything
    after the PPR rounds is one window over <= max_prefix rows plus one
    join of the edge table against the tiny ranked set (broadcast at any
    scale) — the sweep itself never shuffles the graph.

    Returns (rank, node, ppr, volume, cut_weight, conductance).
    """
    from pyspark.sql import Window

    from ..sources.edges import symmetrize

    sym = symmetrize(edges)
    ppr = personalized_pagerank(
        sym, seeds, damping=damping, num_iterations=num_iterations, directed=True
    )
    wdeg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    total = wdeg.agg(F.sum("wdeg").alias("total_vol"))
    # distributed top-k (TakeOrderedAndProject), NOT a global row_number
    # window over every node — the rank window below only ever sees
    # max_prefix rows, so the one single-task stage is O(max_prefix).
    # The ranking key rounds ppr to 9 decimals: structurally-symmetric
    # nodes have mathematically equal ppr, but per-partition summation
    # order perturbs the last ulp, and an ulp must not decide sweep
    # order (ties break by node id, reproducibly, on any engine).
    top = (
        ppr.join(wdeg, "node")
        .withColumn("score", F.round("ppr", 9) / F.col("wdeg"))
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(max_prefix)
    )
    w_rank = Window.orderBy(F.desc("score"), F.asc("node"))
    ranked = top.withColumn("rank", F.row_number().over(w_rank)).cache()
    hist = (
        edges.join(
            F.broadcast(ranked.select(F.col("node").alias("src"), F.col("rank").alias("ra"))),
            "src",
        )
        .join(
            F.broadcast(ranked.select(F.col("node").alias("dst"), F.col("rank").alias("rb"))),
            "dst",
        )
        .groupBy(F.greatest("ra", "rb").alias("m"))
        .agg(F.sum("weight").alias("wm"))
    )
    w_cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        ranked.join(hist, ranked["rank"] == hist["m"], "left")
        .select("rank", "node", "ppr", "wdeg", F.coalesce("wm", F.lit(0.0)).alias("wm"))
        .withColumn("volume", F.sum("wdeg").over(w_cum))
        .withColumn("wint", F.sum("wm").over(w_cum))
        .crossJoin(F.broadcast(total))
        .withColumn("cut_weight", F.col("volume") - 2 * F.col("wint"))
        .withColumn(
            "conductance",
            F.when(
                F.least(F.col("volume"), F.col("total_vol") - F.col("volume")) > 0,
                F.col("cut_weight")
                / F.least(F.col("volume"), F.col("total_vol") - F.col("volume")),
            ),
        )
        .select("rank", "node", "ppr", "volume", "cut_weight", "conductance")
    )
    result = out.localCheckpoint(eager=True)
    ranked.unpersist()
    return result


def scan_clustering(
    edges: DataFrame,
    eps: float = 0.5,
    mu: int = 3,
) -> DataFrame:
    """SCAN structural clustering (Xu, Yuruk, Feng & Schweiger, KDD 2007):
    cluster nodes by shared neighborhood structure and — unlike plain CC
    or modularity methods — EXPLICITLY separate out hubs (nodes bridging
    several clusters) and outliers (nodes attached to none). On a web
    link graph that is the spam/navigation-hub triage: topical page
    clusters, cross-topic hub pages, and noise pages, in one pass.

    Structural similarity over CLOSED neighborhoods Γ(u) = N(u) ∪ {u}:

        σ(u,v) = |Γ(u) ∩ Γ(v)| / sqrt(|Γ(u)|·|Γ(v)|)
               = (common_open_neighbors + 2) / sqrt((deg_u+1)·(deg_v+1))

    for an existing edge (u,v) — common open neighbors is exactly the
    edge's triangle support, so the expensive step reuses the
    degree-ordered triangle enumerator (:func:`edge_support`), which
    bounds per-key fan-out at O(sqrt(m)) on power-law hubs. From σ:

    - ε-neighborhood N_ε(u) = {u} ∪ {v adjacent : σ(u,v) ≥ eps}
    - u is a CORE iff |N_ε(u)| ≥ mu
    - clusters = connected components of the core-core ε-subgraph
      (cluster id = min core node id, deterministic); every core's
      non-core ε-neighbors attach to the core's cluster as BORDER
      nodes (min cluster id when several cores claim one border)
    - remaining nodes: HUB if their (original-graph) neighbors sit in
      ≥ 2 distinct clusters, else OUTLIER

    Scale design: one triangle enumeration + codegen joins for σ and the
    ε-degree, then CC runs on the core-core ε-subgraph only — on web
    graphs a small fraction of the full edge set (low-σ superhub edges
    are exactly the ones ε prunes). No Python UDFs, no collects beyond
    CC's bounded fixpoint actions. σ is a pure function of integer
    degree/support counts, so the DuckDB oracle replays it bit-for-bit.

    Returns ``(node, role, cluster)`` — role ∈ core/border/hub/outlier,
    cluster null for hubs and outliers. The reference repo has no analog
    (cited semantics are the published SCAN definitions).
    """
    from .components import connected_components

    canon = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )
    sym = canon.union(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("degree"))
    sup = edge_support(canon.withColumn("weight", F.lit(1.0)))
    sig = (
        canon.join(sup, ["src", "dst"], "left")
        .select("src", "dst", F.coalesce("support", F.lit(0)).alias("support"))
        .join(deg.select(F.col("node").alias("src"), F.col("degree").alias("_d1")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("degree").alias("_d2")), "dst")
        .select(
            "src",
            "dst",
            (
                (F.col("support") + F.lit(2)).cast("double")
                / F.sqrt(((F.col("_d1") + 1) * (F.col("_d2") + 1)).cast("double"))
            ).alias("sigma"),
        )
    )
    eps_edges = sig.filter(F.col("sigma") >= F.lit(float(eps))).select("src", "dst")
    # checkpoint: the σ subtree (triangle enumeration + degree joins) is
    # reused by ε-degree, core filtering, CC and border attachment — cut
    # it once here so the downstream plan stays linear, not 4× the tree
    eps_sym = truncate_plan(
        eps_edges.union(
            eps_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    eps_edges = eps_sym.filter(F.col("src") < F.col("dst"))
    nodes = deg.select("node")
    eps_deg = (
        nodes.join(
            eps_sym.groupBy(F.col("src").alias("node")).agg(
                F.count("*").alias("_en")
            ),
            "node",
            "left",
        )
        # +1: u ∈ N_ε(u) (σ(u,u) = 1 ≥ eps always)
        .select("node", (F.coalesce("_en", F.lit(0)) + 1).alias("eps_deg"))
    )
    cores = truncate_plan(
        eps_deg.filter(F.col("eps_deg") >= F.lit(int(mu))).select("node")
    )
    core_edges = (
        eps_edges.join(cores.select(F.col("node").alias("src")), "src", "left_semi")
        .join(cores.select(F.col("node").alias("dst")), "dst", "left_semi")
        .select("src", "dst")
        .withColumn("weight", F.lit(1.0))
    )
    cc = connected_components(core_edges, vertices=cores)
    core_rows = cc.select("node", F.lit("core").alias("role"), F.col("component").alias("cluster"))
    # border: non-core endpoint of an ε-edge whose other endpoint is core
    border_rows = (
        eps_sym.join(
            cc.select(F.col("node").alias("dst"), F.col("component").alias("_cl")), "dst"
        )
        .select(F.col("src").alias("node"), "_cl")
        .join(cores, "node", "left_anti")
        .groupBy("node")
        .agg(F.min("_cl").alias("cluster"))
        .select("node", F.lit("border").alias("role"), "cluster")
    )
    assigned = truncate_plan(core_rows.unionByName(border_rows))
    # hubs/outliers: unassigned nodes, classified by how many distinct
    # clusters their original-graph neighbors belong to
    rest = nodes.join(assigned.select("node"), "node", "left_anti")
    nbr_cl = (
        sym.join(
            assigned.select(F.col("node").alias("dst"), F.col("cluster").alias("_cl")),
            "dst",
        )
        .select(F.col("src").alias("node"), "_cl")
        .groupBy("node")
        .agg(F.countDistinct("_cl").alias("_ncl"))
    )
    rest_rows = (
        rest.join(nbr_cl, "node", "left")
        .select(
            "node",
            F.when(F.coalesce("_ncl", F.lit(0)) >= 2, F.lit("hub"))
            .otherwise(F.lit("outlier"))
            .alias("role"),
            F.lit(None).cast("long").alias("cluster"),
        )
    )
    return assigned.unionByName(rest_rows).localCheckpoint(eager=True)
