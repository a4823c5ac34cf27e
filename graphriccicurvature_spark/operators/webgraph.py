"""Directed web-graph structure operators: strongly connected components,
Broder bow-tie decomposition, host-level graph rollup, Katz centrality.

These extend the north-rule link-graph family (PageRank / CC / LPA /
triangles) with the directed-structure analyses run on real crawls:
Broder et al. 2000 ("Graph structure in the web") decompose the crawl
into CORE/IN/OUT/TUBES/TENDRILS/DISCONNECTED around the giant SCC, and
host-level aggregation is the standard anti-spam / sampling rollup.

Design for 100 TB: everything is DataFrame joins + hash aggregations with
per-round lineage truncation (plans/lineage.py). SCC uses the coloring /
forward-backward algorithm (Orzan 2004; Slota et al. 2014): each outer
round trims trivial SCCs (zero in- or out-degree within the active set —
on crawl snapshots this alone removes most of TENDRILS), min-label
propagates forward to partition the active set into color classes, then
marks each class pivot's SCC by backward reachability inside the class.
Every fixpoint round is one shuffle join + one min-aggregation, the same
per-round shape (and skew behavior) as a PageRank iteration; convergence
actions are single-row scalar aggregates. Web graphs converge in few
outer rounds: one giant SCC plus a shallow periphery (Broder fig. 9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.lineage import truncate_plan

HOST_RE = r"^https?://([^/:]+)(:[0-9]+)?/"


def _nodes_of(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )


def _min_label_fixpoint(e: DataFrame, labels: DataFrame) -> DataFrame:
    """Propagate min ``lbl`` along arcs src->dst to fixpoint.

    Each round does one arc-hop relaxation PLUS a pointer-jumping hop
    (``lbl(v) <- lbl(lbl(v))``): if u's current label is m, then m
    reaches u, so anything reaching m also reaches u and m's own label
    is a valid (smaller-or-equal) label for u. The shortcut makes label
    chains collapse doubly per round — O(log D) rounds instead of O(D)
    on long paths, the same trick large-star/small-star CC uses — at
    the cost of one extra self-join keyed on the label.

    Labels only decrease, so the fixpoint test is ONE scalar aggregate
    (sum of labels unchanged <=> no label changed) instead of a
    change-detection join.
    """
    labels = truncate_plan(labels.select("node", "lbl"))
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    while True:
        contrib = (
            e.join(labels, e.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("_nl"))
        )
        hop = labels.join(contrib, "node", "left").select(
            "node", F.least("lbl", F.coalesce("_nl", "lbl")).alias("lbl")
        )
        # pointer jump: look up the label's own label — label chains
        # collapse doubly per round (O(log D) rounds, measured 16 -> 8 on
        # the sf0.1 giant core) for the price of one label-keyed
        # self-join; a second jump bought no further rounds in the A/B,
        # so exactly one is applied
        lut = hop.select(F.col("node").alias("_m"), F.col("lbl").alias("_ml"))
        hop = hop.join(lut, hop.lbl == lut._m, "left").select(
            "node", F.least("lbl", F.coalesce("_ml", "lbl")).alias("lbl")
        )
        # lazy checkpoint: the convergence aggregate below is the action
        # that materializes the round (pagerank.py convergence-mode
        # pattern) — one job per round instead of two
        labels = truncate_plan(hop, eager=False)
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum


def _reach_fixpoint(e: DataFrame, seeds: DataFrame) -> DataFrame:
    """All nodes reachable FROM ``seeds`` along arcs (seeds included).
    Frontier BFS: per round one join + distinct + anti-join; the
    frontier's lazy checkpoint is materialized by the emptiness count
    (one job per round), and the visited union's by the NEXT round's
    count — so each round pays a single action. Rounds = reach depth
    (small on web graphs)."""
    visited = truncate_plan(seeds.select("node").distinct())
    frontier = visited
    while True:
        nxt = truncate_plan(
            e.join(frontier, e.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti"),
            eager=False,
        )
        if nxt.count() == 0:
            return visited
        visited = truncate_plan(visited.union(nxt), eager=False)
        frontier = nxt


def strongly_connected_components(edges: DataFrame) -> DataFrame:
    """Exact SCCs of the directed graph; returns ``(node, scc_id)`` with
    ``scc_id`` = the minimum node id in the component (the same labeling
    convention as undirected connected_components, components.py).

    Coloring / FW-BW outer loop:

    1. **Trim** (to fixpoint): an active node with no in-arc or no
       out-arc from/to active nodes is its own SCC. Removes the DAG-like
       periphery (most of a crawl's TENDRILS) with two semi-joins per
       round.
    2. **Color**: forward min-label fixpoint over active arcs —
       ``color(v) = min{id(u) : u ->* v within active}``. Every SCC lands
       entirely inside one color class.
    3. **Harvest**: the pivot of class c is the node p with id == c
       (the class's min id, which reaches the whole class). SCC(p) =
       {v in class c : v ->* p via arcs inside class c} — found by
       backward frontier BFS restricted to same-color arcs. Since p
       reaches every v in its class, every v that reaches p is mutually
       reachable with p, and p is the minimum id of that SCC.
    4. Remove all harvested SCCs (one per color class, all classes in
       parallel), repeat on the remainder.

    Each outer round removes at least one whole SCC per color class, so
    the loop terminates; on bow-tie-shaped graphs the giant SCC and the
    periphery go in the first round or two.
    """
    e_all = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    active = truncate_plan(_nodes_of(e_all))
    done: DataFrame | None = None
    spark = edges.sparkSession

    def add_done(df: DataFrame) -> None:
        nonlocal done
        done = df if done is None else truncate_plan(done.union(df))

    while active.count() > 0:
        # restrict arcs to the active induced subgraph
        e = truncate_plan(
            e_all.join(active.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
        # 1. trim to fixpoint
        while True:
            has_in = e.select(F.col("dst").alias("node")).distinct()
            has_out = e.select(F.col("src").alias("node")).distinct()
            keep = truncate_plan(
                active.join(has_in, "node", "left_semi").join(
                    has_out, "node", "left_semi"
                )
            )
            trimmed = active.join(keep, "node", "left_anti")
            n_trim = trimmed.count()
            if n_trim == 0:
                break
            add_done(trimmed.select("node", F.col("node").alias("scc_id")))
            active = keep
            e = truncate_plan(
                e.join(active.withColumnRenamed("node", "src"), "src", "left_semi")
                .join(active.withColumnRenamed("node", "dst"), "dst", "left_semi")
                .select("src", "dst")
            )
        if active.count() == 0:
            break
        # 2. color: forward min-label fixpoint
        colors = _min_label_fixpoint(
            e, active.select("node", F.col("node").alias("lbl"))
        )
        # 3. harvest: backward BFS from each pivot inside its color class
        ce = truncate_plan(
            e.join(colors.withColumnRenamed("node", "src"), "src")
            .withColumnRenamed("lbl", "c_src")
            .join(
                colors.withColumnRenamed("node", "dst").withColumnRenamed(
                    "lbl", "c_dst"
                ),
                "dst",
            )
            .filter(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst", F.col("c_src").alias("c"))
        )
        # backward min-label fixpoint on the same-color arcs: bwd(v) = min
        # id v reaches inside its class. v belongs to its pivot's SCC iff
        # bwd(v) == color(v) (the class min p: bwd(v)=p <=> v reaches p,
        # and p reaches the whole class by construction). Same O(log D)
        # pointer-jumped loop as coloring — no frontier BFS whose round
        # count would scale with the giant core's diameter.
        rev = ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        bwd = _min_label_fixpoint(
            rev, active.select("node", F.col("node").alias("lbl"))
        ).withColumnRenamed("lbl", "bwd")
        member = truncate_plan(
            colors.join(bwd, "node")
            .filter(F.col("lbl") == F.col("bwd"))
            .select("node", F.col("lbl").alias("c"))
        )
        add_done(member.select("node", F.col("c").alias("scc_id")))
        active = truncate_plan(
            active.join(member.select("node"), "node", "left_anti")
        )
    if done is None:
        schema = "node long, scc_id long"
        return spark.createDataFrame([], schema)
    return done


def bowtie_classification(
    edges: DataFrame, scc: DataFrame | None = None
) -> DataFrame:
    """Broder bow-tie decomposition around the giant SCC; returns
    ``(node, bowtie_class)`` with classes CORE / IN / OUT / TUBE /
    TENDRIL / DISC.

    CORE = largest SCC (ties -> smaller scc_id). IN = reaches CORE,
    OUT = reachable from CORE. Of the remainder: TUBE is on an IN->OUT
    path (reachable from IN and reaches OUT — such paths cannot touch
    CORE, else the node would be IN/OUT), TENDRIL hangs off IN or leads
    into OUT but not both, DISC is in another weak component. Costs one
    SCC + four frontier-BFS fixpoints, all PageRank-iteration-shaped.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    nodes = _nodes_of(e)
    if scc is None:
        scc = strongly_connected_components(edges)
    sizes = scc.groupBy("scc_id").agg(F.count("*").alias("n"))
    top = sizes.orderBy(F.desc("n"), F.asc("scc_id")).limit(1)
    core = truncate_plan(
        scc.join(F.broadcast(top), "scc_id", "left_semi").select("node")
    )
    fwd = _reach_fixpoint(e, core)  # CORE ∪ OUT
    bwd = _reach_fixpoint(rev, core)  # CORE ∪ IN
    out_set = fwd.join(core, "node", "left_anti")
    in_set = bwd.join(core, "node", "left_anti")
    rest = (
        nodes.join(fwd, "node", "left_anti").join(bwd, "node", "left_anti")
    )
    # reachable from IN / reaching OUT: restricted to rest automatically —
    # a rest node on a CORE-touching path would already be IN or OUT
    from_in = _reach_fixpoint(e, in_set).join(rest, "node", "left_semi")
    to_out = _reach_fixpoint(rev, out_set).join(rest, "node", "left_semi")
    cls = (
        nodes.join(core.withColumn("_core", F.lit(1)), "node", "left")
        .join(in_set.select("node", F.lit(1).alias("_in")), "node", "left")
        .join(out_set.select("node", F.lit(1).alias("_out")), "node", "left")
        .join(from_in.select("node", F.lit(1).alias("_fi")), "node", "left")
        .join(to_out.select("node", F.lit(1).alias("_to")), "node", "left")
        .select(
            "node",
            F.when(F.col("_core") == 1, "CORE")
            .when(F.col("_in") == 1, "IN")
            .when(F.col("_out") == 1, "OUT")
            .when((F.col("_fi") == 1) & (F.col("_to") == 1), "TUBE")
            .when((F.col("_fi") == 1) | (F.col("_to") == 1), "TENDRIL")
            .otherwise("DISC")
            .alias("bowtie_class"),
        )
    )
    return cls


def host_of(url):
    """Host component of a url column (port stripped)."""
    return F.regexp_extract(url, HOST_RE, 1)


def host_graph(
    url_edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    exclude_intra: bool = False,
) -> DataFrame:
    """Aggregate a page-level url edge table to the host level:
    ``(src_host, dst_host, n_links)``. The rollup behind host-level
    PageRank, domain blocklists, and crawl sampling weights — a 100 TB
    edge table collapses to the host count (~10^8 rows for the full web),
    after which every downstream graph op is cheap. One projection + one
    hash aggregation; intra-host links (the vast majority on real crawls)
    are droppable before the shuffle with ``exclude_intra``."""
    hg = url_edges.select(
        host_of(F.col(src_col)).alias("src_host"),
        host_of(F.col(dst_col)).alias("dst_host"),
    )
    if exclude_intra:
        hg = hg.filter(F.col("src_host") != F.col("dst_host"))
    return hg.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def random_walks(
    edges: DataFrame,
    seeds: DataFrame,
    steps: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic random walks: from every seed, ``steps`` hops where
    the hop from node v at step t picks out-neighbor index
    ``md5(salt||v||'_'||t) mod outdeg(v)`` over the dst-sorted adjacency.
    Returns ``(seed, step, node)`` with step 0 = the seed; walks stop
    early at sink nodes (no out-arcs).

    The crawl-pipeline sampler: hash-seeded choices make the walk corpus
    reproducible under re-runs, retries, resharding and cluster size
    (``df.sample``-based walkers are none of these), and the exact same
    arithmetic replays in ANSI SQL, so the driver oracle pins every
    visited node, not a distributional property. Per step: one shuffle
    join keyed on the current node against a ranked adjacency built once
    — the PageRank shuffle shape again; lineage truncated per hop.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    from pyspark.sql import Window

    ranked = e.select(
        "src",
        "dst",
        (F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1).alias(
            "idx"
        ),
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    # every step joins on adj.src — partition+cache the (loop-invariant)
    # ranked adjacency once so steps reshuffle only the walk frontier
    adj = truncate_plan(ranked.join(outdeg, "src")).repartition(n_part, "src").cache()
    cur = truncate_plan(
        seeds.select(F.col("node").alias("seed"))
        .distinct()
        .select("seed", F.lit(0).alias("step"), F.col("seed").alias("node"))
    )
    out = cur
    for t in range(steps):
        pick = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(salt),
                            F.col("node").cast("string"),
                            F.lit("_"),
                            F.lit(str(t)),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.col("od")
        )
        cur = truncate_plan(
            cur.join(adj, cur.node == adj.src)
            .filter(F.col("idx") == pick)
            .select("seed", F.lit(t + 1).alias("step"), F.col("dst").alias("node"))
        )
        out = out.union(cur)
    out = truncate_plan(out)
    adj.unpersist()
    return out


def katz_centrality_bounded(
    edges: DataFrame,
    alpha: float = 0.1,
    beta: float = 1.0,
    num_iterations: int = 3,
    directed: bool = True,
) -> DataFrame:
    """Katz centrality, ``num_iterations`` fixed rounds (no normalization,
    so a bounded-depth SQL oracle can replay it exactly):

        x_0(v) = beta;   x_{t+1}(v) = beta + alpha * sum_{u->v} w(u,v) x_t(u)

    Returns ``(node, katz)``. Truncating the Neumann series at k rounds
    counts walks of length <= k into v with geometric damping — the
    path-counting cousin of PageRank (no out-degree normalization, so
    hubs are not penalized for fan-out). Round-6 shape: the edge table is
    hash-partitioned by ``src`` once and cached (only the |V|-sized score
    vector reshuffles per round), the node table is pre-partitioned so
    attaching new scores is a co-partitioned zero-exchange join, and
    lineage truncation is lazy (materialized by the next round's exchange
    or the caller's action)."""
    if num_iterations < 1:
        raise ValueError(f"katz: num_iterations must be >= 1, got {num_iterations}")
    e = edges.select("src", "dst", "weight")
    if not directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    e_src = e.repartition(n_part, "src").cache()
    nodes = _nodes_of(e).cache()
    x = nodes.withColumn("katz", F.lit(float(beta)))
    for _ in range(num_iterations):
        contrib = (
            e_src.join(x, e_src.src == x.node)
            .select("dst", (F.col("weight") * F.col("katz")).alias("k"))
            .groupBy("dst")
            .agg(F.sum("k").alias("k"))
        )
        x = truncate_plan(
            nodes.join(contrib, nodes.node == contrib.dst, "left").select(
                "node",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce("k", F.lit(0.0))
                ).alias("katz"),
            ),
        )
    e_src.unpersist()
    nodes.unpersist()
    return x


def condensation_graph(
    edges: DataFrame, scc: DataFrame | None = None
) -> DataFrame:
    """Condensation DAG of the directed graph: one node per SCC, one arc
    per ordered pair of distinct SCCs with at least one underlying arc.
    Returns ``(scc_src, scc_dst, n_arcs)``.

    The crawl-structure workhorse after SCC itself: the condensation is
    what bow-tie reachability, frontier scheduling, and dead-end pruning
    actually operate on, and at web scale it is dramatically smaller than
    the page graph (the giant CORE collapses to a single node). Cost
    beyond SCC: two label-lookup joins keyed on node (same shape as the
    PageRank contribution join) + one hash aggregation with map-side
    partial combine absorbing the giant component's intra-arcs.
    """
    if scc is None:
        scc = strongly_connected_components(edges)
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    lab_s = scc.select(F.col("node").alias("src"), F.col("scc_id").alias("scc_src"))
    lab_d = scc.select(F.col("node").alias("dst"), F.col("scc_id").alias("scc_dst"))
    return (
        e.join(lab_s, "src")
        .join(lab_d, "dst")
        .filter(F.col("scc_src") != F.col("scc_dst"))
        .groupBy("scc_src", "scc_dst")
        .agg(F.count(F.lit(1)).alias("n_arcs"))
    )


def topological_levels(
    dag_edges: DataFrame, max_rounds: int | None = None
) -> DataFrame:
    """Longest-path level of every node in a DAG: ``level(v)`` = length of
    the longest arc path ending at v (sources have level 0). Returns
    ``(node, level)``.

    Levels ARE the parallel schedule of a DAG — all nodes of one level
    can be processed concurrently once the previous level is done — which
    is how recrawl waves and dependency-ordered recomputations are
    scheduled over a condensation. Iterative max-relaxation: per round
    one shuffle join keyed src + one max-aggregation keyed node (the
    PageRank round shape), lineage truncated per round; levels only
    increase and are bounded by the DAG depth, so the fixpoint test is a
    single scalar sum like the SCC coloring loop. Rounds = DAG depth —
    small for condensations of crawl snapshots (shallow bow-tie
    periphery around one collapsed CORE).

    Cycles would diverge, so the loop aborts past ``max_rounds``
    (default: number of nodes, the longest possible simple path).
    """
    e = dag_edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    nodes = _nodes_of(e)
    lev = truncate_plan(nodes.select("node", F.lit(0).alias("level")))
    cap = max_rounds if max_rounds is not None else nodes.count()
    prev_sum = 0
    for r in range(cap + 1):
        contrib = (
            e.join(lev, e.src == lev.node)
            .groupBy(F.col("dst").alias("node"))
            .agg((F.max("level") + 1).alias("_nl"))
        )
        lev = truncate_plan(
            lev.join(contrib, "node", "left").select(
                "node", F.greatest("level", F.coalesce("_nl", "level")).alias("level")
            ),
            eager=False,
        )
        cur_sum = lev.agg(F.sum("level")).collect()[0][0]
        if cur_sum == prev_sum:
            return lev
        prev_sum = cur_sum
    raise ValueError(
        f"topological_levels: no fixpoint after {cap} rounds — input has a cycle "
        "(run strongly_connected_components/condensation_graph first)"
    )


def eigenvector_centrality_bounded(
    edges: DataFrame,
    num_iterations: int = 3,
    directed: bool = True,
) -> DataFrame:
    """Eigenvector centrality by ``num_iterations`` unnormalized power
    steps ``x_{t+1}(v) = sum_{u->v} w(u,v) * x_t(u)`` from x_0 = 1,
    followed by ONE final L1 normalization. Returns ``(node, score)``.

    Katz's un-damped cousin (reference exposes curvature-weighted graphs
    whose dominant eigenvector is the natural importance measure; PageRank
    is this plus teleport + out-degree normalization). Normalizing once at
    the end instead of per round changes nothing mathematically (the
    iteration is linear, so scaling commutes) and keeps every round free
    of driver actions AND exactly replayable by a bounded recursive-CTE
    oracle — a per-round global L2 scalar would force a crossJoin
    broadcast per round like HITS. Per round one shuffle join + one sum
    aggregation; the final normalizer is a single-row aggregate joined
    back by crossJoin broadcast.
    """
    if num_iterations < 1:
        raise ValueError(
            f"eigenvector_centrality: num_iterations must be >= 1, got {num_iterations}"
        )
    e = edges.select("src", "dst", "weight")
    if not directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    # loop-invariant edge view partitioned by its per-round join key; the
    # node table is re-read every round, so cache it too (guide §2.4)
    e = e.repartition(n_part, "src").cache()
    nodes = _nodes_of(e).cache()
    x = nodes.withColumn("x", F.lit(1.0))
    for _ in range(num_iterations):
        contrib = (
            e.join(x, e.src == x.node)
            .select("dst", (F.col("weight") * F.col("x")).alias("v"))
            .groupBy("dst")
            .agg(F.sum("v").alias("v"))
        )
        x = truncate_plan(
            nodes.join(contrib, nodes.node == contrib.dst, "left").select(
                "node", F.coalesce("v", F.lit(0.0)).alias("x")
            )
        )
    tot = x.agg(F.sum(F.abs(F.col("x"))).alias("_tot"))
    out = x.crossJoin(F.broadcast(tot)).select(
        "node",
        F.when(F.col("_tot") > 0, F.col("x") / F.col("_tot"))
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    e.unpersist()
    nodes.unpersist()
    return out


def partition_modularity(edges: DataFrame, partition: DataFrame) -> DataFrame:
    """Newman modularity of ``partition`` (node, component) on the
    undirected weighted graph, returned as a one-row DataFrame
    ``(n_components, modularity)`` — the distributed, no-collect twin of
    :func:`..community.modularity` (same formula,
    Q = W_in/m - sum_c deg_c^2 / (4 m^2)), shaped for query pipelines
    that score a labeling (host partition, LPA labels, flow communities)
    without pulling anything to the driver.

    Two shuffle joins to attach labels + two hash aggregations (component
    then global) — constant job count at any scale; the global stage
    reduces to one row.
    """
    e = edges.select("src", "dst", "weight")
    p_src = partition.select(
        F.col("node").alias("src"), F.col("component").alias("c_src")
    )
    p_dst = partition.select(
        F.col("node").alias("dst"), F.col("component").alias("c_dst")
    )
    j = e.join(p_src, "src").join(p_dst, "dst")
    contrib = j.select(
        F.col("c_src").alias("c"),
        "weight",
        F.when(F.col("c_src") == F.col("c_dst"), F.col("weight"))
        .otherwise(F.lit(0.0))
        .alias("win"),
    ).union(j.select(F.col("c_dst").alias("c"), "weight", F.lit(0.0)))
    per_c = contrib.groupBy("c").agg(
        F.sum("weight").alias("deg_c"), F.sum("win").alias("win_c")
    )
    return per_c.agg(
        F.count(F.lit(1)).alias("n_components"),
        F.sum("deg_c").alias("_sumdeg"),
        F.sum("win_c").alias("_win"),
        F.sum(F.col("deg_c") * F.col("deg_c")).alias("_sumdeg2"),
    ).select(
        "n_components",
        F.when(
            F.col("_sumdeg") > 0,
            F.col("_win") / (F.col("_sumdeg") / 2.0)
            - F.col("_sumdeg2") / (F.col("_sumdeg") * F.col("_sumdeg")),
        )
        .otherwise(F.lit(0.0))
        .alias("modularity"),
    )


def betweenness_from_sources(
    edges: DataFrame,
    sources: DataFrame,
    directed: bool = False,
) -> DataFrame:
    """Brandes betweenness centrality accumulated from a source set:
    ``bc(v) = sum_{s in S, s != v} delta_s(v)`` with the standard
    pair-dependency ``delta_s(v) = sum_{t} sigma_st(v) / sigma_st``
    (endpoints excluded, no normalization). With S = all nodes this is
    exact betweenness; with a fixed sample of sources it is the standard
    pivot estimator (Brandes & Pich 2007) — the only form that is
    tractable at web scale, where exact betweenness is O(|V||E|).
    Returns ``(node, betweenness)`` for every node of the graph.

    Distributed Brandes, level-synchronous in both directions:

    * **Forward** (shortest-path counting): frontier rows
      ``(s, node, sigma)`` advance one hop per round — one shuffle join
      keyed on the current node + one (s, node) sum-aggregation +
      one anti-join against settled pairs. All |S| sources advance in
      the SAME round (state is keyed by pair, so the fan-out is |S|
      frontiers wide, not |S| sequential BFS runs).
    * **Backward** (dependency accumulation): for levels d = depth..1,
      join level-d pairs with their level-(d-1) predecessors along arcs:
      ``contrib = sigma(s,u)/sigma(s,v) * (1 + delta(s,v))`` — one join
      + one aggregation per level, delta folded in with a left join.

    Per-round cost is the PageRank shuffle shape times |S|; rounds =
    2 x BFS depth (small on web graphs). The DuckDB oracle replays the
    same quantity from the closed form
    ``sum_{s,t} [d(s,v)+d(v,t)=d(s,t)] * sigma(s,v)*sigma(v,t)/sigma(s,t)``
    (walk-count CTEs), which equals Brandes' recursion exactly.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        e = e.distinct()
    nodes = _nodes_of(e)
    seeds = sources.select(F.col("node").alias("s")).distinct().join(
        nodes.select(F.col("node").alias("s")), "s", "left_semi"
    )
    # ---- forward sweep: settled (s, node, d, sigma) -------------------
    frontier = truncate_plan(
        seeds.select(
            "s", F.col("s").alias("node"), F.lit(0).alias("d"),
            F.lit(1.0).alias("sigma"),
        )
    )
    settled = frontier
    dmax = 0
    while True:
        hop = (
            frontier.join(e, frontier.node == e.src)
            .groupBy("s", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = truncate_plan(
            hop.join(settled.select("s", "node"), ["s", "node"], "left_anti")
            .select("s", "node", F.lit(dmax + 1).alias("d"), "sigma"),
            eager=False,
        )
        if nxt.count() == 0:
            break
        dmax += 1
        settled = truncate_plan(settled.union(nxt), eager=False)
        frontier = nxt
    settled = truncate_plan(settled)
    # ---- backward sweep: delta per (s, node), levels dmax..1 ----------
    delta = settled.select("s", "node", F.lit(0.0).alias("delta"))
    for lvl in range(dmax, 0, -1):
        at = settled.filter(F.col("d") == lvl).join(
            delta.select("s", "node", "delta"), ["s", "node"]
        )
        preds = settled.filter(F.col("d") == lvl - 1).select(
            "s", F.col("node").alias("pnode"), F.col("sigma").alias("psigma")
        )
        contrib = (
            at.join(e, at.node == e.dst)
            .join(
                preds,
                (F.col("src") == F.col("pnode")) & (at.s == preds.s),
            )
            .select(
                at.s.alias("s"),
                F.col("pnode").alias("node"),
                (
                    F.col("psigma") / F.col("sigma") * (1.0 + F.col("delta"))
                ).alias("c"),
            )
            .groupBy("s", "node")
            .agg(F.sum("c").alias("c"))
        )
        delta = truncate_plan(
            delta.join(contrib, ["s", "node"], "left").select(
                "s", "node",
                (F.col("delta") + F.coalesce("c", F.lit(0.0))).alias("delta"),
            ),
            eager=False,
        )
    bc = (
        delta.filter(F.col("s") != F.col("node"))
        .groupBy("node")
        .agg(F.sum("delta").alias("betweenness"))
    )
    return nodes.join(bc, "node", "left").select(
        "node", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )


def robustness_report(edges: DataFrame, k: int = 10) -> DataFrame:
    """Hub-removal robustness: how much of the graph stays in the giant
    connected component after deleting the top-``k`` highest-degree nodes
    (deterministic ties by node id) — the crawl-resilience / link-farm-
    dependence report (scale-free graphs famously shatter under targeted
    hub removal but not random failure, Albert-Jeong-Barabási 2000).

    Returns ONE row: ``(k_removed, n_nodes, n_edges_before,
    n_edges_after, giant_before, giant_after, giant_frac_before,
    giant_frac_after)`` with fractions over the ORIGINAL node count
    (removed hubs count as lost coverage, not as a shrunken base).

    Scale shape: degree aggregate + a k-row global top-k
    (TakeOrderedAndProject) broadcast into two anti-joins, then the same
    hybrid CC used everywhere (driver union-find under its cap,
    large-star/small-star fixpoint above); the two giant-size reductions
    are 1-row aggregates. No step collects more than k rows plus scalars.
    """
    from ..sources.edges import canonicalize
    from .components import connected_components_hybrid

    und = canonicalize(edges).select("src", "dst")
    nodes = (
        und.select(F.col("src").alias("node"))
        .union(und.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = (
        und.select(F.col("src").alias("node"))
        .union(und.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    hubs = deg.orderBy(F.desc("degree"), F.asc("node")).limit(k).select("node")
    after = (
        und.join(hubs.select(F.col("node").alias("src")), "src", "left_anti")
        .join(hubs.select(F.col("node").alias("dst")), "dst", "left_anti")
        .select("src", "dst")
    )

    def _giant(e: DataFrame, verts: DataFrame) -> DataFrame:
        cc = connected_components_hybrid(
            e.withColumn("weight", F.lit(1.0)), vertices=verts
        )
        return cc.groupBy("component").agg(F.count(F.lit(1)).alias("sz")).agg(
            F.coalesce(F.max("sz"), F.lit(0)).alias("giant")
        )

    remaining = nodes.join(hubs, "node", "left_anti")
    stats = (
        nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
        .join(F.broadcast(und.agg(F.count(F.lit(1)).alias("n_edges_before"))))
        .join(F.broadcast(after.agg(F.count(F.lit(1)).alias("n_edges_after"))))
        .join(F.broadcast(hubs.agg(F.count(F.lit(1)).alias("k_removed"))))
        .join(F.broadcast(_giant(und, nodes).withColumnRenamed("giant", "giant_before")))
        .join(F.broadcast(_giant(after, remaining).withColumnRenamed("giant", "giant_after")))
    )
    return stats.select(
        "k_removed",
        "n_nodes",
        "n_edges_before",
        "n_edges_after",
        "giant_before",
        "giant_after",
        (F.col("giant_before") / F.col("n_nodes")).alias("giant_frac_before"),
        (F.col("giant_after") / F.col("n_nodes")).alias("giant_frac_after"),
    )


def link_churn(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Per-source link churn between two crawl snapshots: for every node
    appearing as a source in either snapshot, how many of its outlinks
    were added, removed, or retained by the recrawl — the link-rot /
    freshness audit run after every recrawl, and the input that decides
    which hosts need PageRank recomputed (pair with
    ``pagerank(init=...)``).

    One full-outer equi-join on (src, dst) — both sides hash-partition on
    the same key, so at 100 TB this is a single co-partitioned shuffle
    (or zero shuffles off :mod:`sources.bucketed` storage) — followed by a
    codegen groupBy on src. Duplicate rows within a snapshot are collapsed
    first so counts are set semantics.

    Returns ``(src, added, removed, retained, churn_rate)`` with
    churn_rate = (added + removed) / (added + removed + retained),
    rounded to 6 dp.
    """
    o = old_edges.select("src", "dst").distinct().withColumn("_o", F.lit(1))
    n = new_edges.select("src", "dst").distinct().withColumn("_n", F.lit(1))
    j = o.join(n, ["src", "dst"], "full_outer")
    agg = j.groupBy("src").agg(
        F.sum(F.when(F.col("_o").isNull(), 1).otherwise(0)).alias("added"),
        F.sum(F.when(F.col("_n").isNull(), 1).otherwise(0)).alias("removed"),
        F.sum(
            F.when(F.col("_o").isNotNull() & F.col("_n").isNotNull(), 1).otherwise(0)
        ).alias("retained"),
    )
    tot = F.col("added") + F.col("removed") + F.col("retained")
    return agg.select(
        "src",
        "added",
        "removed",
        "retained",
        F.round(
            (F.col("added") + F.col("removed")).cast("double") / tot.cast("double"), 6
        ).alias("churn_rate"),
    )
