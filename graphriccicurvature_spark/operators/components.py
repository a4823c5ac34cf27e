"""Connected components: large-star / small-star (Kiveris et al. 2014).

North-rule kernel (BASELINE.json). Fully DataFrame-based alternating star
contractions; converges in O(log^2 n) rounds on any graph, each round two
shuffles. Component id = minimum node id in the component (exact match vs
``nx.connected_components`` after the same canonical relabeling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.lineage import truncate_plan


def _orient(edges: DataFrame) -> DataFrame:
    """One row per undirected pair, oriented big -> small (u > v)."""
    return (
        edges.select(F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _large_star(E: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).

    Window form (round 6): one exchange on ``u`` computes the per-node min
    in-row, and each symmetric row (u, v) with v > u directly emits
    (v, m) — the join-based form paid a groupBy exchange PLUS a join
    exchange PLUS a dedup exchange for the same set. Output is exactly one
    row per input edge (possibly duplicated pairs — the round's closing
    dedup in ``_small_star`` restores canonical form; set semantics are
    identical because per-u minima ignore multiplicity)."""
    from pyspark.sql import Window

    sym = E.union(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    return (
        sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(E: DataFrame) -> DataFrame:
    """Within each node's smaller-neighbor star, rewire all to the minimum.

    Window form over the big->small-oriented input: rows whose v IS the
    per-u minimum emit the self arc (u, m) (at least one such row exists —
    the minimum itself); every other row emits (v, m). One exchange for
    the window + one for the closing dedup; the join-based form paid a
    groupBy + join + union + dedup."""
    from pyspark.sql import Window

    w = Window.partitionBy("u")
    out = E.withColumn("m", F.min("v").over(w)).select(
        F.when(F.col("v") == F.col("m"), F.col("u")).otherwise(F.col("v")).alias("u"),
        F.col("m").alias("v"),
    )
    return out.filter(F.col("u") != F.col("v")).dropDuplicates(["u", "v"])


def connected_components_hybrid(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    collect_cap: int = 100_000,
) -> DataFrame:
    """CC that collects small edge sets to a driver union-find (one job)
    and falls back to the distributed large-star/small-star fixpoint above
    ``collect_cap`` edges.

    For sparse derived graphs (near-duplicate pair graphs: |pairs| << |docs|)
    the distributed fixpoint's per-round jobs dominate; the hybrid keeps
    the scale path while making the common case a single collect. Labels
    (min node id) are identical on both paths.
    """
    spark = edges.sparkSession
    # the pair table's lineage is consumed up to three times below (the
    # collect, the node union, and the callers' final label join). A lazy
    # checkpoint makes the collect materialize it once; for LSH/near-dup
    # callers the pair lineage is the whole candidate+verify pipeline, which
    # previously re-ran per consumer (measured 3x at sf0.1).
    edges = truncate_plan(edges.select("src", "dst"), eager=False)
    pairs = (
        edges.filter(F.col("src") != F.col("dst"))
        .limit(collect_cap + 1)
        .collect()
    )
    if len(pairs) > collect_cap:  # pragma: no cover - web-scale fallback
        return connected_components(edges, vertices=vertices)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for row in pairs:
        a, b = row["src"], row["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
    merged = [(x, find(x)) for x in parent if find(x) != x]
    all_nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    )
    if vertices is not None:
        all_nodes = all_nodes.union(
            vertices.select(F.col(vertices.columns[0]).alias("node"))
        )
    all_nodes = all_nodes.distinct()
    if not merged:
        return all_nodes.select("node", F.col("node").alias("component"))
    lab = spark.createDataFrame(merged, "node long, component long")
    return all_nodes.join(F.broadcast(lab), "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 64,
    init: DataFrame | None = None,
) -> DataFrame:
    """Returns ``(node, component)`` with component = min node id.

    ``vertices`` (optional single-column ``node`` DataFrame) adds isolated
    nodes as their own singleton components.

    ``init`` (optional ``(node, component)`` from a previous run)
    warm-starts the fixpoint for the incremental-crawl pattern — the CC
    twin of ``pagerank(init=...)``. Each prior label becomes one extra
    edge (node, old_component): old labels are min-node-ids, so formerly
    connected regions collapse to their old minimum in the first star
    round instead of over O(log D) rounds, and only genuinely new
    structure pays iteration. VALID FOR EDGE ADDITIONS ONLY (new ⊇ old —
    the union-of-snapshots model of a growing crawl): label edges assert
    "these nodes are connected", which deletions would falsify. The
    result is exactly the cold min-label components of the new graph —
    warm(full, init=cold(subset)) == cold(full), tested as an identity.
    """
    spark = edges.sparkSession
    if init is not None:
        edges = edges.select("src", "dst").union(
            init.select(
                F.col("node").alias("src"), F.col("component").alias("dst")
            ).filter(F.col("src") != F.col("dst"))
        )
    E = _orient(edges)
    all_nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    )
    if vertices is not None:
        all_nodes = all_nodes.union(vertices.select(F.col(vertices.columns[0]).alias("node")))
    if init is not None:
        all_nodes = all_nodes.union(init.select("node"))
    all_nodes = all_nodes.distinct()

    prev_sig = None
    for _ in range(max_iter):
        # lazy checkpoint: the signature aggregate below is the action that
        # materializes the round — one job per round instead of two
        E = _small_star(_large_star(E)).transform(
            lambda d: truncate_plan(d, eager=False)
        )
        sig = E.agg(
            F.count("*").alias("c"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (sig["c"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig

    labels = E.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        all_nodes.join(labels, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )
