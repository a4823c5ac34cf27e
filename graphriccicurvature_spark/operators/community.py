"""Ricci community detection: weight-threshold cuts + modularity-drop search.

Reference: util.py:40-112 (cut + cutoff search) and
OllivierRicci.py:809-894 (community drivers). The Louvain-style modularity
(python-louvain ``community_louvain.modularity``, called at util.py:98) is a
plain DataFrame aggregation here:

    Q = sum_c [ w_in(c)/m  -  (deg(c) / (2m))^2 ]

with m = total edge weight, w_in(c) = intra-community edge weight, deg(c) =
sum of weighted degrees. Components after each cut are the clustering
(util.py:96) via the large-star/small-star operator.

Fused sweep (scale design): the reference recomputes components and
modularity from scratch at every cutoff. Here the cutoffs are processed
*ascending*, so the edge sets are nested and components can only merge:

1. one full CC run at the smallest cutoff;
2. per subsequent cutoff, CC runs only on the *delta* edges contracted by
   the previous labels (a tiny graph), and the label table extends by one
   column via a broadcast merge-map join — no full-graph work;
3. modularity for ALL cutoffs is computed in ONE aggregation job over the
   edge table joined once with the wide label table (explode by cutoff
   level, two-level agg), instead of 3 jobs x cutoffs.

Labels are identical to a from-scratch CC at each cutoff (component id =
min node id composes through contraction), so results match the reference
sweep exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.lineage import truncate_plan
from ..sources.edges import canonicalize, prepare_edges
from .components import connected_components
from .flow import ricci_flow


def cut_graph_by_cutoff(edges: DataFrame, cutoff: float, weight_col: str = "weight") -> DataFrame:
    """Remove edges with weight > cutoff (reference util.py:40-65)."""
    return edges.filter(F.col(weight_col) <= F.lit(float(cutoff)))


def modularity(edges: DataFrame, partition: DataFrame) -> float:
    """Louvain modularity of ``partition`` (node, component) on ``edges``.

    Single-job formulation: per-component degree/intra sums then
    Q = W_in/m - sum(deg_c^2) / (4 m^2).
    """
    e = edges.select("src", "dst", "weight")
    p_src = partition.select(F.col("node").alias("src"), F.col("component").alias("c_src"))
    p_dst = partition.select(F.col("node").alias("dst"), F.col("component").alias("c_dst"))
    j = e.join(p_src, "src").join(p_dst, "dst")
    contrib = j.select(
        F.col("c_src").alias("c"),
        "weight",
        F.when(F.col("c_src") == F.col("c_dst"), F.col("weight")).otherwise(F.lit(0.0)).alias("win"),
    ).union(j.select(F.col("c_dst").alias("c"), "weight", F.lit(0.0)))
    row = (
        contrib.groupBy("c")
        .agg(F.sum("weight").alias("deg_c"), F.sum("win").alias("win_c"))
        .agg(
            F.sum("deg_c").alias("sumdeg"),
            F.sum("win_c").alias("win_tot"),
            F.sum(F.col("deg_c") * F.col("deg_c")).alias("sumdeg2"),
        )
        .collect()[0]
    )
    if not row["sumdeg"]:
        return 0.0
    m = row["sumdeg"] / 2.0
    return float(row["win_tot"] / m - row["sumdeg2"] / (4.0 * m * m))


# contracted deltas at or under this many rows are merged with a driver-side
# union-find (one collect job) instead of a full distributed CC fixpoint
# (~5 jobs each). The distributed path remains the fallback for genuinely
# large deltas, so the sweep stays correct at any scale.
_HYBRID_DELTA_CAP = 100_000


def _components_sweep(
    edges: DataFrame, cutoffs_asc: list[float], vertices: DataFrame | None = None
) -> tuple[DataFrame, list[str]]:
    """Wide label table ``(node, c0, c1, ...)`` — components of the cut
    graph at each ascending cutoff.

    One full CC at the smallest cutoff, then ONE job collects all delta
    edges *contracted by the base labels* (at most one row per merged
    component pair — usually far fewer than |E|). Because union-find is
    incremental, replaying those pairs level by level on the driver yields
    every level's *merge delta* (only the roots that lost root status at
    that level — O(total merges) driver memory); tiny chained broadcast
    joins then attach the level columns, all inside one shuffle-free stage.
    Total shuffle count is constant in the number of cutoffs. Component ids
    (min node id) are identical to a from-scratch CC per cutoff because
    min-labels compose through contraction.

    If the contracted delta set exceeds ``_HYBRID_DELTA_CAP`` rows (huge
    merge fronts at full web scale), falls back to a distributed per-level
    contraction loop (:func:`_components_sweep_distributed`).
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst", "weight")
    all_nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if vertices is not None:
        all_nodes = all_nodes.union(
            vertices.select(F.col(vertices.columns[0]).alias("node"))
        ).distinct()

    base = cut_graph_by_cutoff(e, float(cutoffs_asc[0]))
    lab = connected_components(base, vertices=all_nodes)
    lab = lab.select("node", F.col("component").alias("c0")).transform(truncate_plan)
    k = len(cutoffs_asc)
    cols = [f"c{i}" for i in range(k)]
    if k == 1:
        return lab, cols

    # bucket(w) = #cutoffs strictly below w = first level whose cut retains
    # the edge (0 = base, k = above every cutoff, never retained)
    bounds = F.array(*[F.lit(float(c)) for c in cutoffs_asc])
    bucket = F.size(F.filter(bounds, lambda b: b < F.col("weight")))
    lmap = lab.select("node", F.col("c0").alias("_l"))
    contracted = (
        e.withColumn("_b", bucket)
        .filter((F.col("_b") >= 1) & (F.col("_b") < k))
        .join(lmap.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("_l", "_ls")
        .join(lmap.withColumnRenamed("node", "dst"), "dst")
        .select(F.col("_b").alias("b"), F.col("_ls").alias("la"), F.col("_l").alias("lb"))
        .filter(F.col("la") != F.col("lb"))
        .distinct()
    )
    pairs = contracted.limit(_HYBRID_DELTA_CAP + 1).collect()
    if len(pairs) > _HYBRID_DELTA_CAP:  # pragma: no cover - web-scale path
        return _components_sweep_distributed(e, lab, cutoffs_asc)

    by_level: dict[int, list[tuple[int, int]]] = {}
    for r in pairs:
        by_level.setdefault(r["b"], []).append((r["la"], r["lb"]))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    # replay deltas level by level; record ONLY the roots that lose root
    # status at each level (delta encoding). Driver allocation is O(total
    # merges), not O(touched labels x levels): a label whose level-(i-1)
    # root r merged at level i follows r's delta entry, every other label's
    # root is unchanged — so c_i = coalesce(delta_i[c_{i-1}], c_{i-1})
    # composes exactly like union-find path compression.
    level_deltas: list[dict[int, int]] = []
    for i in range(1, k):
        losers: set[int] = set()
        for a, b in by_level.get(i, ()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
            losers.add(rb)
        level_deltas.append({r: find(r) for r in losers})

    if not any(level_deltas):
        sel = [F.col("c0").alias(c) for c in cols]
        return lab.select("node", *sel), cols
    W = lab
    prev = "c0"
    for i, delta in enumerate(level_deltas, start=1):
        cur = f"c{i}"
        if not delta:
            W = W.withColumn(cur, F.col(prev))
        else:
            map_df = spark.createDataFrame(
                list(delta.items()), f"{prev} long, _m{i} long"
            )
            W = (
                W.join(F.broadcast(map_df), prev, "left")
                .withColumn(cur, F.coalesce(f"_m{i}", prev))
                .drop(f"_m{i}")
            )
        prev = cur
        if i % 8 == 0:
            W = truncate_plan(W)
    return W.select("node", *cols).transform(truncate_plan), cols


def _components_sweep_distributed(
    e: DataFrame, lab: DataFrame, cutoffs_asc: list[float]
) -> tuple[DataFrame, list[str]]:  # pragma: no cover - web-scale fallback
    """Per-level distributed contraction: CC on each level's delta edges
    contracted by the previous level's labels, composed via broadcast
    merge-map joins. Used when the one-shot collected replay would exceed
    the driver cap."""
    cols = ["c0"]
    W = lab
    for i in range(1, len(cutoffs_asc)):
        lo, hi = float(cutoffs_asc[i - 1]), float(cutoffs_asc[i])
        prev, cur = cols[-1], f"c{i}"
        delta = e.filter((F.col("weight") > lo) & (F.col("weight") <= hi))
        lmap = W.select("node", F.col(prev).alias("_l"))
        contracted = (
            delta.join(lmap.withColumnRenamed("node", "src"), "src")
            .withColumnRenamed("_l", "_ls")
            .join(lmap.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("_ls").alias("src"), F.col("_l").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        merge_df = (
            connected_components(contracted)
            .filter(F.col("node") != F.col("component"))
            .withColumnRenamed("node", prev)
        )
        W = (
            W.join(F.broadcast(merge_df), prev, "left")
            .withColumn(cur, F.coalesce("component", prev))
            .drop("component")
        )
        cols.append(cur)
        if i % 8 == 0:
            W = truncate_plan(W)
    return W.transform(truncate_plan), cols


def _modularities_all(
    edges: DataFrame, W: DataFrame, cols: list[str], cutoffs_asc: list[float]
) -> dict[int, float]:
    """Modularity at every cutoff level in ONE aggregation job.

    Joins the edge table with the wide label table once per side, explodes
    each edge into the cutoff levels that retain it, and runs a two-level
    aggregation; returns {level index -> Q}.
    """
    s = W.select(
        F.col("node").alias("src"), *[F.col(c).alias(f"{c}_s") for c in cols]
    )
    d = W.select(
        F.col("node").alias("dst"), *[F.col(c).alias(f"{c}_d") for c in cols]
    )
    j = edges.select("src", "dst", "weight").join(s, "src").join(d, "dst")
    levels = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(float(cut)).alias("cut"),
                F.col(f"{c}_s").alias("cs"),
                F.col(f"{c}_d").alias("cd"),
            )
            for i, (c, cut) in enumerate(zip(cols, cutoffs_asc))
        ]
    )
    x = (
        j.select("weight", F.explode(levels).alias("t"))
        .filter(F.col("weight") <= F.col("t.cut"))
        .select(
            F.col("t.i").alias("i"),
            F.col("t.cs").alias("cs"),
            F.col("t.cd").alias("cd"),
            "weight",
        )
    )
    contrib = x.select(
        "i",
        F.col("cs").alias("c"),
        "weight",
        F.when(F.col("cs") == F.col("cd"), F.col("weight")).otherwise(F.lit(0.0)).alias("win"),
    ).union(x.select("i", F.col("cd").alias("c"), "weight", F.lit(0.0)))
    rows = (
        contrib.groupBy("i", "c")
        .agg(F.sum("weight").alias("deg_c"), F.sum("win").alias("win_c"))
        .groupBy("i")
        .agg(
            F.sum("deg_c").alias("sumdeg"),
            F.sum("win_c").alias("win_tot"),
            F.sum(F.col("deg_c") * F.col("deg_c")).alias("sumdeg2"),
        )
        .collect()
    )
    out: dict[int, float] = {}
    for r in rows:
        if not r["sumdeg"]:
            out[r["i"]] = 0.0
            continue
        m = r["sumdeg"] / 2.0
        out[r["i"]] = float(r["win_tot"] / m - r["sumdeg2"] / (4.0 * m * m))
    return out


def rf_metric_cutoffs(
    edges: DataFrame, cutoff_step: float = 0.025, drop_threshold: float = 0.01
) -> list[float]:
    """Good clustering cutoffs by modularity drop (reference util.py:68-112).

    Sweeps cutoffs from max(weight) down to 1 in ``cutoff_step`` steps.
    Implementation is the fused ascending sweep (module docstring): one full
    CC + per-cutoff delta contractions + a single all-cutoff modularity job,
    instead of the reference's per-cutoff recomputation.
    """
    edges = edges.select("src", "dst", "weight").cache()
    W = None
    try:
        maxw = edges.agg(F.max("weight")).collect()[0][0]
        cutoff_range = np.arange(maxw, 1, -cutoff_step)
        if len(cutoff_range) == 0:
            return []
        asc = [float(c) for c in cutoff_range[::-1]]
        W, cols = _components_sweep(edges, asc)
        W = W.cache()
        q_by_level = _modularities_all(edges, W, cols, asc)
    finally:
        # repeated sweeps must not accumulate executor storage (same leak
        # class as the flow loop's cache_registry draining); W unpersists
        # here too so a raise inside the modularity job can't leak the
        # cached wide label table (ADVICE r3)
        if W is not None:
            W.unpersist()
        edges.unpersist()
    k = len(asc)
    # mods aligned with the descending cutoff_range: level k-1-j
    mods = [q_by_level.get(k - 1 - j, 0.0) for j in range(k)]
    good_cuts: list[float] = []
    mod_last = mods[-1]
    # scan from the smallest cutoff upward (reference util.py:104-110)
    for i in range(len(mods) - 1, 0, -1):
        mod_now = mods[i]
        if mod_last > mod_now > 1e-4 and abs(mod_last - mod_now) / mod_last > drop_threshold:
            good_cuts.append(float(cutoff_range[i + 1]))
        mod_last = mod_now
    return good_cuts


def check_accuracy_table(
    edges: DataFrame,
    gt: DataFrame,
    cutoff_step: float = 0.025,
    gt_node_col: str = "node",
    gt_label_col: str = "label",
) -> DataFrame:
    """Per-cutoff (cutoff, modularity, ari) sweep table — the DATA behind
    reference ``my_surgery.check_accuracy``'s modularity/ARI plot
    (my_surgery.py:95-161); plot rendering itself is out of engine scope.

    ``gt`` is the ground-truth partition (node, label) — the reference's
    ``clustering_label`` node attribute. Cutoffs run from max(weight) down
    to 1 in ``cutoff_step`` steps, clustering = connected components of the
    cut graph, exactly like the reference loop — but computed with the
    fused ascending sweep: one full CC + delta contractions, ONE
    all-cutoff modularity job, and ONE all-cutoff ARI contingency
    aggregation over the wide label table (three shuffling jobs total,
    constant in the number of cutoffs, vs the reference's per-cutoff
    recomputation).
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst", "weight").cache()
    W = None
    try:
        maxw = e.agg(F.max("weight")).collect()[0][0]
        cutoff_range = np.arange(maxw, 1, -cutoff_step)
        if len(cutoff_range) == 0:
            return spark.createDataFrame(
                [], "cutoff double, modularity double, ari double"
            )
        asc = [float(c) for c in cutoff_range[::-1]]
        # vertices include ground-truth nodes with no incident edges: the
        # reference's check_accuracy clusters every node carrying
        # clustering_label, so an isolated labeled node must enter the ARI
        # contingency as a singleton component (ADVICE r3)
        all_nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .union(gt.select(F.col(gt_node_col).alias("node")))
            .distinct()
        )
        W, cols = _components_sweep(e, asc, vertices=all_nodes)
        W = W.cache()
        q_by_level = _modularities_all(e, W, cols, asc)

        # ARI for ALL cutoff levels in one aggregation: explode each node's
        # per-level cluster label against its ground-truth label, build the
        # (level, cluster, gt) contingency, and reduce the three comb2 sums
        # per level (pair-counting ARI, reference my_surgery.py:8-51).
        j = W.join(
            gt.select(
                F.col(gt_node_col).alias("node"), F.col(gt_label_col).alias("g")
            ),
            "node",
        )
        lv = j.select(
            "g",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("i"), F.col(c).alias("c"))
                        for i, c in enumerate(cols)
                    ]
                )
            ).alias("t"),
        ).select(F.col("t.i").alias("i"), F.col("t.c").alias("c"), "g")

        def comb2(col):
            return F.sum(col * (col - 1) / 2)

        nij = (
            lv.groupBy("i", "c", "g")
            .agg(F.count("*").alias("n"))
            .groupBy("i")
            # sum(n) per level = |gt-joined nodes|, so n_pairs rides this
            # aggregation instead of a separate j.count() job
            .agg(comb2(F.col("n")).alias("sum_ij"), F.sum("n").alias("n_nodes"))
        )
        ai = (
            lv.groupBy("i", "c")
            .agg(F.count("*").alias("n"))
            .groupBy("i")
            .agg(comb2(F.col("n")).alias("a_i"))
        )
        bj = (
            lv.groupBy("i", "g")
            .agg(F.count("*").alias("n"))
            .groupBy("i")
            .agg(comb2(F.col("n")).alias("b_j"))
        )
        ari_rows = nij.join(ai, "i").join(bj, "i").collect()
        ari_by_level = {}
        for r in ari_rows:
            n_pairs = r["n_nodes"] * (r["n_nodes"] - 1) / 2
            expected = r["a_i"] * r["b_j"] / n_pairs if n_pairs else 0.0
            max_index = (r["a_i"] + r["b_j"]) / 2.0
            ari_by_level[r["i"]] = (
                1.0
                if max_index == expected
                else (r["sum_ij"] - expected) / (max_index - expected)
            )
    finally:
        # W unpersists on every exit path — a raise inside the modularity /
        # ARI jobs must not leak the cached wide label table (ADVICE r3)
        if W is not None:
            W.unpersist()
        e.unpersist()
    k = len(asc)
    rows = [
        (
            float(cutoff_range[jj]),
            float(q_by_level.get(k - 1 - jj, 0.0)),
            float(ari_by_level.get(k - 1 - jj, 0.0)),
        )
        for jj in range(k)
    ]
    return spark.createDataFrame(rows, "cutoff double, modularity double, ari double")


def ricci_community_all_possible_clusterings(
    edges: DataFrame,
    cutoff_step: float = 0.025,
    drop_threshold: float = 0.01,
    flow_kwargs: dict | None = None,
) -> list[tuple[float, DataFrame]]:
    """All (cutoff, clustering) guesses, large cut -> small
    (reference OllivierRicci.py:848-894). ``edges`` may be a pre-flowed
    table (has ``original_rc``) or a raw one — then flow runs first with the
    reference's defaults (10 iterations, OllivierRicci.py:769)."""
    if "original_rc" not in edges.columns:
        edges = ricci_flow(
            canonicalize(prepare_edges(edges)), iterations=10, **(flow_kwargs or {})
        )
    cuts = rf_metric_cutoffs(edges, cutoff_step=cutoff_step, drop_threshold=drop_threshold)
    assert cuts, "No cutoff point found!"
    all_nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # same fused sweep over just the good cutoffs (ascending), then read
    # each clustering as a column of the wide label table
    asc = sorted(float(c) for c in cuts)
    W, cols = _components_sweep(edges, asc, vertices=all_nodes)
    W = W.cache()
    W.count()
    out = []
    for cut, col in zip(asc[::-1], cols[::-1]):
        out.append((cut, W.select("node", F.col(col).alias("component"))))
    return out


def ricci_community(
    edges: DataFrame,
    cutoff_step: float = 0.025,
    drop_threshold: float = 0.01,
    flow_kwargs: dict | None = None,
) -> tuple[float, DataFrame]:
    """Best (cutoff, clustering) = the last guess (reference :840-846)."""
    cc = ricci_community_all_possible_clusterings(
        edges, cutoff_step=cutoff_step, drop_threshold=drop_threshold, flow_kwargs=flow_kwargs
    )
    assert cc, "No clustering found!"
    return cc[-1]
