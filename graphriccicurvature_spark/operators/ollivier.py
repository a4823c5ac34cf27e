"""Ollivier-Ricci curvature over an edge DataFrame.

Spark-first re-expression of reference OllivierRicci.py:355-521. Two
physical strategies, same math (functions/localgraph.py kernels):

- ``mode="component"`` — exact: edges are grouped by connected component and
  each component block is solved in one Arrow batch with exact global
  all-pairs distances. Reproduces the reference's APSP-based numbers
  (OllivierRicci.py:157-158) bit-for-bit; parity/fixture path. Distributed
  across components; bounded by the largest component's size.
- ``mode="ego"`` — web-scale: 2-hop ego-net gather via self-joins on the
  edge table. Eval edges are *CSR-blocked by source vertex* (all eval edges
  of one src chunk share one block) and blocks are assigned to partitions;
  each partition's DISTINCT member set then demands every adjacency row
  ONCE per partition, and blocks meet their members' adjacency in a
  cogrouped ``applyInArrow`` call (round 3 — replaces the round-2
  explode-join-collect_list gather, whose per-block adjacency join pushed
  ~90x the adjacency bytes through an ObjectHashAggregate and burned ~27%
  of the box JVM-side during the solve). Distances are computed inside
  the per-edge induced member subgraph. Every source/target-neighbor arc is
  injected explicitly from the already-gathered support weights and
  (undirected) the local matrix is symmetrized, so support-to-support
  distances are always finite even when hub adjacency is truncated at
  ``nbr_topk``; they can only over-estimate global distances when a
  shortcut routes outside the 1-hop union — the documented scale-mode
  approximation (SURVEY.md §4.3, §7).

Both strategies dispatch OTD (exact EMD) / Sinkhorn by support size exactly
like the reference's OTDSinkhornMix (OllivierRicci.py:334-341); exact-OT
and Sinkhorn solves are both deferred and solved batched per Arrow record
batch (one native EMD call / one vectorized Sinkhorn fixed point).
"""

from __future__ import annotations

import math
import os
import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..functions.localgraph import (
    EPSILON,
    OTD_SINKHORN_THRESHOLD,
    apsp,
    component_curvature,
    node_distribution,
    solve_emd_batch,
)
from ..functions.sinkhorn import sinkhorn_cost_batch
from ..sources.edges import canonicalize, prepare_edges, symmetrize

try:  # native ego-partition kernel (compiled at import; see emd_native)
    from ..functions import emd_native as _emd_native

    _EGO_NATIVE = _emd_native.available() and hasattr(
        _emd_native, "ego_solve_batch_native"
    )
except Exception:  # pragma: no cover
    _emd_native = None
    _EGO_NATIVE = False
from .components import connected_components
from .degrees import degree_table

_RESULT_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("ricci_curvature", DoubleType()),
    ]
)

# eval edges of one src are gathered in chunks of at most this many edges:
# bounds the Arrow row size for hub sources while still amortizing the
# member-adjacency shipping across the chunk.
BLOCK_MAX_EDGES = 32


def ricci_curvature_edges(
    edges: DataFrame,
    *,
    directed: bool = False,
    alpha: float = 0.5,
    method: str = "OTDSinkhornMix",
    base: float = math.e,
    exp_power: float = 2.0,
    nbr_topk: int = 3000,
    mode: str = "component",
    edge_list: DataFrame | None = None,
    sinkhorn_reg: float = 1e-1,
    components: DataFrame | None = None,
    salt: int | None = None,
    cache_registry: list | None = None,
    otd_sinkhorn_threshold: int = OTD_SINKHORN_THRESHOLD,
    component_size_limit: int | None = 10_000,
    ego_native: bool = True,
    skeleton: dict | None = None,
) -> DataFrame:
    """Returns ``(src, dst, ricci_curvature)`` for the requested edges.

    ``edge_list`` (optional ``src``/``dst`` DataFrame) restricts evaluation
    like reference OllivierRicci.py:451-454 while the whole graph still
    defines distributions and distances; for undirected graphs it is
    canonicalized first, so either endpoint orientation matches (the
    reference accepts NetworkX edges in any orientation). ``components``
    (node, component) may be supplied to skip the CC pass when the caller
    already has it (e.g. the Ricci-flow loop, whose topology is
    round-invariant). ``salt`` (ego mode) replicates adjacency rows across
    that many salt buckets for the member-gather join — explicit skew
    handling for power-law web graphs on top of AQE's runtime skew-join
    splitting. ``cache_registry`` (ego mode): a caller-provided list the
    operator appends its cached intermediate DataFrames to; iterative
    callers (the flow loop) unpersist them after materializing each round
    so executor storage doesn't accumulate across rounds.

    ``component_size_limit`` guards ``mode="component"``: that mode gathers
    each whole component into ONE task and runs O(n^3) APSP on it, so a
    user pointing it at a web-scale graph would silently plan one giant
    straggler task. When the largest component exceeds the limit the call
    auto-switches to ``mode="ego"`` (the scale path) with a warning; pass
    ``None`` to disable (e.g. exact-parity runs on graphs you know).
    The check reuses the CC pass component mode needs anyway and is
    skipped when the caller supplies ``components`` (iterative callers —
    the flow loop — validate once and reuse the table every round).

    ``skeleton`` (ego mode, iterative callers): a caller-owned dict holding
    the gather's ROUND-INVARIANT structure so repeat calls on the same
    topology (the Ricci-flow loop — only ``weight`` changes between rounds)
    skip rebuilding it. Valid ONLY while neighbor sets are invariant, i.e.
    the caller verified ``max degree <= nbr_topk`` and set
    ``skeleton["skip_cap"] = True`` (the adjacency top-k window then also
    never binds and is skipped — one less per-round sort). The dict
    accumulates: ``demand`` (the cached (partition, member) gather-demand
    table) and ``caches`` (DataFrames the caller must unpersist when the
    loop ends). An eval-edge table already carrying a ``_blk`` column
    (:func:`assign_blocks`) skips the per-round hub-chunk count join too.
    """
    assert mode in ("component", "ego")
    edges = prepare_edges(edges)
    if edge_list is not None and not directed:
        # canonical (src < dst) storage: accept either endpoint orientation
        edge_list = edge_list.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
    if mode == "component":
        if components is None and component_size_limit is not None:
            und = canonicalize(edges.select("src", "dst", "weight"))
            components = connected_components(und)
            biggest = (
                components.groupBy("component")
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
            if biggest is not None and biggest > component_size_limit:
                warnings.warn(
                    f"ricci_curvature_edges(mode='component'): largest "
                    f"component has {biggest} nodes (> component_size_limit="
                    f"{component_size_limit}); component mode solves each "
                    f"component as ONE O(n^3)-APSP task. Auto-switching to "
                    f"mode='ego' (the scale path); pass "
                    f"component_size_limit=None to force component mode.",
                    RuntimeWarning,
                )
                return _ego_mode(
                    edges, directed, alpha, method, base, exp_power, nbr_topk,
                    edge_list, sinkhorn_reg, salt, cache_registry,
                    otd_sinkhorn_threshold, ego_native, skeleton,
                )
        return _component_mode(
            edges, directed, alpha, method, base, exp_power, nbr_topk, edge_list, sinkhorn_reg,
            components, otd_sinkhorn_threshold,
        )
    return _ego_mode(
        edges, directed, alpha, method, base, exp_power, nbr_topk, edge_list, sinkhorn_reg,
        salt, cache_registry, otd_sinkhorn_threshold, ego_native, skeleton,
    )


# --------------------------------------------------------------------------
# component (exact / parity) mode
# --------------------------------------------------------------------------


def _component_mode(
    edges, directed, alpha, method, base, exp_power, nbr_topk, edge_list, sinkhorn_reg,
    components=None, otd_sinkhorn_threshold=OTD_SINKHORN_THRESHOLD,
):
    if components is not None:
        comps = components
    else:
        und = canonicalize(edges.select("src", "dst", "weight"))
        comps = connected_components(und)  # weakly-connected for directed graphs
    e = edges.join(
        comps.withColumnRenamed("node", "src"), "src"
    )
    if edge_list is not None:
        ev = edge_list.select("src", "dst").withColumn("is_eval", F.lit(True))
        e = e.join(ev, ["src", "dst"], "left").withColumn(
            "is_eval", F.coalesce("is_eval", F.lit(False))
        )
    else:
        e = e.withColumn("is_eval", F.lit(True))

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        ev = pdf[pdf["is_eval"].values]
        if len(ev) == 0:
            return pd.DataFrame({"src": [], "dst": [], "ricci_curvature": []}).astype(
                {"src": "int64", "dst": "int64", "ricci_curvature": "float64"}
            )
        k = component_curvature(
            pdf["src"].values.astype(np.int64),
            pdf["dst"].values.astype(np.int64),
            pdf["weight"].values.astype(np.float64),
            ev["src"].values.astype(np.int64),
            ev["dst"].values.astype(np.int64),
            directed=directed,
            alpha=alpha,
            method=method,
            base=base,
            exp_power=exp_power,
            nbr_topk=nbr_topk,
            sinkhorn_reg=sinkhorn_reg,
            otd_sinkhorn_threshold=otd_sinkhorn_threshold,
        )
        return pd.DataFrame(
            {"src": ev["src"].values, "dst": ev["dst"].values, "ricci_curvature": k}
        )

    return e.groupBy("component").applyInPandas(solve, _RESULT_SCHEMA)


# --------------------------------------------------------------------------
# ego (scale) mode — CSR-blocked per-src gather
# --------------------------------------------------------------------------


def _adjacency(
    sym_or_directed: DataFrame, key: str, other: str, name: str, cap: int | None = None
) -> DataFrame:
    """Adjacency arrays grouped by ``key`` (one shuffle, map-side combine).

    ``cap`` bounds array length for power-law hub vertices: the ``cap``
    *smallest-weight* (= nearest, = highest transformed mass for exp_power>0)
    neighbors are kept, matching the reference's top-k heap tie-break
    (largest node id wins, OllivierRicci.py:89-92). Capping both the support
    and the gathered member adjacency keeps the per-edge ego block O(k^2)
    regardless of hub degree — without it a degree-10^6 vertex would ship
    its whole neighbor list once per incident edge.
    """
    if cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(key).orderBy(F.asc("weight"), F.desc(other))
        sym_or_directed = (
            sym_or_directed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn")
        )
    return (
        sym_or_directed.groupBy(F.col(key).alias("node"))
        .agg(
            F.collect_list(F.col(other)).alias(f"{name}_nbrs"),
            F.collect_list("weight").alias(f"{name}_ws"),
        )
    )


def _empty_l():
    return F.array().cast("array<bigint>")


def _empty_d():
    return F.array().cast("array<double>")


def assign_blocks(ev: DataFrame) -> DataFrame:
    """Chunk hub sources: at most BLOCK_MAX_EDGES eval edges per gathered
    block, so one mega-hub cannot produce an unbounded Arrow row. The
    assignment depends only on topology (per-src counts + dst hash), so
    iterative callers compute it ONCE and carry ``_blk`` through rounds."""
    cnt = ev.groupBy("src").agg(F.count("*").alias("_nev"))
    return ev.join(cnt, "src").withColumn(
        "_blk",
        F.pmod(
            F.xxhash64("dst"),
            F.greatest(F.ceil(F.col("_nev") / F.lit(BLOCK_MAX_EDGES)), F.lit(1)),
        ).cast("int"),
    ).drop("_nev")


_PID_LUT_CACHE: dict = {}


def _balanced_pid_values(spark, n_part: int) -> list:
    """Longs v[0..n_part) with ``pmod(hash(v[b]), n_part) == b`` — i.e. a
    perfect inverse of Spark's HashPartitioning for this partition count.

    Partitioning a column whose domain is exactly [0, n_part) re-hashes
    those n_part values into n_part buckets, which leaves ~1/e of the
    buckets empty and doubles up others (birthday collisions) — a ~25%
    balance loss on every solve stage. Using values that provably land in
    distinct buckets restores one group per partition. Computed with
    ``F.hash`` (the same Murmur3Hash expression HashPartitioning applies)
    in one tiny driver job of 64*n_part candidate longs, cached per
    (SparkSession, n_part).
    """
    key = (id(spark), n_part)
    lut = _PID_LUT_CACHE.get(key)
    if lut is None:
        rows = (
            spark.range(0, 64 * n_part)
            # candidates MUST be hashed at the exact type the _pid column
            # carries (int): murmur3 hashes a 4-byte int and an 8-byte
            # long differently, so a LUT built on longs is not a bijection
            # for an int partition column
            .select(
                F.col("id").cast("int").alias("id"),
                F.pmod(F.hash(F.col("id").cast("int")), F.lit(n_part)).alias("b"),
            )
            .groupBy("b")
            .agg(F.min("id").alias("id"))
            .collect()
        )
        lut = list(range(n_part))  # fallback for any unhit bucket (~p<1e-28)
        for r in rows:
            lut[r["b"]] = int(r["id"])
        _PID_LUT_CACHE[key] = lut
    return lut


def _ego_mode(
    edges, directed, alpha, method, base, exp_power, nbr_topk, edge_list, sinkhorn_reg,
    salt=None, cache_registry=None, otd_sinkhorn_threshold=OTD_SINKHORN_THRESHOLD,
    ego_native=True, skeleton=None,
):
    if skeleton is not None and not skeleton.get("skip_cap"):
        # without the verified degree bound, neighbor SETS may change as
        # weights evolve (the top-k cap binds) — structure is not reusable
        skeleton = None
    if directed:
        out_view = edges.select("src", "dst", "weight")
    else:
        out_view = symmetrize(canonicalize(edges))
    out_view = out_view.cache()
    # out-adjacency defines both successor distributions and directed
    # shortest paths; predecessor adjacency only needed for directed graphs.
    # Arrays capped at nbr_topk: exactly the reference's support truncation
    # (OllivierRicci.py:89-92) for distributions, and the documented
    # ego-distance approximation for hub vertices at scale.
    # skeleton["skip_cap"]: the caller verified max degree <= nbr_topk, so
    # the top-k window never binds — skip its per-round full sort of the
    # symmetrized edge view (array order changes; values are order-invariant
    # modulo FP summation ulps)
    cap = None if (skeleton or {}).get("skip_cap") else nbr_topk
    adj_out = _adjacency(out_view, "src", "dst", "out", cap=cap).cache()
    adj_in = (
        _adjacency(out_view, "dst", "src", "in", cap=cap).cache()
        if directed
        else None
    )
    if cache_registry is not None:
        cache_registry.append(out_view)
        cache_registry.append(adj_out)
        if adj_in is not None:
            cache_registry.append(adj_in)

    has_blk = "_blk" in edges.columns
    ev = edges.select("src", "dst", "weight", *(["_blk"] if has_blk else []))
    if edge_list is not None:
        ev = ev.join(edge_list.select("src", "dst"), ["src", "dst"], "left_semi")
    if not has_blk:
        ev = assign_blocks(ev)
    # explicit numbered repartition BEFORE the adjacency joins: the edge
    # list is tiny in bytes (AQE would coalesce it to ~1 task) but the
    # broadcast adjacency joins inflate each row by O(deg) — without this a
    # single task would serialize the whole gather. The (src, _blk) hash
    # partitioning is the grouping/join key of every downstream stage, so
    # no further shuffle of the fat arrays is needed.
    spark = edges.sparkSession
    # scale-adaptive gather parallelism (guide §2): the gather/solve stages
    # run at n_part tasks, and each task pays a python-worker Arrow round
    # trip, so a constant tuned for the dense bench graph (4x parallelism =
    # 128 on local[32]) quadruples the per-call fixed cost on small inputs.
    # Derive n_part from the eval-edge count (one cheap count job — the
    # callers' edge tables are cached or checkpointed; iterative callers
    # reuse the count via the skeleton), clamped to [defaultParallelism,
    # the old 4x cap] so every core still gets a task and the
    # scaling-sandwich legs keep their pinned partition count. Override
    # knobs: GRC_EGO_NPART (absolute), GRC_EGO_EDGES_PER_PART (target
    # edges/task, default 2048 — sized so the per-task Arrow/solve setup is
    # amortized while partitions stay well under Arrow batch limits).
    cap_part = max(
        spark.sparkContext.defaultParallelism * 4,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    if os.environ.get("GRC_EGO_NPART"):
        n_part = int(os.environ["GRC_EGO_NPART"])
    else:
        target = int(os.environ.get("GRC_EGO_EDGES_PER_PART", "2048"))
        n_ev = (skeleton or {}).get("n_ev")
        if n_ev is None:
            n_ev = ev.count()
            if skeleton is not None:
                skeleton["n_ev"] = n_ev
        n_part = min(
            max(spark.sparkContext.defaultParallelism, -(-n_ev // target)),
            cap_part,
        )
    ev = ev.repartition(n_part, "src", "_blk")

    # target-side adjacency at edge granularity, then fold per (src, _blk):
    # each target row carries its own support arrays
    evt = ev.join(
        adj_out.select(
            F.col("node").alias("dst"),
            F.col("out_nbrs").alias("t_nbrs"),
            F.col("out_ws").alias("t_ws"),
        ),
        "dst",
        "left",
    )
    blocks = evt.groupBy("src", "_blk").agg(
        F.collect_list(
            F.struct(
                F.col("dst").alias("dst"),
                F.col("weight").alias("weight"),
                F.coalesce("t_nbrs", _empty_l()).alias("t_nbrs"),
                F.coalesce("t_ws", _empty_d()).alias("t_ws"),
            )
        ).alias("targets")
    )
    # source-side support ships once per block (was: once per edge)
    src_adj = adj_in if directed else adj_out
    pre = "in" if directed else "out"
    e1 = blocks.join(
        src_adj.select(
            F.col("node").alias("src"),
            F.col(f"{pre}_nbrs").alias("s_nbrs"),
            F.col(f"{pre}_ws").alias("s_ws"),
        ),
        "src",
        "left",
    ).select(
        "src", "_blk", "targets",
        F.coalesce("s_nbrs", _empty_l()).alias("s_nbrs"),
        F.coalesce("s_ws", _empty_d()).alias("s_ws"),
    )
    # --- cogrouped member-adjacency delivery (round 3) ---------------------
    # Round 2 exploded one row per (block, member), joined the fat adjacency
    # arrays onto all ~members-per-block of them and collect_list'ed the
    # result back into a nested per-block column: on the dense bench graph
    # that pushes ~90x the adjacency bytes through the join + an
    # ObjectHashAggregate, and the JVM side burned ~27% of the box during
    # the solve (measured, scripts/measure_scaling_phases.py). Instead,
    # blocks are assigned a partition id and each partition's DISTINCT
    # member set demands every adjacency row ONCE per partition; the blocks
    # and the demanded adjacency meet in a cogrouped Arrow call, and the
    # kernel resolves members against the partition-level CSR. Fat bytes
    # shuffled drop by the blocks-per-partition sharing factor, and the
    # collect_list materialization disappears entirely.
    # _pid values are RELABELED through a hash-bijection LUT: the naive
    # pmod(xxhash64, n_part) in [0, n_part) goes through Spark's murmur3
    # again at the repartition/cogroup exchange, and n_part values hashed
    # into n_part buckets collide like birthday balls — measured on the
    # dense bench graph at n_part=16: 6 empty partitions, 6 double-loaded,
    # solve-stage balance efficiency 75% (max task 2.26x mean). The LUT
    # maps logical pid b to a long that Spark's HashPartitioning provably
    # sends to bucket b (computed by Spark itself, so it tracks whatever
    # hash the engine uses), restoring exact 1-group-per-partition balance
    # with zero extra shuffle and unchanged demand-dedup granularity.
    _lut = F.array(*[F.lit(v) for v in _balanced_pid_values(spark, n_part)])

    def _pid_expr():
        b = F.pmod(F.xxhash64("src", "_blk"), F.lit(n_part)).cast("int")
        return F.element_at(_lut, b + 1).cast("int")

    e1 = e1.withColumn("_pid", _pid_expr())
    # the demand branch recomputes _pid from (src, _blk) rather than reusing
    # e1's column: the cogroup below would otherwise see the same attribute
    # on both sides of a self-referencing lineage (ambiguous-column error)
    if skeleton is not None and "demand" in skeleton:
        # round-invariant (neighbor sets fixed while skip_cap holds): reuse
        # the cached (partition, member) table — skips the explode +
        # array_distinct + distinct shuffle every flow round
        demand = skeleton["demand"]
    else:
        demand = (
            e1.select(
                "src",
                "_blk",
                F.explode(
                    F.array_distinct(
                        F.concat(
                            F.array("src"),
                            F.col("s_nbrs"),
                            F.flatten(
                                F.transform(
                                    "targets",
                                    lambda t: F.concat(F.array(t["dst"]), t["t_nbrs"]),
                                )
                            ),
                        )
                    )
                ).alias("member"),
            )
            .select(_pid_expr().alias("_pid"), "member")
            .distinct()
        )
        if skeleton is not None:
            # cache the distinct output as-is: the member join below
            # re-shuffles by member every round regardless
            demand = demand.cache()
            skeleton["demand"] = demand
            skeleton.setdefault("caches", []).append(demand)
    adj_member = adj_out.select(
        F.col("node").alias("member"),
        F.col("out_nbrs").alias("m_nbrs"),
        F.col("out_ws").alias("m_ws"),
    )
    if salt and salt > 1:
        # explicit hub-skew salting: replicate each adjacency row across
        # `salt` buckets; each (partition, member) demand lands in one
        # bucket (demand is already capped at n_part rows per member, so
        # this is a belt-and-suspenders knob for extreme hubs)
        adj_member = adj_member.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        )
        demand = demand.withColumn(
            "_salt", F.pmod(F.xxhash64("_pid", "member"), F.lit(salt)).cast("int")
        )
        adj_need = demand.join(adj_member, ["member", "_salt"]).drop("_salt")
    else:
        adj_need = demand.join(adj_member, "member")
    adj_need = adj_need.select("_pid", "member", "m_nbrs", "m_ws")

    params = dict(
        directed=directed,
        alpha=alpha,
        method=method,
        base=base,
        exp_power=exp_power,
        nbr_topk=nbr_topk,
        sinkhorn_reg=sinkhorn_reg,
        otd_sinkhorn_threshold=otd_sinkhorn_threshold,
        ego_native=ego_native,
    )

    def solve(left, right):
        return _solve_ego_cogroup(left, right, **params)

    # cogrouped applyInArrow: each partition's blocks meet its deduplicated
    # member adjacency as flat Arrow buffers — no per-row python object
    # materialization, no nested collect_list on the JVM side. Both sides
    # are explicitly repartitioned by _pid at n_part FIRST: the cogroup's
    # own exchange would otherwise run at spark.sql.shuffle.partitions
    # (often ~#cores), materializing and sorting GB-sized partitions; with
    # the numbered repartition the cogroup reuses the n_part partitioning
    # (no extra exchange) and each sort handles ~one pid of data.
    left = e1.select("src", "_blk", "_pid", "targets", "s_nbrs", "s_ws").repartition(
        n_part, "_pid"
    )
    right = adj_need.repartition(n_part, "_pid")
    return (
        left.groupby("_pid")
        .cogroup(right.groupby("_pid"))
        .applyInArrow(solve, _RESULT_SCHEMA)
    )


def _flat_list(col):
    """(offsets, values) numpy views of an Arrow list column (absolute offsets)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = col.offsets.to_numpy()
    return off, col.values


def _gather_rows(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat indices selecting variable-length rows [starts, starts+lens)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lens)
    return np.repeat(starts, lens) + (np.arange(total) - np.repeat(ends - lens, lens))


def _clamp_nonfinite(d: np.ndarray, fallback: float) -> np.ndarray:
    """Replace non-finite distances before OT (warn; should not occur —
    support arcs are injected explicitly, so support-to-support paths exist
    through s-t by construction). Keeps one poisoned entry from turning a
    whole edge (and downstream flow/community rounds) into NaN."""
    bad = ~np.isfinite(d)
    if bad.any():
        warnings.warn(
            "non-finite local distance in ego block; clamping to max finite",
            RuntimeWarning,
        )
        finite = d[~bad]
        d = d.copy()
        d[bad] = finite.max() if finite.size else fallback
    return d


def _solve_ego_cogroup(
    left,
    right,
    *,
    directed: bool,
    alpha: float,
    method: str,
    base: float,
    exp_power: float,
    nbr_topk: int,
    sinkhorn_reg: float,
    otd_sinkhorn_threshold: int = OTD_SINKHORN_THRESHOLD,
    ego_native: bool = True,
):
    """Per-partition cogrouped ego solve on flat Arrow buffers.

    ``left`` is one partition's blocks (src, _blk, _pid, targets, s_nbrs,
    s_ws); ``right`` is that partition's DISTINCT member adjacency
    (member, m_nbrs, m_ws) — each member's arrays present once per
    partition instead of once per block. The member rows form a
    partition-level CSR; per eval edge the local dense weight matrix is
    sliced out of it with vectorized searchsorted scatter, source/target
    support arcs are injected from the gathered support weights,
    (undirected) the matrix is symmetrized, distances via native
    Floyd-Warshall, and all exact-OT / Sinkhorn problems of the partition
    go out in ONE batched call each.
    """
    import pyarrow as pa

    n_rows = left.num_rows
    if n_rows == 0:
        return pa.table(
            {
                "src": pa.array([], type=pa.int64()),
                "dst": pa.array([], type=pa.int64()),
                "ricci_curvature": pa.array([], type=pa.float64()),
            }
        )
    src = left.column("src").to_numpy()

    # targets: list<struct<dst, weight, t_nbrs, t_ws>>
    tcol = left.column("targets")
    if isinstance(tcol, pa.ChunkedArray):
        tcol = tcol.combine_chunks()
    t_off = tcol.offsets.to_numpy()
    t_struct = tcol.values
    t_dst = t_struct.field("dst").to_numpy()
    t_w = t_struct.field("weight").to_numpy()
    tn_off, tn_vals_arr = _flat_list(t_struct.field("t_nbrs"))
    tn_vals = tn_vals_arr.to_numpy()
    tw_off, tw_vals_arr = _flat_list(t_struct.field("t_ws"))
    tw_vals = tw_vals_arr.to_numpy()

    s_off, s_vals_arr = _flat_list(left.column("s_nbrs"))
    s_vals = s_vals_arr.to_numpy()
    sw_off, sw_vals_arr = _flat_list(left.column("s_ws"))
    sw_vals = sw_vals_arr.to_numpy()

    # partition-level CSR: sorted member ids -> adjacency row bounds
    mem = right.column("member").to_numpy() if right.num_rows else np.empty(0, np.int64)
    if right.num_rows:
        nb_off, nb_vals_arr = _flat_list(right.column("m_nbrs"))
        nb_vals = nb_vals_arr.to_numpy()
        ws_off, ws_vals_arr = _flat_list(right.column("m_ws"))
        ws_vals = ws_vals_arr.to_numpy()
    else:  # a partition whose members all lack out-adjacency (directed sinks)
        nb_off = np.zeros(1, dtype=np.int64)
        nb_vals = np.empty(0, dtype=np.int64)
        ws_off = np.zeros(1, dtype=np.int64)
        ws_vals = np.empty(0, dtype=np.float64)
    order = np.argsort(mem, kind="stable")
    sm = mem[order]
    row_start = nb_off[:-1][order] if len(mem) else np.empty(0, np.int64)
    row_len = (nb_off[1:] - nb_off[:-1])[order] if len(mem) else np.empty(0, np.int64)
    wrow_start = ws_off[:-1][order] if len(mem) else np.empty(0, np.int64)

    if (
        ego_native
        and _EGO_NATIVE
        and os.environ.get("GRC_EGO_NATIVE", "1") != "0"
        and method in ("OTD", "ATD", "Sinkhorn", "OTDSinkhornMix")
        # flat-buffer layout assumption (always true for fresh combined
        # chunks; fall back to the numpy loop on sliced offsets)
        and t_off[0] == 0
        and t_off[-1] == len(t_dst)
    ):
        # ---- native fast path: the whole per-edge loop (member LUT, W
        # fill, support-arc injection, FW, distributions, exact OT) runs in
        # ONE C call per cogroup partition; only Sinkhorn-routed problems
        # come back for the python batched solver. Routing is decided here
        # (it depends only on support sizes + method) so exact-size flat
        # buffers can be preallocated. Values match the numpy loop below
        # to ~1e-12 (same FW/EMD code; pow() ulp differences only) —
        # tests/test_round4_native.py. Disable with GRC_EGO_NATIVE=0.
        n_edges = len(t_dst)
        e_cnt = t_off[1:] - t_off[:-1]
        slen_e = np.repeat(s_off[1:] - s_off[:-1], e_cnt)
        tlen_e = tn_off[1:] - tn_off[:-1]
        m_sup = np.where(slen_e == 0, 1, np.minimum(slen_e, nbr_topk) + 1)
        n_sup = np.where(tlen_e == 0, 1, np.minimum(tlen_e, nbr_topk) + 1)
        if method == "Sinkhorn":
            skm_mask = np.ones(n_edges, dtype=bool)
        elif method == "OTDSinkhornMix":
            skm_mask = (m_sup > otd_sinkhorn_threshold) & (
                n_sup > otd_sinkhorn_threshold
            )
        else:
            skm_mask = np.zeros(n_edges, dtype=bool)
        t_w64 = t_w.astype(np.float64, copy=False)
        skm_mask &= t_w64 >= EPSILON
        sk_slot = np.full(n_edges, -1, dtype=np.int64)
        n_def = int(skm_mask.sum())
        sk_slot[skm_mask] = np.arange(n_def)
        skm = m_sup[skm_mask]
        skn = n_sup[skm_mask]
        skx_off = np.concatenate(([0], np.cumsum(skm))).astype(np.int64)
        sky_off = np.concatenate(([0], np.cumsum(skn))).astype(np.int64)
        skd_off = np.concatenate(([0], np.cumsum(skm * skn))).astype(np.int64)
        kappa, skx, sky, skd, n_clamped = _emd_native.ego_solve_batch_native(
            src=src,
            s_off=s_off,
            s_vals=s_vals,
            sw_off=sw_off,
            sw_vals=sw_vals,
            t_off=t_off,
            t_dst=t_dst,
            t_w=t_w64,
            tn_off=tn_off,
            tn_vals=tn_vals,
            tw_off=tw_off,
            tw_vals=tw_vals,
            sm=sm,
            row_start=row_start,
            row_len=row_len,
            wrow_start=wrow_start,
            nb_vals=nb_vals,
            ws_vals=ws_vals,
            directed=directed,
            method=method,
            alpha=alpha,
            base=base,
            exp_power=exp_power,
            nbr_topk=nbr_topk,
            route=skm_mask,
            sk_slot=sk_slot,
            skx_off=skx_off,
            sky_off=sky_off,
            skd_off=skd_off,
        )
        if n_clamped:
            warnings.warn(
                f"non-finite local distance in {n_clamped} ego-block entries; "
                "clamped to max finite",
                RuntimeWarning,
            )
        if n_def:
            xs_l = [skx[skx_off[i] : skx_off[i + 1]] for i in range(n_def)]
            ys_l = [sky[sky_off[i] : sky_off[i + 1]] for i in range(n_def)]
            ds_l = [
                skd[skd_off[i] : skd_off[i + 1]].reshape(skm[i], skn[i])
                for i in range(n_def)
            ]
            ms = sinkhorn_cost_batch(xs_l, ys_l, ds_l, reg=sinkhorn_reg)
            kappa[skm_mask] = 1.0 - ms / t_w64[skm_mask]
        return pa.table(
            {
                "src": pa.array(np.repeat(src, e_cnt)),
                "dst": pa.array(t_dst.astype(np.int64, copy=False)),
                "ricci_curvature": pa.array(kappa),
            }
        )

    n_edges = len(t_dst)
    out_src = np.empty(n_edges, dtype=np.int64)
    out_dst = t_dst.astype(np.int64, copy=True)
    out_w = t_w.astype(np.float64, copy=True)
    out = np.zeros(n_edges, dtype=np.float64)
    emd_idx: list[int] = []
    emd_x: list[np.ndarray] = []
    emd_y: list[np.ndarray] = []
    emd_d: list[np.ndarray] = []
    sk_idx: list[int] = []
    sk_x: list[np.ndarray] = []
    sk_y: list[np.ndarray] = []
    sk_d: list[np.ndarray] = []

    for r in range(n_rows):
        s_nb = s_vals[s_off[r] : s_off[r + 1]]
        s_w = sw_vals[sw_off[r] : sw_off[r + 1]]
        s_id = src[r]

        # compact block-local CSR: gather every member row this block can
        # touch ONCE from the partition buffers (cold, tens of MB) into a
        # contiguous ~L2-resident buffer; the per-edge loop then gathers
        # from the compact copy. Without this, every edge re-reads ~its ego
        # net from random partition-buffer offsets — measured +35% python
        # CPU from cache misses on the dense bench graph.
        k0, k1 = int(t_off[r]), int(t_off[r + 1])
        t_all = tn_vals[tn_off[k0] : tn_off[k1]]
        bm = np.unique(
            np.concatenate((np.array([s_id]), s_nb, t_dst[k0:k1], t_all))
        )
        nbm = len(bm)
        if len(sm):
            pos = np.searchsorted(sm, bm)
            pos_c = np.minimum(pos, len(sm) - 1)
            found = sm[pos_c] == bm
            starts = np.where(found, row_start[pos_c], 0)
            lens = np.where(found, row_len[pos_c], 0)
            wstarts = np.where(found, wrow_start[pos_c], 0)
        else:
            starts = np.zeros(nbm, dtype=np.int64)
            lens = starts
            wstarts = starts
        flat_b = _gather_rows(starts, lens)
        nb_blk = nb_vals[flat_b]
        ws_blk = ws_vals[flat_b + np.repeat(wstarts - starts, lens)]
        # compact row offsets: member bm[i] owns nb_blk[blk_off[i]:blk_off[i+1]]
        blk_off = np.concatenate(([0], np.cumsum(lens)))

        for k in range(k0, k1):
            out_src[k] = s_id
            w_st = float(t_w[k])
            if w_st < EPSILON:  # reference :316-320
                out[k] = 0.0
                continue
            t_id = t_dst[k]
            t_nb = tn_vals[tn_off[k] : tn_off[k + 1]]
            t_wk = tw_vals[tw_off[k] : tw_off[k + 1]]

            # per-edge member set: {s, t} + both supports (sorted unique)
            em = np.unique(np.concatenate((np.array([s_id, t_id]), s_nb, t_nb)))
            n = len(em)
            # index permutation putting s and t LAST: they are the only
            # connectors between the two neighborhoods, so with them last
            # Floyd-Warshall's dik==inf row-skip makes the first n-2
            # k-iterations nearly free and the whole APSP collapses into
            # the final two passes (~4x measured on deg-64 blocks)
            si_s = int(np.searchsorted(em, s_id))
            ti_s = int(np.searchsorted(em, t_id))
            perm = np.empty(n, dtype=np.int64)
            pmask = np.ones(n, dtype=bool)
            pmask[si_s] = False
            pmask[ti_s] = False
            perm[pmask] = np.arange(n - 2)
            perm[si_s] = n - 2
            perm[ti_s] = n - 1
            # em ⊆ bm by construction; a member absent from the adjacency
            # table (directed sink) has an empty compact row
            bi = np.searchsorted(bm, em)
            starts_e = blk_off[bi]
            lens_e = blk_off[bi + 1] - starts_e
            flat = _gather_rows(starts_e, lens_e)
            nbr_block = nb_blk[flat]
            w_block = ws_blk[flat]
            local_rows = np.repeat(perm, lens_e)
            posn = np.searchsorted(em, nbr_block)
            posn_c = np.minimum(posn, n - 1)
            valid = em[posn_c] == nbr_block
            W = np.full((n, n), np.inf)
            np.minimum.at(W, (local_rows[valid], perm[posn_c[valid]]), w_block[valid])

            si = n - 2
            ti = n - 1
            s_idx = perm[np.searchsorted(em, s_nb)]
            t_idx = perm[np.searchsorted(em, t_nb)]
            # inject support arcs from the gathered weights: a hub member's
            # truncated adjacency can miss its arc back into the block, but
            # the s/t-side weight is already known exactly
            if directed:
                # s_nb are predecessors (u -> s), t_nb successors (t -> v)
                np.minimum.at(W, (s_idx, np.full(len(s_idx), si)), s_w)
                np.minimum.at(W, (np.full(len(t_idx), ti), t_idx), t_wk)
                W[si, ti] = min(W[si, ti], w_st)
            else:
                np.minimum.at(W, (np.full(len(s_idx), si), s_idx), s_w)
                np.minimum.at(W, (np.full(len(t_idx), ti), t_idx), t_wk)
                W[si, ti] = min(W[si, ti], w_st)
                W = np.minimum(W, W.T)
            D = apsp(W)

            if method == "ATD":  # reference :257-294
                # empty neighbor set -> the node itself (the reference
                # raises ZeroDivisionError at :281; self-fallback matches
                # node_distribution's isolated-node semantics)
                a_rows = s_idx if len(s_idx) else np.array([si])
                a_cols = t_idx if len(t_idx) else np.array([ti])
                share = (1.0 - alpha) / (len(a_rows) * len(a_cols))
                dsub = _clamp_nonfinite(D[np.ix_(a_rows, a_cols)], w_st)
                m = alpha * D[si, ti] + share * dsub.sum()
                out[k] = 1.0 - m / w_st  # reference :344
            else:
                x, xs = node_distribution(si, s_idx, s_w, alpha, base, exp_power, nbr_topk)
                y, ys = node_distribution(ti, t_idx, t_wk, alpha, base, exp_power, nbr_topk)
                d = _clamp_nonfinite(D[np.ix_(xs, ys)], w_st)
                if method == "Sinkhorn" or (
                    method == "OTDSinkhornMix"
                    and len(x) > otd_sinkhorn_threshold
                    and len(y) > otd_sinkhorn_threshold
                ):  # deferred — batched Sinkhorn per cogroup call (north star)
                    sk_idx.append(k)
                    sk_x.append(x)
                    sk_y.append(y)
                    sk_d.append(d)
                else:  # deferred — batched exact OT per cogroup call
                    emd_idx.append(k)
                    emd_x.append(x)
                    emd_y.append(y)
                    emd_d.append(d)
    if emd_idx:
        ms = solve_emd_batch(emd_x, emd_y, emd_d)
        idx = np.asarray(emd_idx, dtype=np.int64)
        out[idx] = 1.0 - ms / out_w[idx]
    if sk_idx:
        ms = sinkhorn_cost_batch(sk_x, sk_y, sk_d, reg=sinkhorn_reg)
        idx = np.asarray(sk_idx, dtype=np.int64)
        out[idx] = 1.0 - ms / out_w[idx]
    return pa.table(
        {
            "src": pa.array(out_src),
            "dst": pa.array(out_dst),
            "ricci_curvature": pa.array(out),
        }
    )


# --------------------------------------------------------------------------
# node aggregation (reference OllivierRicci.py:510-519)
# --------------------------------------------------------------------------


def node_curvature(
    edges: DataFrame,
    edge_curvature: DataFrame,
    directed: bool = False,
    curv_col: str = "ricci_curvature",
    out_col: str | None = None,
) -> DataFrame:
    """Node curvature = sum of incident computed-edge curvatures / degree.

    Replicates the reference exactly, including the divide-by-full-degree
    semantics on partial edge lists and, for directed graphs, summing only
    out-edge curvatures while dividing by total (in+out) degree
    (``G.neighbors`` = successors but ``G.degree`` = in+out).
    """
    out_col = out_col or curv_col
    edges = prepare_edges(edges)
    deg = degree_table(edges if directed else canonicalize(edges), directed=directed)
    if directed:
        contrib = edge_curvature.select(F.col("src").alias("node"), F.col(curv_col).alias("k"))
    else:
        contrib = edge_curvature.select(F.col("src").alias("node"), F.col(curv_col).alias("k")).union(
            edge_curvature.select(F.col("dst").alias("node"), F.col(curv_col).alias("k"))
        )
    sums = contrib.groupBy("node").agg(F.sum("k").alias("ksum"))
    return (
        deg.join(sums, "node", "left")
        .select(
            "node",
            (F.coalesce("ksum", F.lit(0.0)) / F.col("degree")).alias(out_col),
        )
    )
