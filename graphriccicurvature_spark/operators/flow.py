"""Discrete Ricci flow (reference OllivierRicci.py:524-618), Spark-first.

Driver-side round loop over an edge DataFrame; per round:

1. ``w <- w - step * kappa * w``                        (column expression)
2. global renormalization ``w <- w * |E| / sum(w)``     (scalar agg)
3. recompute curvature                                   (ollivier operator)
4. convergence test ``max(kappa) - min(kappa) < delta``  (scalar agg)
5. optional surgery hook every ``surgery_every`` rounds  (DataFrame->DataFrame)

Round state is one edge table; lineage is truncated every round via
``localCheckpoint`` (or durable parquet rounds + metrics when
``checkpoint_dir`` is set, resumable via plans.controller.RoundCheckpoint).
"""

from __future__ import annotations

import math
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.controller import RoundCheckpoint
from ..plans.lineage import truncate_plan
from ..sources.edges import canonicalize, prepare_edges
from .components import connected_components
from .degrees import degree_table
from .ollivier import assign_blocks, ricci_curvature_edges


def _drain_caches(registry: list) -> None:
    """Unpersist per-round operator caches (ego-mode adjacency views) once
    the round's result is materialized, so executor storage does not grow
    across flow rounds."""
    for df in registry:
        try:
            df.unpersist()
        except Exception:  # pragma: no cover - defensive
            pass
    registry.clear()


def _largest_component_edges(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Restrict to the largest connected component (reference :554-556).

    Returns (restricted edges, components-of-restricted) so the flow loop can
    reuse the CC result every round (topology is round-invariant).
    """
    comps = connected_components(edges).cache()
    n_comp = comps.select("component").distinct().count()
    if n_comp <= 1:
        return edges, comps
    largest = (
        comps.groupBy("component")
        .count()
        .orderBy(F.desc("count"), F.asc("component"))
        .limit(1)
        .select("component")
    )
    keep = comps.join(F.broadcast(largest), "component").select("node")
    edges = edges.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
    comps = comps.join(F.broadcast(largest), ["component"], "left_semi")
    return edges, comps


def _blk_cols(df: DataFrame) -> list:
    return ["_blk"] if "_blk" in df.columns else []


def _init_skeleton(edges: DataFrame, skeleton: dict, nbr_topk: int) -> DataFrame:
    """Attach the round-invariant ego-gather structure: per-src block ids
    on the edge table, and the cap-skip flag when no degree exceeds
    ``nbr_topk`` (then neighbor SETS never change as weights evolve, so the
    adjacency top-k window and the gather-demand table are reusable)."""
    max_deg = (
        degree_table(edges.select("src", "dst", "weight"), directed=False)
        .agg(F.max("degree"))
        .collect()[0][0]
    )
    if max_deg is not None and max_deg <= nbr_topk:
        skeleton["skip_cap"] = True
    return edges if "_blk" in edges.columns else assign_blocks(edges)


def ricci_flow(
    edges: DataFrame,
    *,
    iterations: int = 20,
    step: float = 1.0,
    delta: float = 1e-4,
    surgery=None,
    surgery_every: int = 100,
    checkpoint_dir: str | None = None,
    verbose: bool = False,
    alpha: float = 0.5,
    method: str = "OTDSinkhornMix",
    base: float = math.e,
    exp_power: float = 2.0,
    nbr_topk: int = 3000,
    mode: str = "component",
    round_stats: list | None = None,
) -> DataFrame:
    """Run Ricci flow; returns edges with ``weight`` (the flow metric),
    ``ricci_curvature`` and ``original_rc`` columns.

    Input must be an undirected canonical edge table (src < dst). If
    ``checkpoint_dir`` is given, every round is persisted with metrics and a
    restarted call resumes from the latest complete round. ``round_stats``
    (optional caller-provided list) receives one dict per executed round
    ``{"round", "secs", "kappa_diff"}`` — bench.py uses it to report
    seconds/round and rounds-to-converge for the flow loop.
    """
    # ego-mode gather skeleton: block assignment, the (partition, member)
    # demand table and the cap-skip flag are ROUND-INVARIANT (only `weight`
    # changes between rounds; surgery only removes edges, so the cached
    # demand stays a valid superset) — build once, reuse every round
    # (VERDICT r3 next-round #3). Drained leak-safe on any exit.
    skeleton: dict | None = {} if mode == "ego" else None
    try:
        return _ricci_flow_loop(
            edges, iterations=iterations, step=step, delta=delta,
            surgery=surgery, surgery_every=surgery_every,
            checkpoint_dir=checkpoint_dir, verbose=verbose, alpha=alpha,
            method=method, base=base, exp_power=exp_power, nbr_topk=nbr_topk,
            mode=mode, round_stats=round_stats, skeleton=skeleton,
        )
    finally:
        _drain_caches((skeleton or {}).get("caches", []))


def _ricci_flow_loop(
    edges: DataFrame,
    *,
    iterations: int,
    step: float,
    delta: float,
    surgery,
    surgery_every: int,
    checkpoint_dir: str | None,
    verbose: bool,
    alpha: float,
    method: str,
    base: float,
    exp_power: float,
    nbr_topk: int,
    mode: str,
    round_stats: list | None,
    skeleton: dict | None,
) -> DataFrame:
    spark = edges.sparkSession
    curv_kwargs = dict(
        alpha=alpha, method=method, base=base, exp_power=exp_power,
        nbr_topk=nbr_topk, mode=mode,
    )
    ckpt = RoundCheckpoint(checkpoint_dir) if checkpoint_dir else None
    start_round = 0
    state = None
    comps = None

    if ckpt is not None:
        got = ckpt.latest(spark)
        if got is not None:
            i, state, _metrics = got
            start_round = i + 1

    caches: list = []
    if state is None:
        edges = canonicalize(prepare_edges(edges))
        edges, comps = _largest_component_edges(edges)
        if "original_rc" in edges.columns:
            state = edges  # continue-to-refine (reference :566-567)
        else:
            if skeleton is not None:
                edges = _init_skeleton(edges, skeleton, nbr_topk)
            k = ricci_curvature_edges(
                edges, components=comps, cache_registry=caches,
                skeleton=skeleton, **curv_kwargs
            )
            state = (
                edges.select("src", "dst", "weight", *_blk_cols(edges))
                .join(k, ["src", "dst"])
                .withColumn("original_rc", F.col("ricci_curvature"))
                .transform(truncate_plan)
            )
            _drain_caches(caches)
    if comps is None and mode == "component":
        comps = connected_components(state.select("src", "dst", "weight")).cache()
    if skeleton is not None and not skeleton.get("skip_cap"):
        # continue-to-refine / checkpoint-resume path: (re)derive the
        # invariant structure from the current state table
        state = _init_skeleton(state, skeleton, nbr_topk)

    # bootstrap: the gradient step's un-normalized weight sum for round i is
    # Σ w·(1 − step·κ) over round i−1's table, so each round's convergence
    # aggregate also pre-computes the NEXT round's renormalization constant —
    # no separate per-round sum job (reference computes it separately,
    # :583-588; the value is identical).
    boot = state.agg(
        F.count("*").alias("n"),
        F.sum(
            F.col("weight") - F.lit(step) * F.col("ricci_curvature") * F.col("weight")
        ).alias("next_sumw"),
    ).collect()[0]
    n_edges = boot["n"]
    normalized_weight = float(n_edges)
    next_sumw = boot["next_sumw"]

    for i in range(start_round, iterations):
        t0 = time.time()
        # 1+2. gradient step + global renormalization to sum(w) == |E|
        # (reference :580-588) in one expression: the raw sum came from the
        # previous round's aggregate
        updated = state.withColumn(
            "weight",
            (F.col("weight") - F.lit(step) * F.col("ricci_curvature") * F.col("weight"))
            * F.lit(normalized_weight / next_sumw),
        )
        # 3. recompute curvature on the new metric (reference :591)
        k = ricci_curvature_edges(
            updated.select("src", "dst", "weight", *_blk_cols(updated)),
            components=comps, cache_registry=caches, skeleton=skeleton,
            **curv_kwargs
        )
        state = (
            updated.select("src", "dst", "weight", "original_rc", *_blk_cols(updated))
            .join(k, ["src", "dst"])
            .select(
                "src", "dst", "weight", "ricci_curvature", "original_rc",
                *_blk_cols(updated),
            )
            .transform(lambda d: truncate_plan(d, eager=False))
        )
        # 4. convergence (reference :593-600) — this aggregate is the action
        # that materializes the round's checkpoint (ONE action per round)
        # and also yields the next round's renormalization sum
        stats = state.agg(
            F.max("ricci_curvature").alias("kmax"),
            F.min("ricci_curvature").alias("kmin"),
            F.sum("weight").alias("sumw"),
            F.sum(
                F.col("weight")
                - F.lit(step) * F.col("ricci_curvature") * F.col("weight")
            ).alias("next_sumw"),
        ).collect()[0]
        next_sumw = stats["next_sumw"]
        _drain_caches(caches)
        diff = stats["kmax"] - stats["kmin"]
        if round_stats is not None:
            round_stats.append(
                {"round": i, "secs": time.time() - t0, "kappa_diff": diff}
            )
        if verbose:
            print(
                f"[ricci_flow] round={i} secs={time.time() - t0:.2f} "
                f"diff={diff:.6f} sumw={stats['sumw']:.4f}",
                flush=True,
            )
        if ckpt is not None:
            state = ckpt.save(
                i,
                state,
                {
                    "sum_weight": stats["sumw"],
                    "kappa_max": stats["kmax"],
                    "kappa_min": stats["kmin"],
                    "kappa_diff": diff,
                    "n_edges": n_edges,
                    "wall_secs": time.time() - t0,
                },
            )
        if diff < delta:
            break
        # 5. surgery hook (reference :604-608)
        if surgery is not None and i != 0 and i % surgery_every == 0:
            state = surgery(state)
            post = state.agg(
                F.count("*").alias("n"),
                F.sum(
                    F.col("weight")
                    - F.lit(step) * F.col("ricci_curvature") * F.col("weight")
                ).alias("next_sumw"),
            ).collect()[0]
            n_edges = post["n"]
            normalized_weight = float(n_edges)
            next_sumw = post["next_sumw"]
            if mode == "component":
                comps = connected_components(state.select("src", "dst", "weight")).cache()
    return state.drop("_blk")
