"""Luby maximal independent set and greedy maximal matching as
synchronous DataFrame rounds.

Both are the canonical round-synchronous "local minimum wins" algorithms
(Luby 1986; Israeli & Itai 1986): every round, a node (edge) enters the
result iff its priority is a strict local minimum among its still-active
neighborhood, then its closed neighborhood deactivates. Priorities are
content-deterministic hashes, so the result is a pure function of the
graph — reproducible across cluster sizes, resharding and retries, and
replayable round-for-round by an unrolled DuckDB oracle (`luby_mis_4`,
`maximal_matching_4` driver queries use the md5 priority).

MIS deactivates an expected >= 1/2 of EDGES per round and matching
halves its active edge set similarly, so both run O(log n) rounds w.h.p.
Per round the work is one incidence aggregate (map-side combinable min)
plus broadcast-ready joins against the |V|-sized winner table — at
100 TB each round is a constant number of shuffles keyed by node id,
and lineage is truncated per round so plan size stays constant.

MIS is the distributed symmetry-breaking primitive (scheduling
independent crawl batches, conflict-free cache placement); maximal
matching 2-approximates maximum matching and minimum vertex cover
(dedup-pair arbitration, one-to-one page pairing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.lineage import truncate_plan
from ..sources.edges import canonicalize


def _node_priority(col, priority: str):
    if priority == "md5":
        return F.md5(col.cast("string"))
    if priority == "xxhash64":
        # shifted to non-negative so the (pri, node) struct orders like the
        # raw 64-bit value; hex-width strings are NOT needed JVM-side
        return F.xxhash64(col.cast("string"))
    raise ValueError(f"unknown priority {priority!r} (md5 | xxhash64)")


def luby_mis(
    edges: DataFrame,
    rounds: int | None = None,
    max_rounds: int = 40,
    priority: str = "md5",
) -> DataFrame:
    """Luby maximal independent set. Returns ``(node, in_mis, round)``
    for every node DECIDED within the executed rounds (``in_mis=false``
    rows are nodes knocked out by an adjacent winner; with
    ``rounds=None`` every node is decided and the true MIS invariants
    hold: no edge inside the set, every outside node has a neighbor in).

    ``rounds=None`` runs to fixpoint with ONE count action per round;
    ``rounds=k`` runs exactly k rounds with no driver action — the
    unrolled-oracle form (undecided nodes are simply absent).

    ``priority='md5'`` gives the oracle-replayable hex priority;
    ``'xxhash64'`` is the cheaper 100 TB default ordering (same
    algorithm, 8-byte compare instead of 32-hex strings).
    """
    und = canonicalize(edges).select("src", "dst")
    nodes = (
        und.select(F.col("src").alias("node"))
        .union(und.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", _node_priority(F.col("node"), priority).alias("pri"))
    )
    active = truncate_plan(nodes)
    sym = truncate_plan(
        und.select("src", "dst").union(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )

    decided: DataFrame | None = None
    n_rounds = rounds if rounds is not None else max_rounds
    fixpoint = rounds is None

    for r in range(1, n_rounds + 1):
        if fixpoint and active.isEmpty():
            break
        # edges whose BOTH endpoints are still active, carrying the dst
        # priority; strict total order = (pri, node) struct (md5/xxhash64
        # ties are broken by node id, so equal hashes cannot deadlock)
        act_e = (
            sym.join(active.select(F.col("node").alias("src")), "src")
            .join(
                active.select(
                    F.col("node").alias("dst"), F.col("pri").alias("pri_dst")
                ),
                "dst",
            )
        )
        nbr_min = act_e.groupBy("src").agg(
            F.min(F.struct(F.col("pri_dst"), F.col("dst"))).alias("mn")
        )
        winners = (
            active.join(nbr_min, active["node"] == nbr_min["src"], "left")
            .filter(
                F.col("mn").isNull()
                | (F.struct(F.col("pri"), F.col("node")) < F.col("mn"))
            )
            .select("node")
        )
        # still-ACTIVE neighbors of winners (previously decided nodes are
        # long gone from `active`; winners knock each other out never —
        # two adjacent strict local minima are impossible)
        knocked = (
            sym.join(winners.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(active.select("node"), "node")
            .join(winners, "node", "left_anti")
        )
        round_rows = winners.select(
            "node", F.lit(True).alias("in_mis"), F.lit(r).alias("round")
        ).union(
            knocked.select("node", F.lit(False).alias("in_mis"), F.lit(r).alias("round"))
        )
        decided = round_rows if decided is None else decided.union(round_rows)
        active = truncate_plan(
            active.join(
                round_rows.select("node"), "node", "left_anti"
            )
        )
        decided = truncate_plan(decided)

    if decided is None:
        schema = "node long, in_mis boolean, round int"
        return edges.sparkSession.createDataFrame([], schema)
    return decided


def jp_coloring(
    edges: DataFrame,
    rounds: int | None = None,
    max_rounds: int = 60,
    priority: str = "md5",
) -> DataFrame:
    """Jones-Plassmann greedy graph coloring as synchronous rounds.
    Returns ``(node, color, round)`` for every node COLORED within the
    executed rounds; colors are 0-based and the fixpoint result is a
    proper coloring with at most Δ+1 colors.

    Each round, every still-uncolored node whose priority is the strict
    local minimum among uncolored neighbors takes the smallest color not
    used by its already-colored neighbors (the "mex"), computed as pure
    column algebra: sequence(0, |colored nbr colors|) minus the color
    set, array_min — no UDF. Winners per round form an independent set
    among the uncolored subgraph, so two neighbors never color in the
    same round and properness is invariant. Same priority/determinism/
    scale contract as :func:`luby_mis`; coloring is the classic
    conflict-free scheduling primitive (e.g. batching synchronous label
    updates so no two adjacent nodes move in the same batch).
    """
    und = canonicalize(edges).select("src", "dst")
    nodes = (
        und.select(F.col("src").alias("node"))
        .union(und.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", _node_priority(F.col("node"), priority).alias("pri"))
    )
    active = truncate_plan(nodes)
    sym = truncate_plan(
        und.select("src", "dst").union(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )

    colored: DataFrame | None = None
    n_rounds = rounds if rounds is not None else max_rounds
    fixpoint = rounds is None

    for r in range(1, n_rounds + 1):
        if fixpoint and active.isEmpty():
            break
        act_e = (
            sym.join(active.select(F.col("node").alias("src")), "src")
            .join(
                active.select(
                    F.col("node").alias("dst"), F.col("pri").alias("pri_dst")
                ),
                "dst",
            )
        )
        nbr_min = act_e.groupBy("src").agg(
            F.min(F.struct(F.col("pri_dst"), F.col("dst"))).alias("mn")
        )
        winners = (
            active.join(nbr_min, active["node"] == nbr_min["src"], "left")
            .filter(
                F.col("mn").isNull()
                | (F.struct(F.col("pri"), F.col("node")) < F.col("mn"))
            )
            .select("node")
        )
        if colored is None:
            wc = winners.select("node", F.lit(0).alias("color"))
        else:
            # distinct colors already taken in each winner's neighborhood,
            # then mex = min of [0..|set|] minus the set (always defined:
            # a set of k colors cannot cover k+1 candidates)
            nbr_colors = (
                sym.join(winners.select(F.col("node").alias("src")), "src")
                .join(
                    colored.select(
                        F.col("node").alias("dst"), F.col("color")
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.collect_set("color").alias("cs"))
                .select(F.col("src").alias("node"), "cs")
            )
            wc = (
                winners.join(nbr_colors, "node", "left")
                .select(
                    "node",
                    F.coalesce(
                        F.array_min(
                            F.array_except(
                                F.sequence(
                                    F.lit(0),
                                    F.size(F.coalesce("cs", F.array())),
                                ),
                                F.coalesce("cs", F.array()),
                            )
                        ),
                        F.lit(0),
                    ).alias("color"),
                )
            )
        round_rows = wc.select("node", "color", F.lit(r).alias("round"))
        colored = round_rows if colored is None else colored.union(round_rows)
        active = truncate_plan(active.join(round_rows.select("node"), "node", "left_anti"))
        colored = truncate_plan(colored)

    if colored is None:
        schema = "node long, color int, round int"
        return edges.sparkSession.createDataFrame([], schema)
    return colored


def maximal_matching(
    edges: DataFrame,
    rounds: int | None = None,
    max_rounds: int = 40,
    priority: str = "md5",
) -> DataFrame:
    """Greedy (locally-minimum-edge) maximal matching. Returns matched
    edges ``(src, dst, round)``; an edge wins a round iff its priority is
    the strict minimum among all still-active edges sharing either
    endpoint, then both endpoints leave the graph.

    Same bounded/fixpoint contract as :func:`luby_mis`. The fixpoint
    result is a maximal matching (no active edge remains), which
    2-approximates maximum matching and minimum vertex cover.
    """
    und = canonicalize(edges).select("src", "dst")
    if priority == "md5":
        pri = F.md5(F.concat_ws("|", F.col("src").cast("string"), F.col("dst").cast("string")))
    elif priority == "xxhash64":
        pri = F.xxhash64(F.col("src").cast("string"), F.col("dst").cast("string"))
    else:
        raise ValueError(f"unknown priority {priority!r} (md5 | xxhash64)")
    active = truncate_plan(und.select("src", "dst", pri.alias("pri")))

    matched: DataFrame | None = None
    n_rounds = rounds if rounds is not None else max_rounds
    fixpoint = rounds is None

    for r in range(1, n_rounds + 1):
        if fixpoint and active.isEmpty():
            break
        # per-endpoint minimum over incident active edges; struct adds the
        # endpoints so constant-priority ties still order totally
        inc = active.select(
            F.col("src").alias("node"), "src", "dst", "pri"
        ).union(active.select(F.col("dst").alias("node"), "src", "dst", "pri"))
        node_min = inc.groupBy("node").agg(
            F.min(F.struct("pri", "src", "dst")).alias("mn")
        )
        winners = (
            active.join(
                node_min.select(F.col("node").alias("src"), F.col("mn").alias("mn_s")),
                "src",
            )
            .join(
                node_min.select(F.col("node").alias("dst"), F.col("mn").alias("mn_d")),
                "dst",
            )
            .filter(
                (F.struct("pri", "src", "dst") == F.col("mn_s"))
                & (F.struct("pri", "src", "dst") == F.col("mn_d"))
            )
            .select("src", "dst")
        )
        round_rows = winners.select("src", "dst", F.lit(r).alias("round"))
        matched = round_rows if matched is None else matched.union(round_rows)
        used = (
            winners.select(F.col("src").alias("node"))
            .union(winners.select(F.col("dst").alias("node")))
            .distinct()
        )
        active = truncate_plan(
            active.join(used.select(F.col("node").alias("src")), "src", "left_anti")
            .join(used.select(F.col("node").alias("dst")), "dst", "left_anti")
            .select("src", "dst", "pri")
        )
        matched = truncate_plan(matched)

    if matched is None:
        schema = "src long, dst long, round int"
        return edges.sparkSession.createDataFrame([], schema)
    return matched
