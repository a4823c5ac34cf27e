"""As-of (point-in-time) join as a declarative DataFrame composition.

Spark has no native ASOF JOIN; the standard distributed form is the
union-and-carry trick: tag both sides, union them, sort within each key
partition by (ts, side) and carry the latest right-side values forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding window
— then keep only left rows. One shuffle keyed by the join keys, one
per-key sort (the same shape as sessionization), no UDFs, no range
explosion: each right row is materialized ONCE regardless of how many
left rows it serves (contrast the naive range-join + row_number, which
is |L|×|R| per key before pruning).

Semantics = backward as-of with inclusive match (right.ts <= left.ts,
ties match), i.e. exactly DuckDB's ``ASOF JOIN ... ON l.k = r.k AND
l.ts >= r.ts`` — which is what the driver oracle runs, so the operator
sits under a native-engine value-level check. Right rows are first
deduplicated per (key, ts) by a deterministic tiebreak so "the most
recent right row" is well-defined on both engines.

The canonical webtext/event use: attribute each conversion event to the
latest preceding interaction (purchase -> last click), or stamp each
crawl fetch with the robots/seed-list version in force at fetch time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``ts_col`` <= the left row's (same ``by`` keys); left rows with no
    prior right row keep nulls (left-join semantics).

    ``right_value_cols`` defaults to every right column that is neither
    a key nor the timestamp. When several right rows share (keys, ts),
    the one with the greatest ``tiebreak_col`` (default: the first value
    column) survives — a deterministic rule both engines replay.
    """
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in by and c != ts_col
        ]
    if tiebreak_col is None:
        tiebreak_col = right_value_cols[0]

    # deterministic dedupe of the right side per (keys, ts)
    wdup = Window.partitionBy(*by, ts_col).orderBy(F.desc(tiebreak_col))
    r = (
        right.select(*by, ts_col, *right_value_cols)
        .withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    lcols = left.columns
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = r.select(
        *by,
        ts_col,
        *[F.col(c).alias(c + suffix) for c in right_value_cols],
        F.lit(0).alias("_side"),
    ).withColumn(ts_col + suffix, F.col(ts_col))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right rows (_side=0) sort before left rows at equal ts -> inclusive
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix)
        for c in right_value_cols
    ] + [F.last(ts_col + suffix, ignorenulls=True).over(w).alias(ts_col + suffix)]
    return (
        u.select(*lcols, F.col("_side"), *carried)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval range join (``start <= ts < end``, same ``by``
    keys) as a BUCKETED equi-join: both sides are mapped to
    ``bucket_seconds``-wide epoch buckets — intervals explode into every
    bucket they touch — then a plain hash equi-join on
    (keys, bucket) + the exact range filter. This is the standard
    distributed range-join rewrite: Spark would otherwise plan an
    inequality join as a nested-loop (quadratic per key); the bucketed
    form shuffles O(|P| + |I| * avg_buckets_per_interval) rows through
    one hash join (plan-guard test asserts no nested loop survives).

    ``bucket_seconds`` is the classic time-index granularity knob: wide
    buckets inflate the post-join filter, narrow ones inflate the
    interval explosion; set it near the median interval length.
    """
    bs = F.lit(bucket_seconds)
    pb = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts_col)) / bs)
    )
    ib = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bs),
                F.floor(F.unix_timestamp(F.col(end_col)) / bs),
            )
        ),
    )
    return (
        pb.join(ib, [*by, "_b"])
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_b")
    )
