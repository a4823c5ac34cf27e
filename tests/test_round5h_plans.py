"""Plan-shape guards for the round-5h operators (see PLANS.md claims)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _edges(spark):
    return spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 2, 1.0)],
        "src long, dst long, weight double",
    )


def test_bpe_token_stats_is_pure_projection(spark):
    from graphriccicurvature_spark.operators.textstats import bpe_token_stats

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("hello, world "), F.col("id")).alias("text"),
    )
    p = _plan(bpe_token_stats(df))
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_mis_round_no_python_no_cartesian(spark):
    from graphriccicurvature_spark.operators.mis import luby_mis

    p = _plan(luby_mis(_edges(spark), rounds=1))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "CartesianProduct" not in p, p


def test_matching_round_no_python_no_cartesian(spark):
    from graphriccicurvature_spark.operators.mis import maximal_matching

    p = _plan(maximal_matching(_edges(spark), rounds=1))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "CartesianProduct" not in p, p


def test_coloring_round_no_python_no_cartesian(spark):
    from graphriccicurvature_spark.operators.mis import jp_coloring

    p = _plan(jp_coloring(_edges(spark), rounds=2))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "CartesianProduct" not in p, p


def test_simrank_iteration_no_python_no_cartesian(spark):
    from graphriccicurvature_spark.operators.linkgraph import simrank

    p = _plan(simrank(_edges(spark), num_iterations=1))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "CartesianProduct" not in p, p


def test_robustness_no_python_and_klimit_is_top_k(spark):
    from graphriccicurvature_spark.operators.webgraph import robustness_report

    p = _plan(robustness_report(_edges(spark), k=2))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # the hub selection must be a distributed top-k, not a global sort
    assert "TakeOrderedAndProject" in p, p


def test_asof_join_one_shuffle_no_range_explosion(spark):
    """The union-and-carry as-of join must plan as window-over-union:
    no nested-loop/cartesian (the naive inequality-join shape) and no
    Python eval. Each right row ships once — the plan's only joins are
    none at all (union + window)."""
    from graphriccicurvature_spark.operators.temporal import asof_join_backward

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c")], "k long, ts long, lv string"
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 18, 200.0), (2, 15, 300.0)], "k long, ts long, rv double"
    )
    p = _plan(asof_join_backward(left, right, by=["k"], ts_col="ts"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "Window" in p, p
    # the left-vs-right pairing is carried by the window, never a join
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p


def test_curation_funnel_single_final_aggregate_no_python(spark):
    """The funnel report must stay one unpivoted aggregate over flag
    joins (PLANS.md claim): no Python eval anywhere, no cartesian, and
    exactly one final single-row HashAggregate feeding the 4-row
    explode (not four per-stage corpus passes)."""
    from graphriccicurvature_spark.operators.filtering import curation_funnel

    docs = spark.createDataFrame(
        [(i, "the quick brown fox %d jumps over the lazy dog" % (i % 7))
         for i in range(40)],
        "doc_id long, text string",
    )
    p = _plan(curation_funnel(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "Generate" in p, p  # the unpivot explode of the 8-scalar row
