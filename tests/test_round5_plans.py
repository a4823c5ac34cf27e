"""Plan-shape guards for the round-5 operators: the 100 TB claims in
PLANS.md ("pure codegen, no UDF, no shuffle") asserted against the actual
physical plans so a refactor can't silently regress them."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_normalize_url_is_pure_projection(spark):
    from graphriccicurvature_spark.operators.urltools import normalize_url

    df = spark.range(100).select(
        F.concat(F.lit("https://h.example/p/"), F.col("id")).alias("url")
    )
    p = _plan(df.select(normalize_url("url").alias("n")))
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_hash_sample_uniform_is_codegen_filter(spark):
    from graphriccicurvature_spark.operators.filtering import hash_sample

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    p = _plan(hash_sample(df, "doc_id", rate=0.5))
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_host_graph_single_aggregation_no_python(spark):
    from graphriccicurvature_spark.operators.webgraph import host_graph

    df = spark.range(100).select(
        F.concat(F.lit("https://a"), (F.col("id") % 7), F.lit(".example/x")).alias("src_url"),
        F.concat(F.lit("https://b"), (F.col("id") % 5), F.lit(".example/y")).alias("dst_url"),
    )
    p = _plan(host_graph(df))
    # partial + final hash aggregate around exactly one shuffle, all JVM
    assert p.count("Exchange") == 1, p
    assert "HashAggregate" in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_katz_round_is_join_plus_agg_no_python(spark):
    from graphriccicurvature_spark.operators.webgraph import katz_centrality_bounded

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    p = _plan(katz_centrality_bounded(e, num_iterations=1))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_edge_embeddedness_single_enumeration_no_python(spark):
    from graphriccicurvature_spark.operators.triangles import edge_embeddedness

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    p = _plan(edge_embeddedness(e))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # the triangle enumeration must appear once (explode of sides), not
    # three times (the union form): one Generate node, and the cached
    # oriented-edge scan keeps the wedge join single-pass
    assert p.count("Generate") == 1, p


def test_bm25_no_python_single_corpus_explode(spark):
    from graphriccicurvature_spark.operators.textstats import bm25_topk

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("merge scan row "), F.col("id")).alias("text"),
    )
    p = _plan(bm25_topk(df, ["merge", "scan"], k=5))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # one corpus tokenization feeding both doclen and tf (no second
    # explode of the full corpus for the filtered branch)
    assert p.count("Generate explode") <= 2, p


def test_pmi_pairs_no_python(spark):
    from graphriccicurvature_spark.operators.textstats import pmi_pairs

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("a b c "), F.col("id") % 3).alias("text"),
    )
    p = _plan(pmi_pairs(df, min_pair_docs=2, k=10))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_unigram_kl_no_python_broadcast_marginal(spark):
    from graphriccicurvature_spark.operators.textstats import unigram_kl

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("x y z "), F.col("id") % 5).alias("text"),
    )
    p = _plan(unigram_kl(df))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_rich_club_histogram_windows_no_python(spark):
    from graphriccicurvature_spark.operators.linkgraph import rich_club

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    p = _plan(rich_club(e))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # the suffix-sum windows run on histogram rows; exactly one Window
    # operator (both cumulative sums share the frame)
    assert p.count("Window") == 1, p


def test_doc_perplexity_no_python_broadcast_marginal(spark):
    from graphriccicurvature_spark.operators.textstats import doc_perplexity

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("x y z "), F.col("id") % 5).alias("text"),
    )
    p = _plan(doc_perplexity(df))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_transitivity_no_python_broadcast_scalar(spark):
    from graphriccicurvature_spark.operators.triangles import transitivity

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    p = _plan(transitivity(e))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # the wedge scalar joins the triangle scalar via a broadcast nested
    # loop of two 1-row sides, never a shuffled cross product
    assert "BroadcastNestedLoopJoin" in p, p


def test_degree_powerlaw_single_aggregate_no_python(spark):
    from graphriccicurvature_spark.operators.degrees import degree_powerlaw

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)],
        "src long, dst long, weight double",
    )
    p = _plan(degree_powerlaw(e))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # degree groupBy + the global tail aggregate: two exchanges total
    # (hash by node, then the single-partition final agg)
    assert p.count("Exchange") <= 2, p


def test_keep_best_window_no_python(spark):
    from graphriccicurvature_spark.operators.dedup import keep_best_survivors

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c d")], "doc_id long, text string"
    )
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0)], "doc_id long, cluster long"
    )
    p = _plan(keep_best_survivors(docs, clusters))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # quality features are row-local codegen; one window by cluster
    assert p.count("Window") == 1, p


def test_dsir_no_python_broadcast_marginals(spark):
    from graphriccicurvature_spark.operators.textstats import dsir_log_ratio

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("x y z "), F.col("id") % 5).alias("text"),
    )
    tgt = spark.range(10).select(F.col("id").alias("doc_id"))
    p = _plan(dsir_log_ratio(df, tgt))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_louvain_round_no_python(spark):
    from graphriccicurvature_spark.operators.louvain import louvain_moves

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    p = _plan(louvain_moves(e, rounds=1))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
