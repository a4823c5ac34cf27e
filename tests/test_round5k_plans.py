"""Plan-shape guards for the round-5k operators — assert the physical
plans match the 100 TB design claims in PLANS.md (codegen where claimed,
broadcast where claimed, no accidental cross products, Arrow where
Python is intentional)."""

from __future__ import annotations

import numpy as np

from graphriccicurvature_spark.operators.similarity import (
    kmeans_clusters,
    semantic_dedup,
)
from graphriccicurvature_spark.operators.webgraph import link_churn


def _vecs(spark, n=40, dim=5):
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_kmeans_plan_literal_model_and_broadcast(spark):
    """Small models assign via plan-literal codegen (no Python eval at
    all) and the centroid cosine join is broadcast, never shuffled."""
    p = _plan(kmeans_clusters(_vecs(spark), k=4, rounds=1))
    assert "BatchEvalPython" not in p, p
    assert "ArrowEvalPython" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_semantic_dedup_plan_cluster_keyed_join(spark):
    """The pairwise stage must be a cluster-keyed equi-join: no cartesian
    product / nested-loop join anywhere (the SemDeDup bounded-quadratic
    claim), and no Python eval."""
    p = _plan(semantic_dedup(_vecs(spark), k=4, rounds=1, threshold=0.9))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "BatchEvalPython" not in p, p
    assert "ArrowEvalPython" not in p, p


def test_link_churn_plan_single_full_outer_no_python(spark):
    """One set-semantic full outer join + codegen aggregate."""
    old = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    new = spark.createDataFrame([(1, 2), (1, 4)], "src long, dst long")
    p = _plan(link_churn(old, new))
    assert "FullOuter" in p, p
    assert "BatchEvalPython" not in p, p
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") <= 1, p


def test_multimodal_plans_are_arrow_batched(spark):
    """frame_sample / audio_features run Python intentionally — but as a
    single Arrow-batched MapInPandas over a 2-column projection, never
    row-at-a-time BatchEvalPython."""
    from graphriccicurvature_spark.operators.multimodal import (
        audio_features,
        frame_sample,
    )

    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, payload binary")
    for out in (frame_sample(df, "id", "payload"), audio_features(df, "id", "payload")):
        p = _plan(out)
        assert "MapInPandas" in p, p
        assert "BatchEvalPython" not in p, p
