"""Round-5i operators: RefinedWeb/CCNet-style exact paragraph dedup
(`paragraph_dedup`) and recrawl snapshot dedup (`snapshot_dedup`) —
semantic unit tests against hand-computed expectations.

Driver-level DuckDB value oracles: `paragraph_dedup` (6-word re-chunked
documents), `snapshot_dedup` (url/warc_ts formula replay + the full
normalize_url rule set).
"""

from __future__ import annotations

import datetime

from graphriccicurvature_spark.operators.dedup import paragraph_dedup, snapshot_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_paragraph_dedup_removes_cross_doc_boilerplate(spark):
    footer = "all rights reserved"
    df = _docs(
        spark,
        [
            (1, "alpha beta\n\n" + footer),
            (2, "gamma delta\n\n" + footer),
            (3, "unique page three"),
        ],
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["text"] == "alpha beta"
    assert out[2]["text"] == "gamma delta"
    assert out[3]["text"] == "unique page three"
    assert out[1]["n_paragraphs"] == 2 and out[1]["n_removed"] == 1
    assert out[3]["n_paragraphs"] == 1 and out[3]["n_removed"] == 0


def test_paragraph_dedup_within_doc_repeat_survives(spark):
    """df counts DISTINCT documents: a paragraph repeated only inside one
    document is not boilerplate and every copy survives, in order."""
    df = _docs(spark, [(1, "echo\n\nmiddle\n\necho"), (2, "other text")])
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["text"] == "echo\n\nmiddle\n\necho"
    assert out[1]["n_removed"] == 0


def test_paragraph_dedup_all_boilerplate_doc_empties(spark):
    df = _docs(spark, [(1, "spam"), (2, "spam"), (3, "spam\n\nham")])
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["text"] == "" and out[1]["n_removed"] == 1
    assert out[2]["text"] == ""
    assert out[3]["text"] == "ham" and out[3]["n_paragraphs"] == 2


def test_paragraph_dedup_min_docs_threshold(spark):
    df = _docs(spark, [(1, "dup"), (2, "dup"), (3, "dup")])
    loose = {r["doc_id"]: r["text"] for r in paragraph_dedup(df, min_docs=4).collect()}
    assert loose == {1: "dup", 2: "dup", 3: "dup"}


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_snapshot_dedup_keeps_newest_per_canonical(spark):
    rows = [
        ("https://a.example/p/1", _ts("2026-01-01T00:00:00")),
        ("https://a.example/p/1?utm_source=feed", _ts("2026-01-02T00:00:00")),
        ("HTTP://A.example:80/p/1#frag", _ts("2026-01-03T00:00:00")),
        ("https://b.example/q", _ts("2026-01-01T00:00:00")),
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts"])
    out = snapshot_dedup(df).collect()
    latest = {r["url"]: r["is_latest"] for r in out}
    canon = {r["url"]: r["canonical_url"] for r in out}
    # the three aliases collapse onto one canonical page each way
    assert canon["https://a.example/p/1?utm_source=feed"] == "https://a.example/p/1"
    assert canon["HTTP://A.example:80/p/1#frag"] == "http://a.example/p/1"
    # http vs https differ in scheme, so the 01-03 fetch is its own page
    assert latest["HTTP://A.example:80/p/1#frag"] is True
    assert latest["https://a.example/p/1?utm_source=feed"] is True
    assert latest["https://a.example/p/1"] is False
    assert latest["https://b.example/q"] is True
    assert sum(1 for r in out if r["is_latest"]) == 3


def test_snapshot_dedup_equal_ts_tiebreak_is_url_asc(spark):
    t = _ts("2026-01-01T00:00:00")
    df = spark.createDataFrame(
        [("https://c.example/x?gclid=1", t), ("https://c.example/x", t)],
        ["url", "warc_ts"],
    )
    out = {r["url"]: r["is_latest"] for r in snapshot_dedup(df).collect()}
    assert out["https://c.example/x"] is True
    assert out["https://c.example/x?gclid=1"] is False


def test_ngram_containment_detects_subset_quote(spark):
    """A short doc quoted inside a long one: containment(short in long)
    is 1.0 while Jaccard stays below any dedup threshold."""
    from graphriccicurvature_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta"
    long_ = short + " " + " ".join(f"w{i} x{i}" for i in range(30))
    df = spark.createDataFrame([(1, short), (2, long_)], ["doc_id", "text"])
    got = {
        (r["contained"], r["container"]): r["containment"]
        for r in ngram_containment_pairs(df, k=2, threshold=0.9).collect()
    }
    assert got == {(1, 2): 1.0}
    jac = ngram_jaccard_pairs(df, k=2, threshold=0.0).collect()
    assert len(jac) == 1 and jac[0]["jaccard"] < 0.1


def test_ngram_containment_is_directed_and_thresholded(spark):
    from graphriccicurvature_spark.operators.dedup import ngram_containment_pairs

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d e f g h")], ["doc_id", "text"]
    )
    rows = ngram_containment_pairs(df, k=2, threshold=0.5).collect()
    d = {(r["contained"], r["container"]): r["containment"] for r in rows}
    # S1 = {ab,bc,cd} fully inside S2 (7 bigrams): 3/3 one way, 3/7 the other
    assert d[(1, 2)] == 1.0
    assert (2, 1) not in d


def _barbell(spark):
    """Two 4-cliques (0-3, 4-7) joined by the single bridge 3-4."""
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    edges += [(3, 4)]
    return spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], ["src", "dst", "weight"]
    )


def test_ppr_sweep_finds_seed_clique(spark):
    """On a barbell graph seeded inside clique A, the conductance sweep
    bottoms out exactly at the clique boundary (prefix = clique A):
    vol=13, internal=6, cut=1, phi=1/13."""
    from graphriccicurvature_spark.operators.linkgraph import ppr_sweep

    seeds = spark.createDataFrame([(0,)], ["node"])
    rows = ppr_sweep(
        _barbell(spark), seeds, num_iterations=4, max_prefix=7
    ).collect()
    by_rank = {r["rank"]: r for r in rows}
    assert len(by_rank) == 7
    prefix4 = {by_rank[k]["node"] for k in (1, 2, 3, 4)}
    assert prefix4 == {0, 1, 2, 3}
    phis = {k: by_rank[k]["conductance"] for k in by_rank}
    assert abs(phis[4] - 1.0 / 13.0) < 1e-9
    assert min(phis, key=lambda k: phis[k]) == 4
    # volumes/cuts are exact unit-weight integers
    assert by_rank[4]["volume"] == 13.0 and by_rank[4]["cut_weight"] == 1.0


def test_ppr_sweep_plan_uses_topk_not_global_window(spark):
    """The node ranking must plan as distributed top-k
    (TakeOrderedAndProject), not a single-partition window over every
    node in the graph."""
    from graphriccicurvature_spark.operators.linkgraph import ppr_sweep

    seeds = spark.createDataFrame([(0,)], ["node"])
    out = ppr_sweep(_barbell(spark), seeds, num_iterations=1, max_prefix=3)
    # localCheckpoint materializes the (tiny) result; the plan guard runs
    # on a rebuilt lazy pipeline instead
    from graphriccicurvature_spark.operators.linkgraph import personalized_pagerank
    from graphriccicurvature_spark.sources.edges import symmetrize
    from pyspark.sql import functions as F

    sym = symmetrize(_barbell(spark))
    ppr = personalized_pagerank(sym, seeds, num_iterations=1, directed=True)
    wdeg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    top = (
        ppr.join(wdeg, "node")
        .withColumn("score", F.round("ppr", 9) / F.col("wdeg"))
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(3)
    )
    p = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p, p
    assert out.count() == 3


def test_round5i_plans_are_codegen(spark):
    """paragraph_dedup / snapshot_dedup / ngram_containment_pairs are
    pure DataFrame algebra: no Python eval nodes anywhere in the
    physical plans (the 100 TB claim in PLANS.md)."""
    from graphriccicurvature_spark.operators.dedup import (
        ngram_containment_pairs,
        paragraph_dedup,
        snapshot_dedup,
    )
    from graphriccicurvature_spark.sources.pages import generate_pages

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i % 3} common tail") for i in range(20)], ["doc_id", "text"]
    )
    for df in (
        paragraph_dedup(docs),
        ngram_containment_pairs(docs, k=2, threshold=0.5),
        snapshot_dedup(generate_pages(spark, 10).select("url", "warc_ts")),
    ):
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p, p
        assert "ArrowEvalPython" not in p, p
