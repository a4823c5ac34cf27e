"""Round-5 corpus filtering: composed document_filter verdicts and
reproducible hash sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.operators.filtering import (
    document_filter,
    hash_fraction,
    hash_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_document_filter_rules_fire_individually(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and it runs far "
        "to the old barn where it sleeps for hours in warm hay"
    )
    rows = [
        (0, good),                                   # keep
        (1, "the cat"),                              # too_short
        (2, " ".join(["spam"] * 40)),                # dup_tokens (+dup_3grams, top_2gram)
        (3, good.replace(" ", "!!! ")),              # high_punct (+low_alpha)
        (4, "le chat la le une des il est sur la le une des il est pour"),  # lang=fr
    ]
    out = {r.doc_id: r for r in document_filter(_docs(spark, rows)).collect()}
    assert out[0].keep and out[0].reasons == ""
    assert not out[1].keep and "too_short" in out[1].reasons
    assert not out[2].keep and "dup_tokens" in out[2].reasons
    assert not out[3].keep and "high_punct" in out[3].reasons
    assert not out[4].keep and "lang" in out[4].reasons
    # reasons are sorted and comma-joined -> deterministic string
    for r in out.values():
        parts = r.reasons.split(",") if r.reasons else []
        assert parts == sorted(parts)


def test_hash_fraction_uniform_and_stable(spark):
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    fr = df.select(hash_fraction("k").alias("f"))
    stats = fr.agg(
        F.min("f").alias("lo"), F.max("f").alias("hi"), F.avg("f").alias("mu")
    ).collect()[0]
    assert 0.0 <= stats.lo and stats.hi < 1.0
    assert abs(stats.mu - 0.5) < 0.03  # uniformity at n=2000
    # stability: same keys -> identical fractions on recompute
    a = sorted(r.f for r in fr.collect())
    b = sorted(r.f for r in df.select(hash_fraction("k").alias("f")).collect())
    assert a == b


def test_hash_sample_uniform_rate(spark):
    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    kept = hash_sample(df, key_col="doc_id", rate=0.25).count()
    assert abs(kept / 4000 - 0.25) < 0.03
    # monotone: a higher rate keeps a superset
    k1 = {r.doc_id for r in hash_sample(df, "doc_id", rate=0.1).collect()}
    k2 = {r.doc_id for r in hash_sample(df, "doc_id", rate=0.3).collect()}
    assert k1 <= k2
    # salt decorrelates
    s = {r.doc_id for r in hash_sample(df, "doc_id", rate=0.1, salt="x").collect()}
    assert s != k1


def test_hash_sample_stratified(spark):
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("h")
    )
    rates = spark.createDataFrame(
        [("0", 0.0), ("1", 0.5)], "h string, rate double"
    )  # stratum "2" missing -> rate 0
    got = (
        hash_sample(df, "doc_id", rates=rates, stratum_col="h")
        .groupBy("h")
        .count()
        .collect()
    )
    by = {r.h: r["count"] for r in got}
    assert "0" not in by and "2" not in by
    assert abs(by["1"] / 1000 - 0.5) < 0.06


def test_hash_sample_requires_rate(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="rate"):
        hash_sample(df, "doc_id")
    with pytest.raises(ValueError, match="stratum_col"):
        hash_sample(
            df, "doc_id",
            rates=spark.createDataFrame([("a", 0.5)], "h string, rate double"),
        )


def test_corpus_length_quantiles_exact(spark):
    import numpy as np

    from graphriccicurvature_spark.operators.textstats import (
        corpus_length_quantiles,
    )

    rows = [
        (0, "a b c", "en"), (1, "a b c d e", "en"), (2, "a", "en"),
        (3, "x y z w", "fr"), (4, "x", "fr"), (5, "", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.lang: r for r in corpus_length_quantiles(df).collect()}
    toks = {"en": [3, 5, 1], "fr": [4, 1, 0]}
    for lang, nts in toks.items():
        r = got[lang]
        assert r.n_docs == len(nts)
        # numpy 'linear' interpolation == Spark percentile == quantile_cont
        for col, q in [("tokens_p10", 0.1), ("tokens_p50", 0.5),
                       ("tokens_p90", 0.9), ("tokens_p99", 0.99)]:
            want = round(float(np.percentile(nts, q * 100, method="linear")), 6)
            assert abs(r[col] - want) < 1e-9, (lang, col, r[col], want)


def test_contamination_check_vs_hashlib(spark):
    import hashlib

    from graphriccicurvature_spark.operators.textstats import contamination_check

    def split_of(i):
        d = hashlib.md5(str(i).encode()).hexdigest()[0]
        return "train" if d in "0123456789ab" else ("val" if d in "cd" else "test")

    # find ids landing in different splits so the fixture provably crosses
    ids = list(range(200))
    by_split = {}
    for i in ids:
        by_split.setdefault(split_of(i), []).append(i)
    a_train, b_train = by_split["train"][:2]
    a_val = by_split["val"][0]
    a_test = by_split["test"][0]

    rows = [
        (a_train, "dup one"), (a_val, "dup one"),          # train+val leak
        (b_train, "dup two"), (a_test, "dup two"),         # train+test leak
        (by_split["train"][2], "same split"),              # dup within one split
        (by_split["train"][3], "same split"),
        (by_split["val"][1], "unique text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.group_hash: r for r in contamination_check(df).collect()}

    def md5(t):
        return hashlib.md5(t.encode()).hexdigest()

    assert set(got) == {md5("dup one"), md5("dup two")}  # same-split dup excluded
    r1 = got[md5("dup one")]
    assert r1.n_docs == 2 and r1.n_splits == 2 and r1.splits == "train,val"
    assert r1.min_doc_id == min(a_train, a_val)
    r2 = got[md5("dup two")]
    assert r2.n_docs == 2 and r2.splits == "test,train"

    # prefix canonicalization: texts identical in the first 4 chars collide
    df2 = spark.createDataFrame(
        [(a_train, "abcdXXX"), (a_val, "abcdYYY")], "doc_id long, text string"
    )
    assert contamination_check(df2, prefix=4).count() == 1
    assert contamination_check(df2).count() == 0


def test_minhash_contamination_cross_split_only(spark):
    import hashlib

    from graphriccicurvature_spark.operators.dedup import minhash_contamination

    def split_of(i):
        d = hashlib.md5(str(i).encode()).hexdigest()[0]
        return "train" if d in "0123456789ab" else ("val" if d in "cd" else "test")

    by_split = {}
    for i in range(300):
        by_split.setdefault(split_of(i), []).append(i)
    t0, t1, t2 = by_split["train"][:3]
    v0 = by_split["val"][0]

    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (t0, near), (v0, near),               # identical -> cross-split pair
        (t1, near), (t2, near),               # also identical but same-split
        (by_split["test"][0], "totally different words about other topics entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_a, r.doc_b, r.split_a, r.split_b)
        for r in minhash_contamination(df).collect()
    )
    # cross-split pairs only: (t0,v0), (t1,v0), (t2,v0) — t0/t1/t2 are all
    # train so their mutual pairs are filtered; every pair with v0 crosses
    want = sorted(
        (min(a, v0), max(a, v0), split_of(min(a, v0)), split_of(max(a, v0)))
        for a in (t0, t1, t2)
    )
    assert got == want


def test_spam_mass_flags_untrusted_farm(spark):
    from graphriccicurvature_spark.operators.linkgraph import (
        personalized_pagerank,
        spam_mass,
    )
    from graphriccicurvature_spark.operators.pagerank import pagerank

    # trusted core 1<->2; spam farm 100..104 all pointing at target 50,
    # which reflects back to the farm (classic link-exchange shape)
    pairs = [(1, 2), (2, 1)] + [(i, 50) for i in range(100, 105)] + [
        (50, i) for i in range(100, 105)
    ]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    seeds = spark.createDataFrame([(1,), (2,)], "node long")
    got = {r.node: r for r in spam_mass(e, seeds, num_iterations=5).collect()}

    # identity: mass == (pr - tr) / pr with the two operators run directly
    pr = {r.node: r.pagerank for r in pagerank(e, num_iterations=5, directed=True).collect()}
    tr = {r.node: r.ppr for r in personalized_pagerank(e, seeds, num_iterations=5).collect()}
    for n, row in got.items():
        assert row.pagerank == pytest.approx(pr[n])
        assert row.trustrank == pytest.approx(tr[n])
        assert row.spam_mass == pytest.approx((pr[n] - tr[n]) / pr[n])

    # the spam target's rank comes from untrusted pages, so its mass tops
    # the graph (bounded iterations from the uniform start leave residual
    # trustrank everywhere, so it stays below 1); the trusted core is
    # trust-dominated and goes negative
    farm = [got[n].spam_mass for n in [50] + list(range(100, 105))]
    assert min(farm) > 0.3  # every farm page flagged
    assert got[1].spam_mass < 0.0 and got[2].spam_mass < 0.0
