"""Hypothesis property tests for the round-5h surface. Each test
generates a BATCH of examples per hypothesis example (a list strategy)
so one property run costs a handful of Spark jobs, not hundreds.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_url_path = st.text(
    alphabet="abcXYZ019/._-%?&=:#", min_size=0, max_size=30
)
_urls = st.lists(
    st.builds(
        lambda h, p, port: f"HTTP://{h}{port}/{p}",
        st.sampled_from(["A.example", "b.Example", "c.example"]),
        _url_path,
        st.sampled_from(["", ":80", ":443", ":8080"]),
    ),
    min_size=20,
    max_size=20,
)

_SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(urls=_urls)
@_SLOW
def test_normalize_url_idempotent(spark, urls):
    from graphriccicurvature_spark.operators.urltools import normalize_url

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(normalize_url("url").alias("url"))
    twice = once.select(normalize_url("url").alias("url"))
    assert [r["url"] for r in once.collect()] == [
        r["url"] for r in twice.collect()
    ]


_texts = st.lists(
    st.text(alphabet="ab1 .,\t\n'!-", min_size=0, max_size=40),
    min_size=25,
    max_size=25,
)


@given(texts=_texts)
@_SLOW
def test_bpe_tokens_bounds(spark, texts):
    """BPE-ish pre-tokens never fewer than whitespace tokens, and never
    more than the non-space character count."""
    from graphriccicurvature_spark.operators.textstats import bpe_token_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    for r in bpe_token_stats(df).collect():
        t = texts[r["doc_id"]]
        assert r["n_bpe_tokens"] >= r["n_ws_tokens"]
        assert r["n_bpe_tokens"] <= sum(1 for ch in t if not ch.isspace())


_events = st.lists(
    st.tuples(
        st.integers(0, 3),          # user
        st.integers(0, 5000),       # ts offset seconds
        st.integers(0, 1),          # side: 0 right, 1 left
    ),
    min_size=10,
    max_size=40,
)


@given(rows=_events)
@_SLOW
def test_asof_join_preserves_left(spark, rows):
    """As-of join is left-total: exactly one output row per left row,
    and every match is the latest right ts <= left ts for that user."""
    from graphriccicurvature_spark.operators.temporal import asof_join_backward

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, u, base + dt.timedelta(seconds=s))
        for i, (u, s, side) in enumerate(rows)
        if side == 1
    ]
    rrows = [
        (i, u, base + dt.timedelta(seconds=s), float(i))
        for i, (u, s, side) in enumerate(rows)
        if side == 0
    ]
    if not lrows or not rrows:
        return
    left = spark.createDataFrame(
        lrows, "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        rrows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = asof_join_backward(
        left, right, by=["user_id"],
        right_value_cols=["event_id", "value"], tiebreak_col="event_id",
    ).collect()
    assert len(out) == len(lrows)
    rt = {}
    for eid, u, ts, _ in rrows:
        rt.setdefault(u, []).append(ts)
    lmap = {i: (u, ts) for i, u, ts in lrows}
    for r in out:
        u, lts = lmap[r["event_id"]]
        cands = [t for t in rt.get(u, []) if t <= lts]
        if cands:
            assert r["ts_r"] == max(cands)
        else:
            assert r["ts_r"] is None
