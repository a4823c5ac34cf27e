"""Round-5c operators: session windows (batch + streaming twin), TF-IDF
top-terms, k-source Brandes betweenness.

Betweenness is pinned against a from-scratch python Brandes (BFS +
backward dependency accumulation) on random graphs; sessions against a
hand fixture and the stream==batch twin; TF-IDF against a direct python
recomputation. Driver-level DuckDB value oracles: `events_sessions`
(gaps-and-islands), `tfidf_top3`, `betweenness_4src` (closed-form
walk-count CTEs).
"""

from __future__ import annotations

import datetime as dt
import math
import random
from collections import deque

import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.operators.textstats import tfidf_top_terms
from graphriccicurvature_spark.operators.webgraph import betweenness_from_sources
from graphriccicurvature_spark.streaming.events import (
    run_stream_to_memory,
    session_event_counts_batch,
    session_event_counts_stream,
)

from tests.test_round5_webgraph import _edges_df


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, float(v))
         for i, (m, u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, value double",
    )


SESSION_ROWS = [
    # user 1: events at 0, 10, 25 min (one session; gaps < 30), then 90 (new)
    (0, 1, 1.0), (10, 1, 2.0), (25, 1, 3.0), (90, 1, 4.0),
    # user 2: exactly-30-min gap MERGES — Spark's session_window treats
    # an event landing exactly at prev_end (= prev_ts + gap) as part of
    # the session (verified on this build; the DuckDB oracle breaks only
    # on gap STRICTLY > 30 min to match)
    (5, 2, 10.0), (35, 2, 20.0),
    # user 3: 31-min gap -> new session (strictly past the boundary)
    (0, 3, 5.0), (31, 3, 7.0),
]


def test_session_batch_hand_fixture(spark):
    got = {
        (r.user_id, r.session_start.minute + r.session_start.hour * 60): r
        for r in session_event_counts_batch(_ev(spark, SESSION_ROWS), "30 minutes").collect()
    }
    assert len(got) == 5
    s1 = got[(1, 0)]
    assert s1.n_events == 3 and s1.sum_value == pytest.approx(6.0)
    assert s1.session_end == dt.datetime(2024, 1, 1, 0, 55)  # last(25) + 30
    s1b = got[(1, 90)]
    assert s1b.n_events == 1 and s1b.sum_value == pytest.approx(4.0)
    s2 = got[(2, 5)]  # exact-boundary event merged in
    assert s2.n_events == 2 and s2.sum_value == pytest.approx(30.0)
    assert s2.session_end == dt.datetime(2024, 1, 1, 1, 5)  # last(35) + 30
    assert got[(3, 0)].n_events == 1
    assert got[(3, 31)].n_events == 1  # 31-min gap does NOT merge


def test_session_stream_matches_batch(tmp_path, spark):
    ev = _ev(spark, SESSION_ROWS)
    d = str(tmp_path / "events")
    ev.write.parquet(d)
    batch = sorted(
        map(tuple, session_event_counts_batch(ev, "30 minutes").collect())
    )
    stream = session_event_counts_stream(
        spark, d, ev.schema, gap="30 minutes", watermark="2 hours"
    )
    q = run_stream_to_memory(stream, "sess_test")
    got = sorted(map(tuple, spark.sql("SELECT * FROM sess_test").collect()))
    q.stop()
    assert got == batch


def test_tfidf_matches_python(spark):
    docs = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "apple cherry cherry date"),
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id, r.rank): (r.term, r.tf, r.score)
        for r in tfidf_top_terms(df, k=2).collect()
    }
    # python recomputation
    n = len(docs)
    tf: dict[tuple[int, str], int] = {}
    for i, text in docs:
        for t in text.split():
            tf[(i, t)] = tf.get((i, t), 0) + 1
    dfreq: dict[str, int] = {}
    for (_, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    exp: dict[int, list] = {}
    for (i, t), c in tf.items():
        s = c * (math.log((n + 1) / (dfreq[t] + 1)) + 1)
        exp.setdefault(i, []).append((-s, t, c))
    for i, lst in exp.items():
        lst.sort()
        for rank, (negs, t, c) in enumerate(lst[:2], start=1):
            term, tfv, score = got[(i, rank)]
            assert (term, tfv) == (t, c)
            assert score == pytest.approx(-negs, abs=1e-12)
    assert not any(i == 3 for i, _ in got)  # empty doc yields no terms


def _brandes_python(pairs, sources, n):
    """From-scratch Brandes (Algorithm 1, Brandes 2001) on the undirected
    graph; returns raw delta sums over the given sources."""
    adj: dict[int, list[int]] = {v: [] for v in range(n)}
    seen = set()
    for s, d in pairs:
        if (s, d) not in seen and (d, s) not in seen and s != d:
            seen.add((s, d))
            adj[s].append(d)
            adj[d].append(s)
    bc = {v: 0.0 for v in range(n)}
    for s in sources:
        stack, preds = [], {v: [] for v in range(n)}
        sigma = {v: 0.0 for v in range(n)}
        dist = {v: -1 for v in range(n)}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in range(n)}
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


@pytest.mark.parametrize("seed,n,m", [(7, 18, 40), (21, 25, 50)])
def test_betweenness_matches_bruteforce(spark, seed, n, m):
    rng = random.Random(seed)
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    pairs = [(s, d) for s, d in pairs if s != d]
    present = sorted({v for p in pairs for v in p})
    sources = present[:4]
    exp = _brandes_python(pairs, sources, n)
    srcs = spark.createDataFrame([(int(s),) for s in sources], "node long")
    got = {
        r.node: r.betweenness
        for r in betweenness_from_sources(
            _edges_df(spark, pairs), srcs, directed=False
        ).collect()
    }
    assert set(got) == set(present)
    for v in present:
        assert got[v] == pytest.approx(exp[v], abs=1e-9), f"node {v}"


def test_betweenness_path_graph(spark):
    # path 0-1-2-3, all sources: interior nodes carry the known values
    pairs = [(0, 1), (1, 2), (2, 3)]
    srcs = spark.createDataFrame([(i,) for i in range(4)], "node long")
    got = {
        r.node: r.betweenness
        for r in betweenness_from_sources(
            _edges_df(spark, pairs), srcs, directed=False
        ).collect()
    }
    # delta sums over ordered (s,t) pairs: node1 lies on 0-2,0-3,2-0,3-0... =
    # pairs (0,2),(0,3),(3,2)? enumerate: shortest paths through 1:
    # (0,2),(0,3),(2,0),(3,0) -> 4
    assert got[1] == pytest.approx(4.0)
    assert got[2] == pytest.approx(4.0)
    assert got[0] == pytest.approx(0.0) and got[3] == pytest.approx(0.0)
