"""Training-data pipeline operators: dedup, similarity, text stats, events,
multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup,
)
from graphriccicurvature_spark.operators.multimodal import (
    binary_metadata,
    decode_stub,
    extract_features,
)
from graphriccicurvature_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from graphriccicurvature_spark.operators.textstats import (
    add_token_stats,
    fingerprint,
    language_id,
    quality_score,
)


def _doc_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_dedup(spark):
    df = _doc_df(spark, ["a b c", "x y", "a b c", "z", "x y", "a b c"])
    got = {r.doc_id: r.is_survivor for r in exact_dedup(df).collect()}
    assert got == {0: True, 1: True, 2: False, 3: True, 4: False, 5: False}


def test_minhash_dedup_clusters_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base.replace("today", "tonight")
    other = "completely different text about spark dataframes and shuffle partitions yes"
    df = _doc_df(spark, [base, near, other, base])
    out = {r.doc_id: (r.cluster, r.is_survivor) for r in minhash_dedup(
        df, num_perm=32, bands=16, jaccard_threshold=0.5
    ).collect()}
    assert out[0][0] == out[1][0] == out[3][0]  # near-dups clustered
    assert out[2][0] == 2  # singleton
    assert out[0][1] and not out[1][1] and not out[3][1]


def test_minhash_candidates_jaccard_sanity(spark):
    """LSH candidates are a superset of truly-identical docs and exclude
    pairs with no shared shingles."""
    df = _doc_df(spark, ["a b c d e f g", "a b c d e f g", "q r s t u v w"])
    cands = {(r.a, r.b) for r in minhash_lsh_candidates(df, num_perm=16, bands=8).collect()}
    assert (0, 1) in cands
    assert (0, 2) not in cands and (1, 2) not in cands


def test_simhash_identical_and_different(spark):
    df = _doc_df(spark, ["hello world foo bar", "hello world foo bar", "abc def"])
    sigs = {r.id: r.simhash for r in simhash(df).collect()}
    assert sigs[0] == sigs[1] != sigs[2]
    surv = {r.doc_id: r.is_survivor for r in simhash_dedup(df).collect()}
    assert surv == {0: True, 1: False, 2: True}


def test_simhash_near_duplicates_have_small_hamming(spark):
    a = "the quick brown fox jumps over the lazy dog repeatedly every single day"
    b = a.replace("day", "night")
    c = "totally unrelated content regarding database query optimizers and joins"
    df = _doc_df(spark, [a, b, c])
    sigs = {r.id: r.simhash for r in simhash(df).collect()}
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(sigs[0], sigs[1]) < ham(sigs[0], sigs[2])


def test_ngram_jaccard_pairs(spark):
    df = _doc_df(spark, ["a b c d", "a b c e", "x y z w"])
    got = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(df, k=2, threshold=0.1).collect()}
    # shingles(0) = {ab, bc, cd}; shingles(1) = {ab, bc, ce}: J = 2/4
    assert abs(got[(0, 1)] - 0.5) < 1e-9
    assert (0, 2) not in got


def test_cosine_topk_bruteforce_vs_numpy(spark):
    rng = np.random.RandomState(0)
    vecs = rng.randn(40, 8).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 3)
    got = {}
    for r in cosine_topk_bruteforce(df, q, k=5).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
    norms = np.linalg.norm(vecs, axis=1)
    sims = vecs @ vecs.T / np.outer(norms, norms)
    for qi in range(3):
        order = sorted(
            [(-sims[qi, j], j) for j in range(40) if j != qi]
        )[:5]
        want = [(rank + 1, j, -s) for rank, (s, j) in enumerate(order)]
        have = sorted(got[qi])
        assert [w[1] for w in want] == [h[1] for h in have]
        assert all(abs(w[2] - h[2]) < 1e-9 for w, h in zip(want, have))


def test_cosine_topk_lsh_recall(spark):
    rng = np.random.RandomState(1)
    vecs = rng.randn(100, 16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(df, q, k=5)
    approx = cosine_topk_lsh(df, q, k=5, bits=4, tables=6, dim=16)
    ex = {(r.query_id, r.vec_id) for r in exact.collect()}
    ap = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall > 0.5  # 4 bits x 6 tables on 16-dim gaussian vectors


def test_token_stats_and_quality(spark):
    df = _doc_df(spark, ["the cat sat", "", "  spaced   out  words "])
    got = {r.doc_id: (r.n_tokens, r.avg_token_len) for r in add_token_stats(df).collect()}
    assert got[0] == (3, 3.0)
    assert got[1][0] == 0
    assert got[2][0] == 3
    q = {r.doc_id: r.quality for r in quality_score(df).collect()}
    assert 0.0 <= min(q.values()) and max(q.values()) <= 1.0
    assert q[0] > q[1]


def test_language_id(spark):
    df = _doc_df(
        spark,
        [
            "the cat is in the house and it is warm",
            "le chat est dans la maison et il est chaud",
            "el gato es en la casa y es caliente",
            "zzz qqq www",
        ],
    )
    got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
    assert got[0] == "en" and got[1] == "fr" and got[2] == "es" and got[3] == "und"


def test_fingerprint_deterministic(spark):
    df = _doc_df(spark, ["a b c d e", "a b c d e", "b c d e f"])
    got = {r.doc_id: (r.text_hash, r.min_shingle_hash) for r in fingerprint(df).collect()}
    assert got[0] == got[1]
    assert got[0][0] != got[2][0]


def test_binary_metadata_and_features(spark):
    df = _doc_df(spark, ["hello", "worlds!"]).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    meta = {r.id: (r.n_bytes, r.sha1_prefix) for r in binary_metadata(df, "doc_id", "payload").collect()}
    assert meta[0][0] == 5 and meta[1][0] == 7
    feats = {r.id: r.features for r in extract_features(df, "doc_id", "payload").collect()}
    assert len(feats[0]) == 32 and feats[0] != feats[1]


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_stub(b"xx", "image")


def test_events_windowed_batch_vs_duckdb(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    from graphriccicurvature_spark.streaming.events import windowed_event_counts_batch

    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in windowed_event_counts_batch(ev).collect()
    }
    con = duckdb.connect()
    want = {}
    for ws, et, n, s in con.sql(
        f"""SELECT time_bucket(INTERVAL '1 hour', ts), event_type, count(*), round(sum(value), 6)
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2"""
    ).fetchall():
        want[(ws, et)] = (n, float(s))
    assert got == want


def test_events_structured_stream(tmp_path, spark):
    """Streaming twin produces the same aggregate as the batch query."""
    sf = "/root/testdata/sf0.001"
    from graphriccicurvature_spark.streaming.events import (
        run_stream_to_memory,
        windowed_event_counts_batch,
        windowed_event_counts_stream,
    )

    import shutil

    ev = spark.read.parquet(f"{sf}/events.parquet")
    # file-stream sources need a directory of files
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf}/events.parquet", stream_dir / "part-000.parquet")
    stream = windowed_event_counts_stream(spark, str(stream_dir), ev.schema)
    run_stream_to_memory(stream, "evt_counts")
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in spark.sql("select * from evt_counts").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in windowed_event_counts_batch(ev).collect()
    }
    assert got == want
