"""Round-5k operators: spherical k-means clustering (the SemDeDup
clustering stage), SemDeDup within-cluster semantic dedup, and recrawl
link churn.

k-means and SemDeDup are checked against brute-force numpy replicas of
the published definitions (Abbas et al. 2023, arXiv:2303.09540) with the
same deterministic choices (seed = k smallest ids, argmax-cosine ties ->
smallest cell, 9dp-rounded Lloyd means, lowest-id survivor); link_churn
against hand-counted expectations. Driver-level DuckDB value oracles:
`kmeans_clusters_8`, `semantic_dedup`, `link_churn`.
"""

from __future__ import annotations

import numpy as np
import pytest

from graphriccicurvature_spark.operators.similarity import (
    kmeans_clusters,
    semantic_dedup,
)
from graphriccicurvature_spark.operators.webgraph import link_churn


def _vec_fixture(n=60, dim=6, seed=7):
    rng = np.random.RandomState(seed)
    # three planted directions + noise, plus near-duplicate pairs
    base = rng.randn(3, dim)
    rows = []
    for i in range(n):
        v = base[i % 3] + 0.3 * rng.randn(dim)
        rows.append((i, [float(x) for x in v]))
    # exact-ish near-dups: vector 50+j is vector j plus tiny noise
    for j in range(5):
        v = np.array(rows[j][1]) + 1e-3 * rng.randn(dim)
        rows[50 + j] = (50 + j, [float(x) for x in v])
    return rows


def _kmeans_bruteforce(rows, k, rounds):
    ids = [i for i, _ in rows]
    V = {i: np.asarray(v, dtype=float) for i, v in rows}
    cents = {i: V[i].copy() for i in sorted(ids)[:k]}

    def assign(cents):
        out = {}
        for i in ids:
            best = None
            for cid in sorted(cents):
                c = cents[cid]
                cos = V[i] @ c / (np.linalg.norm(V[i]) * np.linalg.norm(c))
                if best is None or cos > best[0]:
                    best = (cos, cid)  # ties keep the smaller cid (sorted order)
            out[i] = best
        return out

    for _ in range(rounds):
        a = assign(cents)
        new = {}
        for i, (_, cid) in a.items():
            new.setdefault(cid, []).append(V[i])
        cents = {cid: np.round(np.mean(np.stack(vs), axis=0), 9) for cid, vs in new.items()}
    return assign(cents)


def test_kmeans_clusters_matches_bruteforce(spark):
    rows = _vec_fixture()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cluster"], r["cosine"])
        for r in kmeans_clusters(df, k=4, rounds=2).collect()
    }
    want = _kmeans_bruteforce(rows, k=4, rounds=2)
    assert set(got) == set(want)
    for i, (cos, cid) in want.items():
        assert got[i][0] == cid, f"vec {i}: cluster {got[i][0]} != {cid}"
        assert abs(got[i][1] - cos) < 1e-9
    # sanity: more than one cluster survives on the 3-direction fixture
    assert len({c for c, _ in got.values()}) >= 2


def test_kmeans_empty_corpus_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        kmeans_clusters(df, k=4)


def test_semantic_dedup_matches_bruteforce(spark):
    rows = _vec_fixture()
    thr = 0.999
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["cluster"], r["keep"]) for r in
           semantic_dedup(df, k=4, rounds=1, threshold=thr).collect()}

    a = _kmeans_bruteforce(rows, k=4, rounds=1)
    V = {i: np.asarray(v, dtype=float) for i, v in rows}
    want_keep = {}
    for i in a:
        dup = False
        for j in a:
            if j < i and a[j][1] == a[i][1]:
                cos = V[i] @ V[j] / (np.linalg.norm(V[i]) * np.linalg.norm(V[j]))
                if cos >= thr:
                    dup = True
        want_keep[i] = not dup
    assert {i: k for i, (_, k) in got.items()} == want_keep
    for i, (cid, _) in got.items():
        assert cid == a[i][1]
    # the planted near-dup copies (50..54) must be pruned, originals kept
    dropped = {i for i, (_, k) in got.items() if not k}
    assert {50, 51, 52, 53, 54} <= dropped
    assert not dropped & {0, 1, 2, 3, 4}


def test_link_churn_counts(spark):
    old = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 5), (3, 6), (1, 2)], "src long, dst long"
    )
    new = spark.createDataFrame(
        [(1, 2), (1, 5), (2, 5), (4, 7)], "src long, dst long"
    )
    got = {r["src"]: r for r in link_churn(old, new).collect()}
    # src 1: old {2,3,4} new {2,5} -> added 1, removed 2, retained 1
    assert (got[1]["added"], got[1]["removed"], got[1]["retained"]) == (1, 2, 1)
    assert got[1]["churn_rate"] == 0.75
    # src 2: unchanged
    assert (got[2]["added"], got[2]["removed"], got[2]["retained"]) == (0, 0, 1)
    assert got[2]["churn_rate"] == 0.0
    # src 3: link vanished entirely; src 4: brand-new source
    assert (got[3]["added"], got[3]["removed"], got[3]["retained"]) == (0, 1, 0)
    assert (got[4]["added"], got[4]["removed"], got[4]["retained"]) == (1, 0, 0)
    assert set(got) == {1, 2, 3, 4}


def test_sample_frame_indices_rule():
    from graphriccicurvature_spark.operators.multimodal import sample_frame_indices

    assert sample_frame_indices(8, 3) == [0, 3, 7]
    assert sample_frame_indices(2, 3) == [0, 1]      # short video: dedup
    assert sample_frame_indices(1, 3) == [0]
    assert sample_frame_indices(5, 1) == [2]         # k=1: middle frame
    assert sample_frame_indices(10, 4) == [0, 3, 6, 9]
    assert sample_frame_indices(0, 3) == []


def test_frame_sample_decode_and_errors(spark):
    from graphriccicurvature_spark.operators.multimodal import (
        encode_video_raw,
        frame_sample,
    )

    rng = np.random.RandomState(3)
    vid = rng.randint(0, 256, size=(6, 4, 5, 3)).astype(np.uint8)
    rows = [
        (1, bytearray(encode_video_raw(vid))),
        (2, bytearray(b"\x00\x01notavideo")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {(r["id"], r["frame_idx"]): r for r in frame_sample(df, "id", "payload", k=3).collect()}
    # video 1: frames 0, 2, 5 of 6; sums match the raw array exactly
    for fi in (0, 2, 5):
        r = got[(1, fi)]
        sums = vid[fi].reshape(-1, 3).sum(axis=0)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(int(x) for x in sums)
        assert r["n_frames_total"] == 6 and r["decode_error"] is None
    # corrupt + null payloads: one decode_error row each, null frame fields
    for bad in (2, 3):
        r = got[(bad, None)]
        assert r["decode_error"] and r["sum_r"] is None and r["n_frames_total"] is None
    assert len(got) == 5


def test_wav_decode_chunk_walk_and_rejections():
    import struct

    from graphriccicurvature_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    s = (np.arange(64) * 31 % 65536 - 32768).astype(np.int16)
    # insert a LIST chunk between fmt and data: the RIFF walk must skip it
    plain = encode_wav_pcm16(s, 8000)
    fmt_chunk = plain[12:36]
    data_chunk = plain[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size -> padded
    riff_body = b"WAVE" + fmt_chunk + extra + data_chunk
    withlist = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    d, rate = decode_wav_pcm16(withlist)
    assert (d == s).all() and rate == 8000

    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(b"OggS____WAVE")
    # stereo header must be rejected, not misparsed
    stereo = bytearray(plain)
    stereo[22] = 2
    with pytest.raises(ValueError, match="mono"):
        decode_wav_pcm16(bytes(stereo))


def test_audio_features_stats(spark):
    from graphriccicurvature_spark.operators.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    s = np.array([100, -5, 3, 0, -2, 7], dtype=np.int16)
    rows = [(1, bytearray(encode_wav_pcm16(s, 12000))), (2, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r for r in audio_features(df, "id", "payload").collect()}
    r = got[1]
    # crossings: 100->-5, -5->3, -2->7 (0 boundaries are not strict sign flips)
    assert (r["n_samples"], r["sample_rate"], r["sum_abs"], r["zero_crossings"]) == (
        6, 12000, 117, 3)
    assert got[2]["decode_error"] and got[2]["n_samples"] is None


def test_degenerate_params_raise(spark):
    from graphriccicurvature_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="k must be"):
        kmeans_clusters(df, k=0)
    with pytest.raises(ValueError, match="rounds must be"):
        kmeans_clusters(df, k=1, rounds=-1)
    b = spark.createDataFrame([(1, bytearray(b"x"))], "id long, payload binary")
    with pytest.raises(ValueError, match="k must be"):
        frame_sample(b, "id", "payload", k=0)


def test_boilerplate_strip_host_scoped(spark):
    from graphriccicurvature_spark.operators.dedup import boilerplate_strip

    foot_a = "copyright site-a"
    rows = []
    # host a: 4 docs, footer on 3 of 4 (75% >= 50% -> boilerplate)
    for i in range(4):
        body = f"unique body {i}"
        rows.append((i, "a", body + ("\n\n" + foot_a if i < 3 else "")))
    # host b: the SAME footer text appears in only 1 of 3 docs -> content
    rows.append((10, "b", "b text one\n\n" + foot_a))
    rows.append((11, "b", "b text two"))
    rows.append((12, "b", "b text three"))
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {r["doc_id"]: r for r in
           boilerplate_strip(df, min_frac=0.5, min_docs=2).collect()}
    for i in range(3):
        assert got[i]["text"] == f"unique body {i}" and got[i]["n_removed"] == 1
    assert got[3]["n_removed"] == 0
    # host-scoping: same string survives on host b (below b's threshold)
    assert got[10]["text"] == "b text one\n\n" + foot_a and got[10]["n_removed"] == 0
    assert {got[i]["host"] for i in got} == {"a", "b"}

    with pytest.raises(ValueError, match="min_frac"):
        boilerplate_strip(df, min_frac=0.0)
    with pytest.raises(ValueError, match="min_docs"):
        boilerplate_strip(df, min_docs=0)


def test_boilerplate_strip_plan_no_python(spark):
    from graphriccicurvature_spark.operators.dedup import boilerplate_strip

    df = spark.createDataFrame(
        [(1, "h", "x\n\ny")], "doc_id long, host string, text string"
    )
    p = boilerplate_strip(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_cc_incremental_warm_equals_cold(spark):
    from graphriccicurvature_spark.operators.components import connected_components

    rng = np.random.RandomState(5)
    full = [(int(a), int(b)) for a, b in rng.randint(0, 120, size=(200, 2)) if a != b]
    sub = [p for i, p in enumerate(full) if i % 7 != 0]  # "last crawl"
    f = spark.createDataFrame(full, "src long, dst long")
    s = spark.createDataFrame(sub, "src long, dst long")
    cold = {r["node"]: r["component"] for r in connected_components(f).collect()}
    init = connected_components(s)
    warm = {r["node"]: r["component"]
            for r in connected_components(f, init=init).collect()}
    assert warm == cold

    # a node from the old crawl that is isolated in the new edge set must
    # persist (with its old connectivity asserted by its label edge)
    extra = spark.createDataFrame([(999, 0)], "node long, component long")
    warm2 = {r["node"]: r["component"]
             for r in connected_components(f, init=init.union(extra)).collect()}
    assert warm2[999] == cold[0]


def test_url_path_template_rules(spark):
    from graphriccicurvature_spark.operators.urltools import (
        url_path_template,
        url_template_stats,
    )

    rows = [
        (1, "https://a.example/p/123"),
        (2, "https://a.example/p/987?q=1"),
        (3, "https://A.Example/cat/5/item/42/deadbeef01"),
        (4, "https://a.example:443/about#frag"),
        (5, "https://b.example"),
        (6, "https://b.example/session/12345678/x"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    t = {r["id"]: r["t"] for r in
         df.select("id", url_path_template("url").alias("t")).collect()}
    assert t[1] == "/p/{n}" and t[2] == "/p/{n}"          # query excluded
    assert t[3] == "/cat/{n}/item/{n}/{hex}"
    assert t[4] == "/about"                                # fragment excluded
    assert t[5] == "/"                                     # empty path
    assert t[6] == "/session/{hex}/x"                      # long digits = id
    stats = {(r["host"], r["template"]): r["n_urls"]
             for r in url_template_stats(df).collect()}
    assert stats[("a.example", "/p/{n}")] == 2
    assert stats[("a.example", "/cat/{n}/item/{n}/{hex}")] == 1  # host lowercased
    assert stats[("b.example", "/")] == 1
