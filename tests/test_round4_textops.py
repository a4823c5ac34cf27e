"""Round-4 LLM-pipeline text operators: repetition filters, corpus passage
dedup, deterministic hash split, token frequency, host rollup.

Reference scope note: these extend the engine beyond
saibalmars/GraphRicciCurvature (which has no text pipeline); definitions
follow the published Gopher (Rae et al. 2021, §A1.1) and RefinedWeb
repetition/dedup recipes, adapted to word n-gram space.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.operators.textstats import (
    corpus_dup_passages,
    hash_split,
    host_stats,
    repetition_stats,
    token_frequency,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_values(spark):
    df = _docs(
        spark,
        [
            (0, "a a a a"),
            (1, ""),
            (2, "x y"),
            (3, "b c a b c a"),
        ],
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    # doc 0: 4 tokens, 1 distinct -> dup 0.75; g3 = [a a a, a a a] -> dup 0.5;
    # top 2-gram "a a" occurs 3x, len 3, text len 7 (overlaps can push > 1)
    assert out[0]["n_tokens"] == 4
    assert out[0]["dup_token_frac"] == pytest.approx(0.75)
    assert out[0]["dup_3gram_frac"] == pytest.approx(0.5)
    assert out[0]["top_2gram_char_frac"] == pytest.approx(9 / 7)
    # empty text: everything 0
    assert out[1]["n_tokens"] == 0
    assert out[1]["dup_token_frac"] == 0.0
    assert out[1]["dup_3gram_frac"] == 0.0
    assert out[1]["top_2gram_char_frac"] == 0.0
    # 2 tokens: no 3-grams; single 2-gram covers whole text
    assert out[2]["dup_3gram_frac"] == 0.0
    assert out[2]["top_2gram_char_frac"] == pytest.approx(1.0)
    # tie between "b c" and "c a" (2 each) -> lexicographically smallest wins
    assert out[3]["top_2gram_char_frac"] == pytest.approx(2 * 3 / 11)


def test_corpus_dup_passages_shared_detection(spark):
    passage = "one two three four five"
    df = _docs(
        spark,
        [
            (0, f"{passage} alpha beta"),
            (1, f"gamma delta {passage}"),
            (2, "entirely unrelated words here now"),
            (3, "shrt"),  # < 5 tokens -> no shingles
        ],
    )
    out = {r["doc_id"]: r for r in corpus_dup_passages(df, k=5).collect()}
    # docs 0 and 1 share exactly the one 5-gram covering the passage
    assert out[0]["n_shared"] == 1 and out[1]["n_shared"] == 1
    assert out[0]["n_shingles"] == 3  # 7 tokens -> 3 shingles
    assert out[0]["shared_frac"] == pytest.approx(1 / 3)
    assert out[2]["n_shared"] == 0 and out[2]["shared_frac"] == 0.0
    assert out[3]["n_shingles"] == 0 and out[3]["shared_frac"] == 0.0


def test_hash_split_deterministic_and_total(spark):
    df = _docs(spark, [(i, "w " * (i % 5 + 1)) for i in range(200)])
    rows = {r["split"]: r for r in hash_split(df).collect()}
    assert sum(r["n_docs"] for r in rows.values()) == 200
    # replicate the assignment rule driver-side with hashlib
    expect = {"train": 0, "val": 0, "test": 0}
    for i in range(200):
        c = hashlib.md5(str(i).encode()).hexdigest()[0]
        expect["train" if c in "0123456789ab" else "val" if c in "cd" else "test"] += 1
    assert {k: rows[k]["n_docs"] for k in rows} == {
        k: v for k, v in expect.items() if v > 0
    }
    # re-run is bit-identical (no RNG anywhere)
    again = {r["split"]: r["n_docs"] for r in hash_split(df).collect()}
    assert again == {k: r["n_docs"] for k, r in rows.items()}


def test_token_frequency_order_and_ties(spark):
    df = _docs(spark, [(0, "b a b c"), (1, "a c")])
    rows = token_frequency(df, top_n=2).collect()
    # counts: a=2, b=2, c=2 -> tie broken by token asc, top_n cuts at 2
    assert [(r["token"], r["n"]) for r in rows] == [("a", 2), ("b", 2)]


def test_host_stats_rollup(spark):
    from graphriccicurvature_spark.sources.pages import generate_pages, page_text

    pages = generate_pages(spark, 12)
    out = {r["host"]: r for r in host_stats(pages).collect()}
    assert len(out) == 10
    assert out["site0.example"]["n_pages"] == 2  # pages 0 and 10
    assert out["site5.example"]["n_pages"] == 1
    # langs cycle i % 5: site0 holds pages 0 (en) and 10 (en) -> 1 lang
    assert out["site0.example"]["n_langs"] == 1
    exp_tokens = len(page_text(0).split()) + len(page_text(10).split())
    assert out["site0.example"]["n_tokens_total"] == exp_tokens
