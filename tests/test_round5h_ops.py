"""Round-5h operators: BPE-ish pre-tokenizer token budgeting
(`bpe_token_stats`), Luby maximal independent set, and greedy maximal
matching — each pinned against a from-scratch pure-python reference.

Driver-level DuckDB value oracles: `bpe_tokens`, `luby_mis_4`,
`maximal_matching_4`.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.operators.textstats import bpe_token_stats


def _ref_pretokenize(text: str) -> list[str]:
    """Scanner reference for BPE_PRETOKEN_PATTERN: an optional leading
    space followed by a letter run, digit run, or non-space-punct run."""
    out, i, n = [], 0, len(text)
    while i < n:
        j = i
        if text[j] == " " and j + 1 < n and not text[j + 1].isspace():
            j += 1
        if j < n and text[j].isalpha():
            k = j
            while k < n and text[k].isalpha():
                k += 1
        elif j < n and text[j].isdigit():
            k = j
            while k < n and text[k].isdigit():
                k += 1
        elif j < n and not text[j].isspace():
            k = j
            while k < n and not (
                text[k].isspace() or text[k].isalpha() or text[k].isdigit()
            ):
                k += 1
        else:
            i += 1
            continue
        out.append(text[i:k])
        i = k
    return out


class TestBpeTokenStats:
    CASES = [
        "Hello, world! It's 2026.",
        "  foo   bar42 baz_qux",
        "",
        "   ",
        "a-b--c 3.14",
        "don't stop me now!!",
        "tabs\tand\nnewlines mix 12x3",
    ]

    def test_matches_scanner_reference(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.CASES)], ["doc_id", "text"]
        )
        got = {
            r["doc_id"]: r for r in bpe_token_stats(df).collect()
        }
        for i, t in enumerate(self.CASES):
            ref_bpe = len(_ref_pretokenize(t))
            ref_ws = len(t.split())
            assert got[i]["n_bpe_tokens"] == ref_bpe, (t, _ref_pretokenize(t))
            assert got[i]["n_ws_tokens"] == ref_ws
            want_fert = ref_bpe / ref_ws if ref_ws else 0.0
            assert got[i]["fertility"] == pytest.approx(want_fert, abs=1e-12)

    def test_random_ascii_property(self, spark):
        rng = random.Random(7)
        alphabet = "ab1 .,-\t"
        cases = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
            for _ in range(40)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(cases)], ["doc_id", "text"]
        )
        got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_stats(df).collect()}
        for i, t in enumerate(cases):
            assert got[i] == len(_ref_pretokenize(t)), repr(t)

    def test_fertility_above_one_on_punctuated_text(self, spark):
        df = spark.createDataFrame(
            [(0, "well, this text has: punctuation; lots of it!")],
            ["doc_id", "text"],
        )
        row = bpe_token_stats(df).collect()[0]
        assert row["n_bpe_tokens"] > row["n_ws_tokens"]
        assert row["fertility"] > 1.0


def _random_edges(seed, n=30, p=0.15):
    rng = random.Random(seed)
    return [
        (u, v) for u in range(n) for v in range(u + 1, n) if rng.random() < p
    ]


def _ref_luby(edges, priority):
    """Round-for-round python replay of luby_mis's md5 priorities."""
    nodes = sorted({u for e in edges for u in e})
    adj = {u: set() for u in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    active = set(nodes)
    decided = {}
    r = 0
    while active:
        r += 1
        winners = {
            u
            for u in active
            if all(
                (priority(u), u) < (priority(v), v)
                for v in adj[u]
                if v in active
            )
        }
        knocked = {v for u in winners for v in adj[u] if v in active} - winners
        for u in winners:
            decided[u] = (True, r)
        for v in knocked:
            decided[v] = (False, r)
        active -= winners | knocked
    return decided


def _ref_matching(edges, priority):
    active = {(u, v) for u, v in edges}
    matched = {}
    r = 0
    while active:
        r += 1
        winners = set()
        for e in active:
            u, v = e
            key = (priority(e), u, v)
            ok = all(
                key <= (priority(f), f[0], f[1])
                for f in active
                if u in f or v in f
            )
            if ok:
                winners.add(e)
        used = {x for e in winners for x in e}
        for e in winners:
            matched[e] = r
        active = {e for e in active if e[0] not in used and e[1] not in used}
    return matched


def _md5_node(u):
    import hashlib

    return hashlib.md5(str(u).encode()).hexdigest()


def _md5_edge(e):
    import hashlib

    return hashlib.md5(f"{e[0]}|{e[1]}".encode()).hexdigest()


class TestLubyMis:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_matches_reference_fixpoint(self, spark, seed):
        from graphriccicurvature_spark.operators.mis import luby_mis

        edges = _random_edges(seed)
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], ["src", "dst", "weight"]
        )
        got = {
            r["node"]: (r["in_mis"], r["round"])
            for r in luby_mis(df).collect()
        }
        assert got == _ref_luby(edges, _md5_node)

    def test_mis_invariants(self, spark):
        from graphriccicurvature_spark.operators.mis import luby_mis

        edges = _random_edges(9, n=40, p=0.2)
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], ["src", "dst", "weight"]
        )
        rows = luby_mis(df, priority="xxhash64").collect()
        mis = {r["node"] for r in rows if r["in_mis"]}
        out = {r["node"] for r in rows if not r["in_mis"]}
        nodes = {u for e in edges for u in e}
        assert mis | out == nodes and not (mis & out)
        adj = {u: set() for u in nodes}
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        # independence + maximality
        assert all(not (adj[u] & mis) for u in mis)
        assert all(adj[u] & mis for u in out)

    def test_bounded_rounds_prefix_of_fixpoint(self, spark):
        from graphriccicurvature_spark.operators.mis import luby_mis

        edges = _random_edges(4)
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], ["src", "dst", "weight"]
        )
        full = {
            (r["node"], r["in_mis"], r["round"])
            for r in luby_mis(df).collect()
        }
        bounded = {
            (r["node"], r["in_mis"], r["round"])
            for r in luby_mis(df, rounds=2).collect()
        }
        assert bounded == {t for t in full if t[2] <= 2}


class TestMaximalMatching:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_matches_reference_fixpoint(self, spark, seed):
        from graphriccicurvature_spark.operators.mis import maximal_matching

        edges = _random_edges(seed)
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], ["src", "dst", "weight"]
        )
        got = {
            (r["src"], r["dst"]): r["round"]
            for r in maximal_matching(df).collect()
        }
        assert got == _ref_matching(edges, _md5_edge)

    def test_matching_invariants(self, spark):
        from graphriccicurvature_spark.operators.mis import maximal_matching

        edges = _random_edges(11, n=40, p=0.2)
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], ["src", "dst", "weight"]
        )
        got = [(r["src"], r["dst"]) for r in maximal_matching(df, priority="xxhash64").collect()]
        used = [x for e in got for x in e]
        assert len(used) == len(set(used))  # a matching
        # maximality: every unmatched edge touches a matched endpoint
        us = set(used)
        assert all(u in us or v in us for u, v in edges)
