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


def _ref_jp(edges, priority):
    """Round-for-round python replay of jp_coloring: winners are strict
    local priority minima among uncolored nodes; each takes the mex of
    its PRE-ROUND colored neighborhood (winners are independent, so the
    snapshot choice cannot matter)."""
    nodes = sorted({u for e in edges for u in e})
    adj = {u: set() for u in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    active = set(nodes)
    colored = {}
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
        snapshot = dict(colored)
        for u in winners:
            used = {snapshot[v][0] for v in adj[u] if v in snapshot}
            c = 0
            while c in used:
                c += 1
            colored[u] = (c, r)
        active -= winners
    return colored


class TestJpColoring:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_matches_reference_fixpoint(self, spark, seed):
        from graphriccicurvature_spark.operators.mis import jp_coloring

        edges = _random_edges(seed)
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], ["src", "dst", "weight"]
        )
        got = {
            r["node"]: (r["color"], r["round"])
            for r in jp_coloring(df).collect()
        }
        assert got == _ref_jp(edges, _md5_node)

    def test_proper_coloring_invariants(self, spark):
        from graphriccicurvature_spark.operators.mis import jp_coloring

        edges = _random_edges(13, n=40, p=0.2)
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], ["src", "dst", "weight"]
        )
        rows = jp_coloring(df, priority="xxhash64").collect()
        col = {r["node"]: r["color"] for r in rows}
        nodes = {u for e in edges for u in e}
        assert set(col) == nodes
        assert all(col[u] != col[v] for u, v in edges)
        deg = {u: 0 for u in nodes}
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        assert max(col.values()) <= max(deg.values())  # <= Delta+1 colors


class TestSquareCount:
    @staticmethod
    def _brute_c4(edges):
        """Enumerate every 4-node subset; each contributes one C4 per
        diagonal pairing whose four rim edges are present (up to 3)."""
        from itertools import combinations

        es = {frozenset(e) for e in edges}
        nodes = sorted({u for e in edges for u in e})

        def cyc(a, b, c, d):
            # cycle a-c-b-d-a (diagonals {a,b} and {c,d})
            return all(
                frozenset(p) in es for p in [(a, c), (c, b), (b, d), (d, a)]
            )

        n = 0
        for w, x, y, z in combinations(nodes, 4):
            n += cyc(w, x, y, z) + cyc(w, y, x, z) + cyc(w, z, x, y)
        return n

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_matches_subset_enumeration(self, spark, seed):
        from graphriccicurvature_spark.operators.triangles import square_count

        edges = _random_edges(seed, n=22, p=0.2)
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], ["src", "dst", "weight"]
        )
        got = square_count(df).collect()[0]["n_squares"]
        assert got == self._brute_c4(edges)

    def test_single_square(self, spark):
        from graphriccicurvature_spark.operators.triangles import square_count

        df = spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)],
            ["src", "dst", "weight"],
        )
        r = square_count(df).collect()[0]
        assert r["n_squares"] == 1


class TestDupClusterHistogram:
    def test_crafted_clusters(self, spark):
        from graphriccicurvature_spark.operators.dedup import dup_cluster_histogram

        docs = [
            (0, "aaa"), (1, "aaa"), (2, "aaa"),   # cluster of 3
            (3, "bbb"), (4, "bbb"),               # cluster of 2
            (5, "ccc"), (6, "ddd"),               # two singletons
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r["cluster_size"]: (r["n_clusters"], r["n_docs"])
            for r in dup_cluster_histogram(df).collect()
        }
        assert got == {3: (1, 3), 2: (1, 2), 1: (2, 2)}

    def test_prefix_canonicalization_merges_heads(self, spark):
        from graphriccicurvature_spark.operators.dedup import dup_cluster_histogram

        df = spark.createDataFrame(
            [(0, "same head X tail one"), (1, "same head X tail two")],
            ["doc_id", "text"],
        )
        exact = {r["cluster_size"] for r in dup_cluster_histogram(df).collect()}
        pref = {
            r["cluster_size"]
            for r in dup_cluster_histogram(df, prefix=11).collect()
        }
        assert exact == {1} and pref == {2}


class TestRobustnessReport:
    def test_star_graph_shatters(self, spark):
        """A star: removing the single hub (k=1) drops the giant component
        from n to 1 (all leaves become singletons)."""
        from graphriccicurvature_spark.operators.webgraph import robustness_report

        n = 12
        df = spark.createDataFrame(
            [(0, v, 1.0) for v in range(1, n)], ["src", "dst", "weight"]
        )
        r = robustness_report(df, k=1).collect()[0]
        assert r["k_removed"] == 1
        assert r["n_nodes"] == n
        assert r["giant_before"] == n
        assert r["giant_after"] == 1
        assert r["n_edges_after"] == 0

    def test_matches_networkx(self, spark):
        import networkx as nx

        from graphriccicurvature_spark.operators.webgraph import robustness_report

        edges = _random_edges(21, n=40, p=0.1)
        g = nx.Graph(edges)
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], ["src", "dst", "weight"]
        )
        k = 5
        r = robustness_report(df, k=k).collect()[0]
        deg = sorted(g.degree(), key=lambda t: (-t[1], t[0]))
        hubs = {u for u, _ in deg[:k]}
        h = g.copy()
        h.remove_nodes_from(hubs)
        assert r["giant_before"] == max(len(c) for c in nx.connected_components(g))
        want_after = max(
            (len(c) for c in nx.connected_components(h)), default=0
        ) if h.number_of_nodes() else 0
        # isolated survivors count as singleton components
        want_after = max(want_after, 1 if h.number_of_nodes() else 0)
        assert r["giant_after"] == want_after
        assert r["n_edges_after"] == h.number_of_edges()


class TestSimrank:
    @staticmethod
    def _ref_simrank(edges, n, k, c=0.8):
        """Dense-matrix SimRank reference (Jeh & Widom 2002 eq. 1)."""
        import numpy as np

        inn = {v: [] for v in range(n)}
        for u, v in edges:
            if u != v:
                inn[v].append(u)
        R = np.eye(n)
        for _ in range(k):
            nxt = np.eye(n)
            for a in range(n):
                for b in range(n):
                    if a == b or not inn[a] or not inn[b]:
                        continue
                    s = sum(R[i, j] for i in inn[a] for j in inn[b])
                    nxt[a, b] = c * s / (len(inn[a]) * len(inn[b]))
            R = nxt
        return R

    @pytest.mark.parametrize("seed", [1, 2])
    def test_matches_matrix_reference(self, spark, seed):
        from graphriccicurvature_spark.operators.linkgraph import simrank

        rng = random.Random(seed)
        n = 14
        edges = sorted(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(40)
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], ["src", "dst", "weight"]
        )
        got = {
            (r["a"], r["b"]): r["score"] for r in simrank(df, num_iterations=2).collect()
        }
        R = self._ref_simrank(edges, n, 2)
        want = {
            (a, b): R[a, b]
            for a in range(n)
            for b in range(a + 1, n)
            if R[a, b] > 0
        }
        assert set(got) == set(want)
        for p, v in want.items():
            assert got[p] == pytest.approx(v, abs=1e-9), p

    def test_scores_bounded(self, spark):
        from graphriccicurvature_spark.operators.linkgraph import simrank

        edges = _random_edges(5, n=25, p=0.15)
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], ["src", "dst", "weight"]
        )
        rows = simrank(df, num_iterations=2).collect()
        assert rows
        assert all(0 < r["score"] <= 0.8 + 1e-12 for r in rows)


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
