"""Round-5f operators: BM25 retrieval, PMI collocations, unigram-KL
quality scoring, bibliographic coupling, rich-club coefficient.

Each is pinned against a from-scratch python recomputation (BM25/PMI/KL
by direct formula over dict counters; bib-coupling by brute-force pair
enumeration; rich-club against networkx.rich_club_coefficient on random
graphs). Driver-level DuckDB value oracles: `bm25_top20`, `pmi_top50`,
`unigram_kl`, `bib_coupling`, `rich_club`.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from graphriccicurvature_spark.operators.linkgraph import bib_coupling, rich_club
from graphriccicurvature_spark.operators.textstats import (
    bm25_topk,
    pmi_pairs,
    unigram_kl,
)

from tests.test_round5_webgraph import _edges_df

DOCS = [
    (0, "the fast scan and the merge window"),
    (1, "merge merge merge scan"),
    (2, "window scan window"),
    (3, ""),
    (4, "hash join order by key"),
    (5, "the window the window the scan"),
    (6, "merge window scan merge window scan"),
]


def _docs_df(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _tokenize(t):
    t = t.strip()
    return t.split() if t else []


class TestBM25:
    def test_matches_python_bm25(self, spark):
        query = ["merge", "scan", "window"]
        got = {
            r["id"]: (r["matched_terms"], r["score"], r["rank"])
            for r in bm25_topk(_docs_df(spark), query, k=10).collect()
        }
        # from-scratch BM25 (Lucene idf), over docs with >= 1 token
        toks = {i: _tokenize(t) for i, t in DOCS}
        lens = {i: len(ts) for i, ts in toks.items() if ts}
        n = len(lens)
        avg = sum(lens.values()) / n
        dfreq = Counter(
            term for i, ts in toks.items() if ts for term in set(ts) if term in query
        )
        exp_scores = {}
        for i, ts in toks.items():
            tf = Counter(t for t in ts if t in query)
            if not tf:
                continue
            s = 0.0
            for term, f in tf.items():
                idf = math.log((n - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1.0)
                s += idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * lens[i] / avg))
            exp_scores[i] = (len(tf), s)
        order = sorted(exp_scores, key=lambda i: (-exp_scores[i][1], i))
        assert set(got) == set(exp_scores)
        for rank, i in enumerate(order, start=1):
            mt, sc, rk = got[i]
            assert mt == exp_scores[i][0]
            assert sc == pytest.approx(exp_scores[i][1], abs=1e-9)
            assert rk == rank

    def test_k_truncates(self, spark):
        out = bm25_topk(_docs_df(spark), ["scan"], k=2).collect()
        assert len(out) == 2
        assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]

    def test_no_match_is_empty(self, spark):
        assert bm25_topk(_docs_df(spark), ["zzz"], k=5).count() == 0


class TestPMI:
    def test_matches_python_pmi(self, spark):
        got = {
            (r["a"], r["b"]): (r["pair_docs"], r["pmi"])
            for r in pmi_pairs(_docs_df(spark), min_pair_docs=2, k=100).collect()
        }
        docsets = {i: set(_tokenize(t)) for i, t in DOCS}
        n = len(DOCS)
        cterm = Counter(t for s in docsets.values() for t in s)
        cpair = Counter(
            (a, b)
            for s in docsets.values()
            for a in s
            for b in s
            if a < b
        )
        exp = {
            p: (c, math.log(c * n / (cterm[p[0]] * cterm[p[1]])))
            for p, c in cpair.items()
            if c >= 2
        }
        assert set(got) == set(exp)
        for p, (c, v) in exp.items():
            assert got[p][0] == c
            assert got[p][1] == pytest.approx(v, abs=1e-9)

    def test_rank_order_and_k(self, spark):
        rows = pmi_pairs(_docs_df(spark), min_pair_docs=2, k=3).collect()
        assert len(rows) == 3
        rows.sort(key=lambda r: r["rank"])
        pmis = [r["pmi"] for r in rows]
        assert pmis == sorted(pmis, reverse=True)


class TestUnigramKL:
    def test_matches_python_kl(self, spark):
        got = {
            r["id"]: (r["n_tokens"], r["kl"])
            for r in unigram_kl(_docs_df(spark)).collect()
        }
        toks = {i: _tokenize(t) for i, t in DOCS}
        marg = Counter(t for ts in toks.values() for t in ts)
        total = sum(marg.values())
        assert set(got) == {i for i, _ in DOCS}
        for i, ts in toks.items():
            if not ts:
                assert got[i] == (0, None)
                continue
            tf = Counter(ts)
            dl = len(ts)
            kl = sum(
                (f / dl) * math.log((f / dl) / (marg[t] / total))
                for t, f in tf.items()
            )
            assert got[i][0] == dl
            assert got[i][1] == pytest.approx(kl, abs=1e-9)

    def test_kl_nonnegative_only_vs_corpus_not_per_doc(self, spark):
        # KL(p_d || q) >= 0 iff q is a probability distribution over a
        # superset of p_d's support, which holds by construction here —
        # but per-doc values can exceed 0 only when the doc differs from
        # the corpus mix; a corpus of identical docs gives kl == 0.
        same = [(i, "a b c") for i in range(4)]
        rows = unigram_kl(_docs_df(spark, same)).collect()
        assert all(r["kl"] == pytest.approx(0.0, abs=1e-12) for r in rows)


class TestBibCoupling:
    EDGES = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11),
        (3, 11), (3, 12),
        (4, 10), (4, 13),
        (5, 13),
    ]

    def test_matches_bruteforce(self, spark):
        got = {
            (r["a"], r["b"]): (r["shared"], r["jaccard"])
            for r in bib_coupling(
                _edges_df(spark, self.EDGES), min_shared=1, max_in_degree=100
            ).collect()
        }
        outs = {}
        for s, d in self.EDGES:
            outs.setdefault(s, set()).add(d)
        exp = {}
        ks = sorted(outs)
        for i, a in enumerate(ks):
            for b in ks[i + 1:]:
                sh = len(outs[a] & outs[b])
                if sh >= 1:
                    exp[(a, b)] = (sh, sh / (len(outs[a]) + len(outs[b]) - sh))
        assert set(got) == set(exp)
        for p, (sh, j) in exp.items():
            assert got[p][0] == sh
            assert got[p][1] == pytest.approx(j, abs=1e-9)

    def test_in_degree_cap_drops_hub_targets(self, spark):
        # targets 10 and 11 have in-degree 3; cap at 2 removes both, so
        # only the overlaps through 12 (sources 1,3) and 13 (sources 4,5)
        # remain
        got = {
            (r["a"], r["b"]): r["shared"]
            for r in bib_coupling(
                _edges_df(spark, self.EDGES), min_shared=1, max_in_degree=2
            ).collect()
        }
        assert got == {(1, 3): 1, (4, 5): 1}

    def test_is_cocitation_of_reversed_edges(self, spark):
        from graphriccicurvature_spark.operators.linkgraph import cocitation_jaccard

        e = _edges_df(spark, self.EDGES)
        rev = e.selectExpr("dst AS src", "src AS dst", "weight")
        a = sorted(
            (r["a"], r["b"], r["shared"])
            for r in bib_coupling(e, min_shared=1, max_in_degree=100).collect()
        )
        b = sorted(
            (r["a"], r["b"], r["shared"])
            for r in cocitation_jaccard(rev, min_shared=1, max_out_degree=100).collect()
        )
        assert a == b


class TestRichClub:
    def _nx_rich_club(self, pairs):
        import networkx as nx

        g = nx.Graph()
        g.add_edges_from(pairs)
        return nx.rich_club_coefficient(g, normalized=False)

    def test_matches_networkx_random(self, spark):
        rng = random.Random(7)
        nodes = list(range(24))
        pairs = set()
        while len(pairs) < 60:
            a, b = rng.sample(nodes, 2)
            pairs.add((min(a, b), max(a, b)))
        got = {
            r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
            for r in rich_club(_edges_df(spark, sorted(pairs))).collect()
        }
        exp = self._nx_rich_club(sorted(pairs))
        # networkx stops at the last k with >= 2 surviving nodes; we emit
        # every k < max_degree and mark the degenerate tail with phi NULL
        assert set(exp) <= set(got)
        for k in set(got) - set(exp):
            assert got[k][0] < 2 and got[k][2] is None
        for k, phi in exp.items():
            assert got[k][2] == pytest.approx(phi, abs=1e-9)

    def test_star_graph_closed_form(self, spark):
        # star K_{1,5}: hub degree 5, leaves degree 1. For k=0 all 6 nodes
        # and 5 edges survive: phi(0)=2*5/(6*5)=1/3. For 1<=k<=4 only the
        # hub survives (n_nodes=1 -> phi NULL).
        pairs = [(0, i) for i in range(1, 6)]
        rows = {r["k"]: r for r in rich_club(_edges_df(spark, pairs)).collect()}
        assert set(rows) == {0, 1, 2, 3, 4}
        assert rows[0]["n_nodes"] == 6 and rows[0]["n_edges"] == 5
        assert rows[0]["phi"] == pytest.approx(1 / 3, abs=1e-12)
        for k in (1, 2, 3, 4):
            assert rows[k]["n_nodes"] == 1 and rows[k]["phi"] is None

    def test_clique_is_all_ones(self, spark):
        pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        rows = rich_club(_edges_df(spark, pairs)).collect()
        # K5: every node degree 4 -> thresholds 0..3 all keep the full
        # clique, phi = 1 everywhere
        assert {r["k"] for r in rows} == {0, 1, 2, 3}
        assert all(r["phi"] == pytest.approx(1.0, abs=1e-12) for r in rows)


class TestTrussNumber:
    @staticmethod
    def _brute_truss(pairs):
        """Reference peel: trussness per canonical edge, python fixpoint."""
        edges = {(min(a, b), max(a, b)) for a, b in pairs}
        truss = {e: 2 for e in edges}
        cur = set(edges)
        k = 3
        while cur:
            changed = True
            while changed:
                nbrs = {}
                for a, b in cur:
                    nbrs.setdefault(a, set()).add(b)
                    nbrs.setdefault(b, set()).add(a)
                drop = {
                    (a, b)
                    for a, b in cur
                    if len(nbrs[a] & nbrs[b]) < k - 2
                }
                changed = bool(drop)
                cur -= drop
            for e in cur:
                truss[e] = k
            k += 1
        return truss

    def test_matches_bruteforce_random(self, spark):
        rng = random.Random(11)
        nodes = list(range(18))
        pairs = set()
        while len(pairs) < 50:
            a, b = rng.sample(nodes, 2)
            pairs.add((min(a, b), max(a, b)))
        from graphriccicurvature_spark.operators.linkgraph import truss_number

        got = {
            (r["src"], r["dst"]): r["truss"]
            for r in truss_number(_edges_df(spark, sorted(pairs))).collect()
        }
        assert got == self._brute_truss(pairs)

    def test_clique_and_pendant(self, spark):
        from graphriccicurvature_spark.operators.linkgraph import truss_number

        # K4 on {0..3} (every edge support 2 -> truss 4) + pendant 3-4
        pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 4)]
        got = {
            (r["src"], r["dst"]): r["truss"]
            for r in truss_number(_edges_df(spark, pairs)).collect()
        }
        assert got[(3, 4)] == 2
        assert all(v == 4 for e, v in got.items() if e != (3, 4))

    def test_bounded_rounds_matches_fixpoint_when_deep_enough(self, spark):
        from graphriccicurvature_spark.operators.linkgraph import truss_number

        # chain of triangles: peeling cascades, needs >1 round per k
        pairs = [(i, i + 1) for i in range(6)] + [(i, i + 2) for i in range(5)]
        fix = {
            (r["src"], r["dst"]): r["truss"]
            for r in truss_number(_edges_df(spark, pairs)).collect()
        }
        bnd = {
            (r["src"], r["dst"]): r["truss"]
            for r in truss_number(
                _edges_df(spark, pairs), max_k=5, rounds=8
            ).collect()
        }
        assert fix == bnd == self._brute_truss(pairs)


class TestDocPerplexity:
    def test_matches_python(self, spark):
        from graphriccicurvature_spark.operators.textstats import doc_perplexity

        got = {
            r["id"]: (r["n_tokens"], r["cross_entropy"], r["ppl"])
            for r in doc_perplexity(_docs_df(spark)).collect()
        }
        toks = {i: _tokenize(t) for i, t in DOCS}
        marg = Counter(t for ts in toks.values() for t in ts)
        total = sum(marg.values())
        assert set(got) == {i for i, _ in DOCS}
        for i, ts in toks.items():
            if not ts:
                assert got[i] == (0, None, None)
                continue
            ce = -sum(math.log(marg[t] / total) for t in ts) / len(ts)
            assert got[i][0] == len(ts)
            assert got[i][1] == pytest.approx(ce, abs=1e-9)
            assert got[i][2] == pytest.approx(math.exp(ce), abs=1e-9)

    def test_uniform_corpus_ppl_equals_vocab_size(self, spark):
        from graphriccicurvature_spark.operators.textstats import doc_perplexity

        # every token equally frequent -> q(t) = 1/V -> ppl = V exactly
        docs = [(0, "a b c d"), (1, "d c b a")]
        rows = doc_perplexity(_docs_df(spark, docs)).collect()
        assert all(r["ppl"] == pytest.approx(4.0, abs=1e-9) for r in rows)
