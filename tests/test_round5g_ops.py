"""Round-5g operators: global transitivity, degree power-law exponent
MLE, quality-preferring dedup survivor selection, and the corpus-unigram
perplexity already pinned in test_round5f_ops.

Transitivity is pinned against ``nx.transitivity`` on random graphs,
the power-law alpha against a from-scratch Clauset-Shalizi-Newman MLE,
and keep-best survivors against a brute-force per-cluster argmax.
Driver-level DuckDB value oracles: `transitivity`, `degree_powerlaw`,
`minhash_keep_best`.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import networkx as nx
import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.operators.degrees import degree_powerlaw
from graphriccicurvature_spark.operators.triangles import transitivity

from tests.test_round5_webgraph import _edges_df


def _random_graph(seed, n=40, p=0.12):
    rng = random.Random(seed)
    g = nx.Graph()
    g.add_nodes_from(range(n))
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() < p:
                g.add_edge(u, v)
    return g


class TestTransitivity:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_matches_networkx(self, spark, seed):
        g = _random_graph(seed)
        row = transitivity(_edges_df(spark, list(g.edges()))).collect()[0]
        tri = sum(nx.triangles(g).values()) // 3
        wed = sum(d * (d - 1) // 2 for _, d in g.degree())
        assert row["n_triangles"] == tri
        assert row["n_wedges"] == wed
        assert row["transitivity"] == pytest.approx(
            nx.transitivity(g), abs=1e-12
        )

    def test_wedge_free_graph_is_zero(self, spark):
        # perfect matching: every degree is 1, no wedges at all
        row = transitivity(_edges_df(spark, [(0, 1), (2, 3)])).collect()[0]
        assert (row["n_triangles"], row["n_wedges"], row["transitivity"]) == (
            0,
            0,
            0.0,
        )


class TestDegreePowerlaw:
    @pytest.mark.parametrize("dmin", [2, 3])
    def test_matches_formula(self, spark, dmin):
        g = _random_graph(7, n=60, p=0.08)
        row = degree_powerlaw(_edges_df(spark, list(g.edges())), dmin=dmin).collect()[0]
        tail = [d for _, d in g.degree() if d >= dmin]
        alpha = 1.0 + len(tail) / sum(math.log(d / (dmin - 0.5)) for d in tail)
        assert row["dmin"] == dmin
        assert row["n_tail"] == len(tail)
        assert row["alpha"] == pytest.approx(alpha, abs=1e-9)

    def test_empty_tail_gives_null_alpha(self, spark):
        row = degree_powerlaw(
            _edges_df(spark, [(0, 1), (2, 3)]), dmin=5
        ).collect()[0]
        assert (row["n_tail"], row["alpha"]) == (0, None)

    def test_rejects_bad_dmin(self, spark):
        with pytest.raises(ValueError):
            degree_powerlaw(_edges_df(spark, [(0, 1)]), dmin=0)


class TestKeepBestSurvivors:
    def test_survivor_is_quality_argmax_not_min_id(self, spark):
        from graphriccicurvature_spark.operators.dedup import keep_best_survivors
        from graphriccicurvature_spark.operators.textstats import quality_score

        # doc 1 is a longer, higher-quality variant of doc 0's cluster;
        # doc 2 is a singleton
        docs = spark.createDataFrame(
            [
                (0, "alpha beta gamma"),
                (1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "totally unrelated text here"),
            ],
            "doc_id long, text string",
        )
        clusters = spark.createDataFrame(
            [(0, 0), (1, 0), (2, 2)], "doc_id long, cluster long"
        )
        got = {
            r["doc_id"]: (r["cluster"], r["is_survivor"], r["quality"])
            for r in keep_best_survivors(docs, clusters).collect()
        }
        q = {
            r["doc_id"]: r["quality"]
            for r in quality_score(docs).select("doc_id", "quality").collect()
        }
        assert q[1] > q[0]  # longer doc scores higher on the length band
        assert got[0] == (0, False, q[0])
        assert got[1] == (0, True, q[1])
        assert got[2] == (2, True, q[2])

    def test_exactly_one_survivor_per_cluster_tie_breaks_min_id(self, spark):
        from graphriccicurvature_spark.operators.dedup import keep_best_survivors

        # identical texts -> identical quality -> min id wins the tie
        docs = spark.createDataFrame(
            [(5, "same text twin"), (3, "same text twin"), (9, "other")],
            "doc_id long, text string",
        )
        clusters = spark.createDataFrame(
            [(5, 3), (3, 3), (9, 9)], "doc_id long, cluster long"
        )
        rows = keep_best_survivors(docs, clusters).collect()
        surv = {r["cluster"]: r["doc_id"] for r in rows if r["is_survivor"]}
        assert surv == {3: 3, 9: 9}
        assert sum(r["is_survivor"] for r in rows) == 2

    def test_composes_with_minhash_pipeline(self, spark):
        from graphriccicurvature_spark.operators.dedup import (
            keep_best_survivors,
            minhash_dedup,
        )

        base = "spark shuffle partition join broadcast skew salt window " * 3
        docs = spark.createDataFrame(
            [
                (0, base),
                (1, base + "extra tail tokens improve the quality band score"),
                (2, "completely different little doc"),
            ],
            "doc_id long, text string",
        )
        clusters = minhash_dedup(docs, jaccard_threshold=0.5)
        got = {
            r["doc_id"]: (r["cluster"], r["is_survivor"])
            for r in keep_best_survivors(docs, clusters).collect()
        }
        # 0 and 1 are near-dups -> one cluster; 1 is the better doc
        assert got[0][0] == got[1][0]
        assert got[1][1] and not got[0][1]
        assert got[2][1]


def _kruskal(edges):
    """Brute Kruskal under the (weight, src, dst) total order — the exact
    semantics minimum_spanning_forest promises on ties."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, u, v in sorted((w, min(u, v), max(u, v)) for u, v, w in edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            out.add((u, v, w))
    return out


class TestMinimumSpanningForest:
    def _spark_msf(self, spark, edges, **kw):
        from graphriccicurvature_spark.operators.spanning import (
            minimum_spanning_forest,
        )

        df = spark.createDataFrame(
            [(int(u), int(v), float(w)) for u, v, w in edges],
            "src long, dst long, weight double",
        )
        return {
            (min(r.src, r.dst), max(r.src, r.dst), r.weight)
            for r in minimum_spanning_forest(df, **kw).collect()
        }

    @pytest.mark.parametrize("seed", [1, 5])
    def test_matches_networkx_distinct_weights(self, spark, seed):
        rng = random.Random(seed)
        g = _random_graph(seed, n=35, p=0.12)
        ws = list(range(1, g.number_of_edges() + 1))
        rng.shuffle(ws)
        edges = [
            (u, v, float(w)) for (u, v), w in zip(sorted(g.edges()), ws)
        ]
        for u, v, w in edges:
            g[u][v]["weight"] = w
        exp = {
            (min(u, v), max(u, v), float(d["weight"]))
            for u, v, d in nx.minimum_spanning_edges(g, data=True)
        }
        assert self._spark_msf(spark, edges) == exp

    def test_constant_weights_tie_break_matches_kruskal(self, spark):
        g = _random_graph(9, n=25, p=0.15)
        edges = [(u, v, 1.0) for u, v in g.edges()]
        assert self._spark_msf(spark, edges) == _kruskal(edges)

    def test_bounded_rounds_equal_fixpoint(self, spark):
        g = _random_graph(3, n=30, p=0.1)
        edges = [(u, v, 1.0) for u, v in g.edges()]
        assert self._spark_msf(spark, edges, rounds=8) == self._spark_msf(
            spark, edges
        )

    def test_forest_spans_multiple_components(self, spark):
        edges = [(0, 1, 2.0), (1, 2, 1.0), (0, 2, 3.0), (10, 11, 5.0)]
        got = self._spark_msf(spark, edges)
        assert got == {(0, 1, 2.0), (1, 2, 1.0), (10, 11, 5.0)}


class TestDsirLogRatio:
    DOCS = [
        (0, "the fast scan and the merge window"),
        (1, "merge merge merge scan"),
        (2, "window scan window"),
        (3, ""),
        (4, "hash join order by key"),
        (5, "the window the window the scan"),
    ]
    TARGET = [0, 5]  # the "the ... window"-flavored docs

    def _got(self, spark):
        from graphriccicurvature_spark.operators.textstats import dsir_log_ratio

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        tgt = spark.createDataFrame([(i,) for i in self.TARGET], "doc_id long")
        return {
            r["id"]: (r["n_tokens"], r["log_ratio"], r["avg_log_ratio"])
            for r in dsir_log_ratio(docs, tgt).collect()
        }

    def test_matches_python(self, spark):
        got = self._got(spark)
        toks = {i: t.split() for i, t in self.DOCS}
        mq = Counter(t for ts in toks.values() for t in ts)
        mp = Counter(t for i in self.TARGET for t in toks[i])
        n_q, n_p, v = sum(mq.values()), sum(mp.values()), len(mq)
        for i, ts in toks.items():
            if not ts:
                assert got[i] == (0, None, None)
                continue
            lr = sum(
                math.log((mp.get(t, 0) + 1) / (n_p + v)) - math.log(mq[t] / n_q)
                for t in ts
            )
            assert got[i][0] == len(ts)
            assert got[i][1] == pytest.approx(lr, abs=1e-9)
            assert got[i][2] == pytest.approx(lr / len(ts), abs=1e-9)

    def test_target_docs_score_higher(self, spark):
        # the defining DSIR property: docs from the target vocabulary get
        # higher avg log-ratio than docs from a disjoint vocabulary
        from graphriccicurvature_spark.operators.textstats import dsir_log_ratio

        docs = spark.createDataFrame(
            [
                (0, "alpha beta gamma alpha beta"),
                (1, "alpha gamma beta beta"),
                (2, "delta epsilon zeta delta epsilon"),
                (3, "zeta epsilon delta delta"),
            ],
            "doc_id long, text string",
        )
        tgt = spark.createDataFrame([(0,), (1,)], "doc_id long")
        got = {
            r["id"]: r["avg_log_ratio"]
            for r in dsir_log_ratio(docs, tgt).collect()
        }
        assert min(got[0], got[1]) > max(got[2], got[3])


class TestClosenessCentrality:
    @pytest.mark.parametrize("radius", [1, 2, 3])
    def test_matches_networkx_reach(self, spark, radius):
        from graphriccicurvature_spark.operators.linkgraph import (
            closeness_centrality,
        )

        g = _random_graph(4, n=30, p=0.1)
        g.remove_nodes_from(list(nx.isolates(g)))
        got = {
            r["node"]: (r["n_reached"], r["sum_dist"], r["closeness"])
            for r in closeness_centrality(
                _edges_df(spark, list(g.edges())), radius=radius
            ).collect()
        }
        for v in g.nodes():
            dists = nx.single_source_shortest_path_length(g, v, cutoff=radius)
            del dists[v]
            assert got[v][0] == len(dists)
            assert got[v][1] == sum(dists.values())
            assert got[v][2] == pytest.approx(
                len(dists) / sum(dists.values()), abs=1e-12
            )


class TestLouvainMoves:
    def _cliques(self, sizes, bases):
        edges = []
        for base, s in zip(bases, sizes):
            for u in range(s):
                for v in range(u + 1, s):
                    edges.append((base + u, base + v, 1.0))
        return edges

    def test_recovers_planted_cliques(self, spark):
        from graphriccicurvature_spark.operators.louvain import louvain_moves

        edges = self._cliques([5, 5, 4], [0, 10, 20])
        edges += [(0, 10, 1.0), (10, 20, 1.0)]  # sparse bridges
        e = spark.createDataFrame(edges, "src long, dst long, weight double")
        lab = {r.node: r.community for r in louvain_moves(e, rounds=4).collect()}
        groups = {}
        for n, c in lab.items():
            groups.setdefault(c, set()).add(n)
        assert sorted(map(sorted, groups.values())) == [
            list(range(0, 5)),
            list(range(10, 15)),
            list(range(20, 24)),
        ]

    def test_deterministic_across_runs(self, spark):
        from graphriccicurvature_spark.operators.louvain import louvain_moves

        g = _random_graph(13, n=40, p=0.15)
        e = _edges_df(spark, list(g.edges()))
        a = sorted(map(tuple, louvain_moves(e, rounds=3).collect()))
        b = sorted(map(tuple, louvain_moves(e, rounds=3).collect()))
        assert a == b

    def test_improves_modularity_over_singletons(self, spark):
        from graphriccicurvature_spark.operators.louvain import louvain_moves
        from graphriccicurvature_spark.operators.webgraph import (
            partition_modularity,
        )
        from graphriccicurvature_spark.sources.edges import canonicalize

        edges = self._cliques([6, 6], [0, 10]) + [(3, 12, 1.0)]
        e = canonicalize(
            spark.createDataFrame(edges, "src long, dst long, weight double")
        )
        part = louvain_moves(e, rounds=4).select(
            "node", F.col("community").alias("component")
        )
        q = partition_modularity(e, part).collect()[0]
        # singleton partition has Q < 0; the planted two-clique split is
        # the optimum here at Q ~ 0.46
        assert q["n_components"] == 2
        assert q["modularity"] > 0.4

    def test_rejects_bad_rounds(self, spark):
        from graphriccicurvature_spark.operators.louvain import louvain_moves

        with pytest.raises(ValueError):
            louvain_moves(_edges_df(spark, [(0, 1)]), rounds=0)


class TestNgramContamination:
    def test_matches_python(self, spark):
        from graphriccicurvature_spark.operators.textstats import (
            ngram_contamination,
        )
        import hashlib

        # n=3 for a hand-checkable fixture; ids span md5 splits
        docs = [(i, f"w{i % 4} common phrase here tail{i}") for i in range(40)]
        got = {
            r["id"]: (r["split"], r["n_shingles"], r["n_contaminated"], r["is_contaminated"])
            for r in ngram_contamination(
                spark.createDataFrame(docs, "doc_id long, text string"),
                n=3,
                max_train_df=50,
            ).collect()
        }

        def split(i):
            c = hashlib.md5(str(i).encode()).hexdigest()[0]
            return "train" if c in "0123456789ab" else ("val" if c in "cd" else "test")

        def sh(t, n=3):
            ts = t.split()
            return {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}

        train = set()
        for i, t in docs:
            if split(i) == "train":
                train |= sh(t)
        evals = [(i, t) for i, t in docs if split(i) != "train"]
        assert set(got) == {i for i, _ in evals}
        for i, t in evals:
            s = sh(t)
            hits = len(s & train)
            assert got[i] == (split(i), len(s), hits, hits > 0)

    def test_train_df_cap_drops_boilerplate(self, spark):
        from graphriccicurvature_spark.operators.textstats import (
            ngram_contamination,
        )

        # "a b c" appears in every train doc; with cap 1 it must not count
        docs = [(i, "a b c") for i in range(30)]
        rows = ngram_contamination(
            spark.createDataFrame(docs, "doc_id long, text string"),
            n=3,
            max_train_df=1,
        ).collect()
        assert rows and all(not r["is_contaminated"] for r in rows)

    def test_short_docs_are_clean(self, spark):
        from graphriccicurvature_spark.operators.textstats import (
            ngram_contamination,
        )

        docs = [(i, "too short") for i in range(20)]
        rows = ngram_contamination(
            spark.createDataFrame(docs, "doc_id long, text string"), n=13
        ).collect()
        assert rows and all(
            r["n_shingles"] == 0 and not r["is_contaminated"] for r in rows
        )


class TestWeightedSampleTopk:
    def test_matches_python_ares(self, spark):
        from graphriccicurvature_spark.operators.filtering import (
            weighted_sample_topk,
        )
        import hashlib

        rows = [(i, float(1 + (i * 7) % 13)) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = [
            (r["doc_id"], r["priority"])
            for r in weighted_sample_topk(df, "doc_id", "w", k=10).collect()
        ]

        def pri(i, w):
            u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32
            u = max(u, 1.0 / 2**32 / 2.0)
            return -math.log(u) / w

        exp = sorted(((pri(i, w), i) for i, w in rows))[:10]
        got_sorted = sorted((p, i) for i, p in got)
        assert [i for _, i in got_sorted] == [i for _, i in exp]
        for (gp, _), (ep, _) in zip(got_sorted, exp):
            assert gp == pytest.approx(ep, abs=1e-12)

    def test_heavier_weights_win_more(self, spark):
        from graphriccicurvature_spark.operators.filtering import (
            weighted_sample_topk,
        )

        # weights 100 vs 1: the heavy half must dominate the sample
        rows = [(i, 100.0 if i < 50 else 1.0) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = {r["doc_id"] for r in weighted_sample_topk(df, "doc_id", "w", k=20).collect()}
        assert sum(1 for i in got if i < 50) >= 15

    def test_nonpositive_weights_excluded_and_bad_k(self, spark):
        from graphriccicurvature_spark.operators.filtering import (
            weighted_sample_topk,
        )

        df = spark.createDataFrame(
            [(0, 0.0), (1, -2.0), (2, 5.0)], "doc_id long, w double"
        )
        got = [r["doc_id"] for r in weighted_sample_topk(df, "doc_id", "w", k=3).collect()]
        assert got == [2]
        with pytest.raises(ValueError):
            weighted_sample_topk(df, "doc_id", "w", k=0)
