"""Round-5 webgraph operators: SCC (coloring/FW-BW), Broder bow-tie,
host graph, Katz centrality, URL canonicalization.

SCC is pinned against networkx's Tarjan-based result on random digraphs
and a hand fixture; bow-tie against Broder's definitions evaluated by
hand on a fixture that exercises every class; Katz against an exact
python recursion. The driver-level DuckDB oracles (scc, bowtie,
host_graph, host_pagerank_3, katz_3, url_normalize) pin the same
semantics from the full transitive closure at sf0.01.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.operators.urltools import normalize_url
from graphriccicurvature_spark.operators.webgraph import (
    bowtie_classification,
    host_graph,
    katz_centrality_bounded,
    strongly_connected_components,
)


def _edges_df(spark, pairs, weight=1.0):
    return spark.createDataFrame(
        [(int(s), int(d), float(weight)) for s, d in pairs],
        "src long, dst long, weight double",
    )


# core 3-cycle {0,1,2}; 3 -> core (IN); core -> 4 (OUT); 3->5->4 (TUBE);
# 3->6 (TENDRIL off IN); 7->4 (TENDRIL into OUT); 8->9 (DISC)
BOWTIE_FIXTURE = [(0, 1), (1, 2), (2, 0), (3, 0), (2, 4), (3, 5), (5, 4),
                  (3, 6), (7, 4), (8, 9)]


def test_scc_hand_fixture(spark):
    got = {
        r.node: r.scc_id
        for r in strongly_connected_components(
            _edges_df(spark, BOWTIE_FIXTURE)
        ).collect()
    }
    want = {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7, 8: 8, 9: 9}
    assert got == want


@pytest.mark.parametrize("n,p,seed", [(30, 0.08, 7), (50, 0.05, 13)])
def test_scc_matches_networkx(spark, n, p, seed):
    import networkx as nx

    rng = random.Random(seed)
    arcs = [
        (u, v) for u in range(n) for v in range(n) if u != v and rng.random() < p
    ]
    G = nx.DiGraph(arcs)
    want = {}
    for comp in nx.strongly_connected_components(G):
        m = min(comp)
        for v in comp:
            want[v] = m
    got = {
        r.node: r.scc_id
        for r in strongly_connected_components(_edges_df(spark, arcs)).collect()
    }
    assert got == want


def test_bowtie_every_class(spark):
    got = {
        r.node: r.bowtie_class
        for r in bowtie_classification(_edges_df(spark, BOWTIE_FIXTURE)).collect()
    }
    want = {0: "CORE", 1: "CORE", 2: "CORE", 3: "IN", 4: "OUT", 5: "TUBE",
            6: "TENDRIL", 7: "TENDRIL", 8: "DISC", 9: "DISC"}
    assert got == want


def test_bowtie_partition_properties(spark):
    """On a random digraph: classes partition the nodes, CORE is the
    largest SCC, every IN node reaches CORE, every OUT node is reached."""
    import networkx as nx

    rng = random.Random(23)
    arcs = [
        (u, v) for u in range(40) for v in range(40) if u != v and rng.random() < 0.06
    ]
    G = nx.DiGraph(arcs)
    core = max(nx.strongly_connected_components(G), key=lambda c: (len(c), -min(c)))
    cls = {
        r.node: r.bowtie_class
        for r in bowtie_classification(_edges_df(spark, arcs)).collect()
    }
    assert set(cls) == set(G.nodes())
    assert {v for v, c in cls.items() if c == "CORE"} == core
    pivot = next(iter(core))
    anc = nx.ancestors(G, pivot) | core
    desc = nx.descendants(G, pivot) | core
    assert {v for v, c in cls.items() if c == "IN"} == anc - core
    assert {v for v, c in cls.items() if c == "OUT"} == desc - core


def test_host_graph_rollup(spark):
    rows = [
        ("https://a.example/1", "https://b.example/x"),
        ("https://a.example/2", "https://b.example/y"),
        ("https://a.example/1", "https://a.example/2"),
        ("https://b.example:8080/1", "https://a.example/9"),
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string")
    got = {
        (r.src_host, r.dst_host): r.n_links for r in host_graph(df).collect()
    }
    assert got == {
        ("a.example", "b.example"): 2,
        ("a.example", "a.example"): 1,
        ("b.example", "a.example"): 1,  # port stripped by HOST_RE
    }
    got2 = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(df, exclude_intra=True).collect()
    }
    assert ("a.example", "a.example") not in got2 and len(got2) == 2


def test_katz_matches_python_recursion(spark):
    arcs = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2)]
    alpha, beta, iters = 0.2, 1.0, 4
    nodes = {0, 1, 2, 3}
    x = {v: beta for v in nodes}
    for _ in range(iters):
        nx_ = {}
        for v in nodes:
            nx_[v] = beta + alpha * sum(x[u] for u, w in arcs if w == v)
        x = nx_
    got = {
        r.node: r.katz
        for r in katz_centrality_bounded(
            _edges_df(spark, arcs), alpha=alpha, beta=beta, num_iterations=iters
        ).collect()
    }
    assert set(got) == nodes
    for v in nodes:
        assert abs(got[v] - x[v]) < 1e-9, (v, got[v], x[v])


def test_katz_zero_iterations_raises(spark):
    with pytest.raises(ValueError, match="num_iterations"):
        katz_centrality_bounded(_edges_df(spark, [(0, 1)]), num_iterations=0)


URL_CASES = [
    # (raw, expected)
    ("HTTPS://Site3.Example:443/p/7#frag", "https://site3.example/p/7"),
    ("http://Host.Example:80/a/b/", "http://host.example/a/b"),
    ("http://host.example:8080/a", "http://host.example:8080/a"),  # non-default port kept
    ("https://h.example", "https://h.example/"),
    ("https://h.example///", "https://h.example/"),
    ("https://h.example/x?utm_source=f&id=3&gclid=z", "https://h.example/x?id=3"),
    ("https://h.example/x?utm_source=f", "https://h.example/x"),
    ("https://h.example/x?a=1&ref=nav#top", "https://h.example/x?a=1"),
    ("https://h.example/X/Y?Q=v", "https://h.example/X/Y?Q=v"),  # path/query case kept
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in URL_CASES], "url string")
    got = [r.n for r in df.select(normalize_url("url").alias("n")).collect()]
    assert got == [want for _, want in URL_CASES]


def test_normalize_url_sql_twin_matches(spark):
    """The DuckDB expression twin must normalize every case identically —
    this is what makes the url_normalize driver oracle a real value pin."""
    import duckdb

    from graphriccicurvature_spark.operators.urltools import normalize_url_sql

    con = duckdb.connect()
    for raw, want in URL_CASES:
        esc = raw.replace("'", "''")
        expr = normalize_url_sql(f"'{esc}'")
        got = con.execute(f"SELECT {expr}").fetchone()[0]
        assert got == want, (raw, got, want)


SF = "/root/testdata/sf0.001"


def test_cli_scc_and_katz(spark, tmp_path):
    from graphriccicurvature_spark.__main__ import main

    out = tmp_path / "scc"
    main(["scc", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"node", "scc_id"}
    assert df.count() == 500

    out2 = tmp_path / "katz"
    main(["katz", "--docs", SF, "--output", str(out2), "--iterations", "2",
          "--alpha-katz", "0.2"])
    df2 = spark.read.parquet(str(out2))
    assert set(df2.columns) == {"node", "katz"}
    assert df2.count() == 500


def test_cli_bowtie(spark, tmp_path):
    from graphriccicurvature_spark.__main__ import main

    out = tmp_path / "bt"
    main(["bowtie", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    classes = {r.bowtie_class for r in df.select("bowtie_class").distinct().collect()}
    assert "CORE" in classes
    assert classes <= {"CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISC"}


def test_cli_host_graph_and_url_normalize(spark, tmp_path):
    from graphriccicurvature_spark.__main__ import main
    from graphriccicurvature_spark.sources.pages import generate_pages

    pages_path = tmp_path / "pages"
    generate_pages(spark, 60).write.parquet(str(pages_path))

    out = tmp_path / "hg"
    main(["host-graph", "--pages", str(pages_path), "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"src_host", "dst_host", "n_links"}
    assert df.count() > 0

    out2 = tmp_path / "urls"
    main(["url-normalize", "--pages", str(pages_path), "--output", str(out2)])
    df2 = spark.read.parquet(str(out2))
    assert set(df2.columns) == {"url", "url_norm"}
    assert df2.filter(df2.url_norm.startswith("https://site")).count() == 60


def test_random_walks_python_replica(spark):
    """Every visited node replayed by a pure-python walker using the
    same md5-index arithmetic, including early stop at sinks."""
    import hashlib

    arcs = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 0), (2, 3), (3, 4)]
    # node 4 is a sink
    from graphriccicurvature_spark.operators.webgraph import random_walks

    e = _edges_df(spark, arcs)
    seeds = spark.createDataFrame([(0,), (3,), (4,)], "node long")
    got = {
        (r.seed, r.step): r.node
        for r in random_walks(e, seeds, steps=3).collect()
    }

    adj = {}
    for s, d in sorted(set(arcs)):
        adj.setdefault(s, []).append(d)
    want = {}
    for seed in (0, 3, 4):
        node = seed
        want[(seed, 0)] = node
        for t in range(3):
            nbrs = adj.get(node)
            if not nbrs:
                break
            h = int(hashlib.md5(f"{node}_{t}".encode()).hexdigest()[:8], 16)
            node = nbrs[h % len(nbrs)]
            want[(seed, t + 1)] = node
    assert got == want


def test_random_walks_salt_and_determinism(spark):
    from graphriccicurvature_spark.operators.webgraph import random_walks

    arcs = [(i, j) for i in range(20) for j in range(20)
            if i != j and (i * 7 + j) % 5 == 0]
    e = _edges_df(spark, arcs)
    seeds = spark.createDataFrame([(i,) for i in range(5)], "node long")
    a = sorted(map(tuple, random_walks(e, seeds, steps=4).collect()))
    b = sorted(map(tuple, random_walks(e, seeds, steps=4).collect()))
    assert a == b  # reproducible
    c = sorted(map(tuple, random_walks(e, seeds, steps=4, salt="x").collect()))
    assert a != c  # salt decorrelates
