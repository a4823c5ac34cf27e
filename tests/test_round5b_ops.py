"""Round-5b operators: condensation DAG + topological levels, eigenvector
centrality, distributed partition modularity, JVM-codegen anchor
extraction, PII redaction, deterministic sequence packing.

Each operator is pinned here against an independent recomputation
(networkx condensation / numpy power iteration / brute-force python
packing / the collect-based community.modularity), and at the driver level
by the DuckDB value oracles `condensation`, `topo_levels`,
`eigenvector_3`, `host_modularity`, `anchor_stats`, `pii_redact`,
`pack_docs` (__spark_entry__.py).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.operators.filtering import pack_documents
from graphriccicurvature_spark.operators.textstats import pii_redact
from graphriccicurvature_spark.operators.webgraph import (
    condensation_graph,
    eigenvector_centrality_bounded,
    partition_modularity,
    topological_levels,
)

from tests.test_round5_webgraph import BOWTIE_FIXTURE, _edges_df


def test_condensation_matches_networkx(spark):
    import networkx as nx

    rng = random.Random(11)
    n = 40
    pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(140)}
    pairs = [(s, d) for s, d in pairs if s != d]
    g = nx.DiGraph(pairs)
    # expected: arcs between SCCs labeled by their min node id
    lab = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for v in comp:
            lab[v] = m
    exp = {}
    for s, d in pairs:
        if lab[s] != lab[d]:
            exp[(lab[s], lab[d])] = exp.get((lab[s], lab[d]), 0) + 1
    got = {
        (r.scc_src, r.scc_dst): r.n_arcs
        for r in condensation_graph(_edges_df(spark, pairs)).collect()
    }
    assert got == exp


def test_condensation_is_acyclic(spark):
    import networkx as nx

    cond = condensation_graph(_edges_df(spark, BOWTIE_FIXTURE))
    g = nx.DiGraph([(r.scc_src, r.scc_dst) for r in cond.collect()])
    assert nx.is_directed_acyclic_graph(g)


def test_topological_levels_hand_dag(spark):
    # 0->1->3, 0->2->3->4, 5->4 : longest-path levels
    dag = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (5, 4)]
    got = {r.node: r.level for r in topological_levels(_edges_df(spark, dag)).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3, 5: 0}


def test_topological_levels_cycle_raises(spark):
    with pytest.raises(ValueError, match="cycle"):
        topological_levels(_edges_df(spark, [(0, 1), (1, 2), (2, 0)]), max_rounds=10)


def test_eigenvector_matches_numpy(spark):
    import numpy as np

    rng = random.Random(5)
    n = 15
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(60)})
    pairs = [(s, d) for s, d in pairs if s != d]
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = 1.0
    x = np.ones(n)
    for _ in range(3):
        x = A.T @ x
    x = x / np.sum(np.abs(x))
    got = {
        r.node: r.score
        for r in eigenvector_centrality_bounded(
            _edges_df(spark, pairs), num_iterations=3
        ).collect()
    }
    for v in range(n):
        assert got[v] == pytest.approx(x[v], abs=1e-12)


def test_eigenvector_validates_iterations(spark):
    with pytest.raises(ValueError, match="num_iterations"):
        eigenvector_centrality_bounded(_edges_df(spark, [(0, 1)]), num_iterations=0)


def test_partition_modularity_matches_collect_version(spark):
    from graphriccicurvature_spark.operators.community import modularity

    rng = random.Random(3)
    n = 30
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(80)})
    pairs = [(min(s, d), max(s, d)) for s, d in pairs if s != d]
    pairs = sorted(set(pairs))
    e = _edges_df(spark, pairs)
    part = spark.createDataFrame(
        [(v, v % 4) for v in range(n)], "node long, component long"
    )
    row = partition_modularity(e, part).collect()[0]
    assert row.modularity == pytest.approx(modularity(e, part), abs=1e-12)
    assert row.n_components == 4


def test_partition_modularity_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long, weight double")
    part = spark.createDataFrame([], "node long, component long")
    assert partition_modularity(e, part).collect()[0].n_components == 0


def test_anchor_pairs_agree_with_udf_extractor(spark):
    """The JVM-codegen anchor extractor recovers exactly the links the
    Arrow-UDF extractor does, plus the anchor-word formula."""
    from graphriccicurvature_spark.sources.extract import (
        extract_anchor_pairs,
        extract_links,
    )
    from graphriccicurvature_spark.sources.pages import (
        anchor_word,
        generate_pages,
        page_outlinks,
        page_url,
    )

    n = 60
    pages = generate_pages(spark, n).cache()
    got = sorted(
        (r.src_url, r.dst_url, r.anchor)
        for r in extract_anchor_pairs(pages).collect()
    )
    via_udf = sorted(
        (r.url, r.d)
        for r in pages.select("url", F.explode(extract_links("html")).alias("d")).collect()
    )
    assert [(s, d) for s, d, _ in got] == via_udf
    exp = sorted(
        (page_url(i), page_url(d), anchor_word(i, d))
        for i in range(n)
        for d in page_outlinks(i, n)
    )
    assert got == exp


def test_pii_redact_unit(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at bob.smith+x@corp.example or 12345678 thanks"),
            (2, "no pii here, just 123 and a@b"),
            (3, "two mails a_1@x.io c%d@y.co.uk and 9999999"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.id: r for r in pii_redact(df).collect()}
    assert got[1].n_emails == 1 and got[1].n_phones == 1
    assert got[1].text_redacted == "reach me at <EMAIL> or <PHONE> thanks"
    # 'a@b' has no dot-TLD, '123' is too short
    assert got[2].n_emails == 0 and got[2].n_phones == 0
    assert got[2].text_redacted == "no pii here, just 123 and a@b"
    assert got[3].n_emails == 2 and got[3].n_phones == 1
    assert got[4].n_emails == 0 and got[4].text_redacted == ""


def test_pack_documents_matches_bruteforce(spark):
    import hashlib

    rows = [(i, " ".join(["w"] * (1 + (i * 7) % 40))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget, n_buckets = 50, 4
    got = {
        r.id: (r.bucket, r.bin_id, r.n_tokens, r.offset)
        for r in pack_documents(df, budget=budget, n_buckets=n_buckets).collect()
    }
    # brute force per bucket, same md5 rule
    def bucket_of(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % n_buckets

    streams: dict[int, list[int]] = {}
    for i, text in rows:
        streams.setdefault(bucket_of(i), []).append(i)
    for b, ids in streams.items():
        cum = 0
        for i in sorted(ids):
            nt = 1 + (i * 7) % 40
            assert got[i] == (b, cum // budget, nt, cum)
            cum += nt
    # determinism under re-partitioning: same assignments from a shuffled input
    got2 = {
        r.id: (r.bucket, r.bin_id, r.n_tokens, r.offset)
        for r in pack_documents(
            df.repartition(13), budget=budget, n_buckets=n_buckets
        ).collect()
    }
    assert got2 == got


def test_pack_documents_validates_budget(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="budget"):
        pack_documents(df, budget=0)
