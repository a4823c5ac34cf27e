"""spark-submit CLI surface (graphriccicurvature_spark.__main__)."""

import pytest

from graphriccicurvature_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def test_cli_pagerank_writes_parquet(spark, tmp_path):
    out = tmp_path / "pr"
    main(["pagerank", "--docs", SF, "--output", str(out), "--iterations", "3"])
    df = spark.read.parquet(str(out))
    assert df.columns == ["node", "pagerank"]
    assert df.count() > 0
    assert abs(df.groupBy().sum("pagerank").first()[0] - 1.0) < 1e-6


def test_cli_repetition_stats(spark, tmp_path):
    out = tmp_path / "rep"
    main(["repetition", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert "top_2gram_char_frac" in df.columns
    assert df.count() == 500


def test_cli_requires_input(spark):
    with pytest.raises(SystemExit):
        main(["pagerank"])


def test_cli_input_autodetect_documents(spark, tmp_path):
    out = tmp_path / "cc"
    main(["components", "--input", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert {"node", "component"} <= set(df.columns)
    assert df.count() > 0


def test_run_job_shim(spark, tmp_path):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
    import run_job

    out = tmp_path / "tri"
    run_job.main(["--job", "triangles", "--input", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert df.count() > 0


def test_cli_curvature_component_small(spark, tmp_path):
    out = tmp_path / "kappa"
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    epath = tmp_path / "edges"
    edges.write.parquet(str(epath))
    main([
        "curvature", "--edges", str(epath), "--output", str(out),
        "--mode", "component", "--method", "OTD",
    ])
    df = spark.read.parquet(str(out))
    assert df.count() == 4
    assert "ricci_curvature" in df.columns


def test_cli_hits_and_kcore_and_cocitation(spark, tmp_path):
    out_h = tmp_path / "hits"
    main(["hits", "--docs", SF, "--output", str(out_h), "--iterations", "2"])
    dfh = spark.read.parquet(str(out_h))
    assert set(dfh.columns) == {"node", "hub", "authority"}
    assert abs(dfh.groupBy().sum("hub").first()[0] - 1.0) < 1e-6

    out_k = tmp_path / "kcore"
    main(["k-core", "--docs", SF, "--output", str(out_k), "--k", "2"])
    dfk = spark.read.parquet(str(out_k))
    assert set(dfk.columns) == {"node", "degree"}
    assert dfk.filter("degree < 2").count() == 0  # fixpoint property

    out_c = tmp_path / "cocit"
    main(["cocitation", "--docs", SF, "--output", str(out_c), "--min-shared", "1"])
    dfc = spark.read.parquet(str(out_c))
    assert set(dfc.columns) == {"a", "b", "shared", "jaccard"}
    assert dfc.count() > 0


def test_cli_embeddedness(spark, tmp_path):
    out = tmp_path / "emb"
    main(["embeddedness", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"src", "dst", "common_neighbors", "jaccard"}
    assert df.count() > 0
    assert df.filter("jaccard < 0 OR jaccard > 1").count() == 0


def test_cli_contamination(spark, tmp_path):
    out = tmp_path / "cont"
    main(["contamination", "--docs", SF, "--output", str(out), "--prefix", "40"])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"group_hash", "n_docs", "n_splits", "splits", "min_doc_id"}
    assert df.filter("n_splits < 2").count() == 0


def test_cli_minhash_contamination(spark, tmp_path):
    out = tmp_path / "mcont"
    main(["minhash-contamination", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"doc_a", "doc_b", "split_a", "split_b"}
    assert df.filter("split_a = split_b").count() == 0


def test_cli_ppr_adamic_clustering(spark, tmp_path):
    out_p = tmp_path / "ppr"
    main(["ppr", "--docs", SF, "--output", str(out_p), "--iterations", "3",
          "--seeds", "0,13,26", "--directed"])
    dfp = spark.read.parquet(str(out_p))
    assert set(dfp.columns) == {"node", "ppr"}
    assert abs(dfp.groupBy().sum("ppr").first()[0] - 1.0) < 1e-6

    out_a = tmp_path / "aa"
    main(["adamic-adar", "--docs", SF, "--output", str(out_a), "--min-shared", "1"])
    dfa = spark.read.parquet(str(out_a))
    assert set(dfa.columns) == {"a", "b", "common_neighbors", "adamic_adar"}
    assert dfa.count() > 0

    out_c = tmp_path / "clust"
    main(["clustering", "--docs", SF, "--output", str(out_c)])
    dfc = spark.read.parquet(str(out_c))
    assert set(dfc.columns) == {"node", "degree", "clustering"}
    assert dfc.filter("clustering < 0 OR clustering > 1").count() == 0


def test_cli_graph_stats(spark, tmp_path):
    out_s = tmp_path / "assort"
    main(["assortativity", "--docs", SF, "--output", str(out_s)])
    dfs = spark.read.parquet(str(out_s))
    assert dfs.columns == ["assortativity"]
    assert -1.0 <= dfs.first()[0] <= 1.0

    out_r = tmp_path / "recip"
    main(["reciprocity", "--docs", SF, "--output", str(out_r)])
    dfr = spark.read.parquet(str(out_r))
    assert set(dfr.columns) == {"n_arcs", "n_reciprocal", "reciprocity"}

    out_n = tmp_path / "knn"
    main(["avg-neighbor-degree", "--docs", SF, "--output", str(out_n)])
    dfn = spark.read.parquet(str(out_n))
    assert set(dfn.columns) == {"node", "degree", "avg_neighbor_degree"}
    assert dfn.filter("avg_neighbor_degree < 1").count() == 0


def test_cli_truss_bfs_neighborhood(spark, tmp_path):
    out_t = tmp_path / "truss"
    main(["k-truss", "--docs", SF, "--output", str(out_t), "--k", "3"])
    dft = spark.read.parquet(str(out_t))
    assert set(dft.columns) == {"src", "dst", "support"}
    assert dft.filter("support < 1").count() == 0  # fixpoint property (k=3)

    out_b = tmp_path / "bfs"
    main(["bfs", "--docs", SF, "--output", str(out_b), "--iterations", "3",
          "--seeds", "0,17", "--directed"])
    dfb = spark.read.parquet(str(out_b))
    assert set(dfb.columns) == {"node", "dist"}
    assert dfb.filter("dist = 0").count() >= 1
    assert dfb.filter("dist > 3").count() == 0

    out_n = tmp_path / "nf"
    main(["neighborhood", "--docs", SF, "--output", str(out_n), "--radius", "1"])
    dfn = spark.read.parquet(str(out_n))
    assert set(dfn.columns) == {"node", "ball"}
    assert dfn.filter("ball < 1").count() == 0

    out_h = tmp_path / "hb"
    main(["hyperball", "--docs", SF, "--output", str(out_h), "--radius", "1"])
    dfh = spark.read.parquet(str(out_h))
    assert set(dfh.columns) == {"node", "ball_estimate"}
    assert dfh.count() == dfn.count()


def test_cli_sssp_harmonic_salsa(spark, tmp_path):
    out_s = tmp_path / "sssp"
    main(["sssp", "--docs", SF, "--output", str(out_s), "--iterations", "3",
          "--seeds", "0,17", "--directed"])
    dfs = spark.read.parquet(str(out_s))
    assert set(dfs.columns) == {"node", "dist"}
    assert dfs.filter("dist = 0.0").count() >= 1

    out_h = tmp_path / "harm"
    main(["harmonic", "--docs", SF, "--output", str(out_h), "--radius", "2"])
    dfh = spark.read.parquet(str(out_h))
    assert set(dfh.columns) == {"node", "harmonic"}
    assert dfh.filter("harmonic <= 0").count() == 0

    out_a = tmp_path / "salsa"
    main(["salsa", "--docs", SF, "--output", str(out_a), "--iterations", "2"])
    dfa = spark.read.parquet(str(out_a))
    assert set(dfa.columns) == {"node", "salsa_authority", "salsa_hub"}
    assert abs(dfa.groupBy().sum("salsa_authority").first()[0] - 1.0) < 1e-6


def test_cli_round5b_ops(spark, tmp_path):
    out_c = tmp_path / "cond"
    main(["condensation", "--docs", SF, "--output", str(out_c)])
    dfc = spark.read.parquet(str(out_c))
    assert set(dfc.columns) == {"scc_src", "scc_dst", "n_arcs"}
    assert dfc.filter("scc_src = scc_dst").count() == 0

    out_t = tmp_path / "topo"
    main(["topo-levels", "--docs", SF, "--output", str(out_t)])
    dft = spark.read.parquet(str(out_t))
    assert set(dft.columns) == {"node", "level"}
    assert dft.filter("level = 0").count() >= 1

    out_e = tmp_path / "eig"
    main(["eigenvector", "--docs", SF, "--output", str(out_e),
          "--iterations", "2", "--directed"])
    dfe = spark.read.parquet(str(out_e))
    assert set(dfe.columns) == {"node", "score"}
    assert abs(dfe.groupBy().sum("score").first()[0] - 1.0) < 1e-6

    out_b = tmp_path / "bc"
    main(["betweenness", "--docs", SF, "--output", str(out_b),
          "--seeds", "1,2"])
    dfb = spark.read.parquet(str(out_b))
    assert set(dfb.columns) == {"node", "betweenness"}
    assert dfb.filter("betweenness < 0").count() == 0


def test_cli_round5b_text_ops(spark, tmp_path):
    out_t = tmp_path / "tfidf"
    main(["tfidf", "--docs", SF, "--output", str(out_t), "--k", "2"])
    dft = spark.read.parquet(str(out_t))
    assert set(dft.columns) == {"id", "term", "tf", "score", "rank"}
    assert dft.filter("rank > 2").count() == 0

    out_p = tmp_path / "pii"
    main(["pii-redact", "--docs", SF, "--output", str(out_p)])
    dfp = spark.read.parquet(str(out_p))
    assert set(dfp.columns) == {"id", "n_emails", "n_phones", "text_redacted"}

    out_k = tmp_path / "pack"
    main(["pack", "--docs", SF, "--output", str(out_k), "--budget", "64"])
    dfk = spark.read.parquet(str(out_k))
    assert set(dfk.columns) == {"id", "bucket", "n_tokens", "offset", "bin_id"}
    assert dfk.filter("bin_id < 0").count() == 0

    out_s = tmp_path / "sess"
    main(["sessions", "--events", SF + "/events.parquet",
          "--output", str(out_s), "--gap", "30 minutes"])
    dfs = spark.read.parquet(str(out_s))
    assert set(dfs.columns) == {
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    }
    assert dfs.filter("session_end <= session_start").count() == 0


def test_cli_round5f_ops(spark, tmp_path):
    out_b = tmp_path / "bm25"
    main(["bm25", "--docs", SF, "--output", str(out_b),
          "--query", "merge,scan", "--k", "5"])
    dfb = spark.read.parquet(str(out_b))
    assert set(dfb.columns) == {"id", "matched_terms", "score", "rank"}
    assert 0 < dfb.count() <= 5

    out_p = tmp_path / "pmi"
    main(["pmi", "--docs", SF, "--output", str(out_p),
          "--min-shared", "3", "--k", "10"])
    dfp = spark.read.parquet(str(out_p))
    assert set(dfp.columns) == {"a", "b", "pair_docs", "pmi", "rank"}
    assert dfp.filter("pair_docs < 3").count() == 0

    out_k = tmp_path / "kl"
    main(["unigram-kl", "--docs", SF, "--output", str(out_k)])
    dfk = spark.read.parquet(str(out_k))
    assert set(dfk.columns) == {"id", "n_tokens", "kl"}
    assert dfk.filter("kl < -1e-9").count() == 0

    out_c = tmp_path / "bib"
    main(["bib-coupling", "--docs", SF, "--output", str(out_c),
          "--min-shared", "2"])
    dfc = spark.read.parquet(str(out_c))
    assert set(dfc.columns) == {"a", "b", "shared", "jaccard"}
    assert dfc.filter("shared < 2").count() == 0

    out_r = tmp_path / "rc"
    main(["rich-club", "--docs", SF, "--output", str(out_r)])
    dfr = spark.read.parquet(str(out_r))
    assert set(dfr.columns) == {"k", "n_nodes", "n_edges", "phi"}
    assert dfr.filter("k = 0").count() == 1


def test_cli_truss_number(spark, tmp_path):
    out = tmp_path / "truss"
    main(["truss-number", "--docs", SF, "--output", str(out), "--rounds", "4"])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"src", "dst", "truss"}
    assert df.filter("truss < 2").count() == 0


def test_cli_round5g_ops(spark, tmp_path):
    out_t = tmp_path / "trans"
    main(["transitivity", "--docs", SF, "--output", str(out_t)])
    dft = spark.read.parquet(str(out_t))
    assert set(dft.columns) == {"n_triangles", "n_wedges", "transitivity"}
    assert dft.count() == 1

    out_p = tmp_path / "plaw"
    main(["powerlaw", "--docs", SF, "--output", str(out_p), "--k", "2"])
    dfp = spark.read.parquet(str(out_p))
    row = dfp.collect()[0]
    assert row["dmin"] == 2 and row["n_tail"] > 0 and row["alpha"] > 1.0

    out_b = tmp_path / "best"
    main(["keep-best", "--docs", SF, "--output", str(out_b)])
    dfb = spark.read.parquet(str(out_b))
    assert set(dfb.columns) == {"doc_id", "cluster", "is_survivor", "quality"}
    # exactly one survivor per cluster
    bad = (
        dfb.selectExpr("cluster", "cast(is_survivor as int) AS s")
        .groupBy("cluster")
        .sum("s")
        .filter("`sum(s)` <> 1")
        .count()
    )
    assert bad == 0


def test_cli_perplexity(spark, tmp_path):
    out = tmp_path / "ppl"
    main(["perplexity", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"id", "n_tokens", "cross_entropy", "ppl"}
    assert df.filter("n_tokens > 0 and ppl < 1.0").count() == 0


def test_cli_mst(spark, tmp_path):
    out = tmp_path / "mst"
    main(["mst", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"src", "dst", "weight"}
    # a spanning forest has |V| - |components| edges: strictly fewer
    # rows than nodes, and no duplicate canonical edges
    assert df.count() == df.select("src", "dst").distinct().count()


def test_cli_dsir(spark, tmp_path):
    out = tmp_path / "dsir"
    main(["dsir", "--docs", SF, "--output", str(out), "--target-lang", "en"])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"id", "n_tokens", "log_ratio", "avg_log_ratio"}
    assert df.count() == 500


def test_cli_closeness(spark, tmp_path):
    out = tmp_path / "close"
    main(["closeness", "--docs", SF, "--output", str(out), "--radius", "2"])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"node", "n_reached", "sum_dist", "closeness"}
    assert df.filter("closeness <= 0 OR closeness > 1").count() == 0


def test_cli_louvain(spark, tmp_path):
    out = tmp_path / "louv"
    main(["louvain", "--docs", SF, "--output", str(out), "--rounds", "2"])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"node", "community"}
    # moves strictly coarsen: strictly fewer communities than nodes
    assert df.select("community").distinct().count() < df.count()


def test_cli_ngram_contamination(spark, tmp_path):
    out = tmp_path / "ngc"
    main(["ngram-contamination", "--docs", SF, "--output", str(out), "--k", "13"])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {
        "id", "split", "n_shingles", "n_contaminated",
        "contaminated_frac", "is_contaminated",
    }
    assert df.filter("split = 'train'").count() == 0


def test_cli_weighted_sample(spark, tmp_path):
    out = tmp_path / "ws"
    main(["weighted-sample", "--docs", SF, "--output", str(out), "--top-n", "10"])
    df = spark.read.parquet(str(out))
    assert df.count() == 10
    assert "priority" in df.columns


def test_cli_mis(spark, tmp_path):
    out = tmp_path / "mis"
    main(["mis", "--docs", SF, "--output", str(out), "--rounds", "3"])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"node", "in_mis", "round"}
    assert df.filter("round > 3").count() == 0
    assert df.filter("in_mis").count() > 0


def test_cli_matching(spark, tmp_path):
    out = tmp_path / "match"
    main(["matching", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"src", "dst", "round"}
    # a matching: every node appears at most once
    n_rows = df.count()
    n_nodes = (
        df.selectExpr("src AS node").union(df.selectExpr("dst AS node"))
        .distinct()
        .count()
    )
    assert n_nodes == 2 * n_rows


def test_cli_bpe_tokens(spark, tmp_path):
    out = tmp_path / "bpe"
    main(["bpe-tokens", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"doc_id", "n_ws_tokens", "n_bpe_tokens", "fertility"}
    assert df.filter("n_bpe_tokens < n_ws_tokens").count() == 0


def test_cli_coloring(spark, tmp_path):
    out = tmp_path / "color"
    main(["coloring", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"node", "color", "round"}
    assert df.filter("color < 0").count() == 0


def test_cli_simrank(spark, tmp_path):
    out = tmp_path / "sr"
    main(["simrank", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"a", "b", "score"}
    assert df.filter("score <= 0 OR score > 0.81").count() == 0


def test_cli_curation_funnel(spark, tmp_path):
    out = tmp_path / "funnel"
    main(["curation-funnel", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    rows = {r["stage"]: r for r in df.collect()}
    assert set(rows) == {"input", "exact_dedup", "quality_filter", "decontaminated"}
    order = ["input", "exact_dedup", "quality_filter", "decontaminated"]
    counts = [rows[s]["n_docs"] for s in order]
    toks = [rows[s]["n_tokens"] for s in order]
    assert counts == sorted(counts, reverse=True)
    assert toks == sorted(toks, reverse=True)


def test_cli_asof_and_range_join(spark, tmp_path):
    ev = "/root/testdata/sf0.001/events.parquet"
    out1 = tmp_path / "asof"
    main(["asof-join", "--events", ev, "--output", str(out1)])
    df1 = spark.read.parquet(str(out1))
    assert {"event_id", "user_id", "ts", "event_id_r", "value_r", "ts_r"} <= set(df1.columns)
    out2 = tmp_path / "rj"
    main(["range-join", "--events", ev, "--output", str(out2)])
    df2 = spark.read.parquet(str(out2))
    # every event lands in exactly one of its user's sessions
    n_ev = spark.read.parquet(ev).count()
    assert df2.count() == n_ev


def test_cli_square_dup_robustness(spark, tmp_path):
    out = tmp_path / "sq"
    main(["square-count", "--docs", SF, "--output", str(out)])
    assert spark.read.parquet(str(out)).collect()[0]["n_squares"] >= 0
    out2 = tmp_path / "dh"
    main(["dup-histogram", "--docs", SF, "--output", str(out2)])
    assert spark.read.parquet(str(out2)).count() >= 1
    out3 = tmp_path / "rb"
    main(["robustness", "--docs", SF, "--output", str(out3), "--k", "3"])
    r = spark.read.parquet(str(out3)).collect()[0]
    assert r["giant_after"] <= r["giant_before"]


def test_cli_round5i_ops(spark, tmp_path):
    from graphriccicurvature_spark.sources.pages import generate_pages

    out = tmp_path / "pd"
    main(["paragraph-dedup", "--docs", SF, "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"doc_id", "text", "n_paragraphs", "n_removed"}
    assert df.count() == 500

    out2 = tmp_path / "cont"
    main(["containment", "--docs", SF, "--output", str(out2), "--k", "2",
          "--threshold", "0.6"])
    df2 = spark.read.parquet(str(out2))
    assert set(df2.columns) == {"contained", "container", "containment"}

    pp = tmp_path / "pages"
    generate_pages(spark, 40).select("url", "warc_ts").write.parquet(str(pp))
    out3 = tmp_path / "snap"
    main(["snapshot-dedup", "--pages", str(pp), "--output", str(out3)])
    df3 = spark.read.parquet(str(out3))
    assert "canonical_url" in df3.columns and df3.count() == 40

    out4 = tmp_path / "sweep"
    main(["ppr-sweep", "--docs", SF, "--output", str(out4), "--seeds", "0,13",
          "--iterations", "2", "--max-prefix", "10"])
    df4 = spark.read.parquet(str(out4))
    assert df4.count() == 10 and "conductance" in df4.columns


def test_cli_round5j_ops(spark, tmp_path):
    out = tmp_path / "scan"
    main(["scan", "--docs", SF, "--output", str(out), "--eps", "0.42", "--mu", "3"])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"node", "role", "cluster"}
    assert df.count() == 500

    pr0 = tmp_path / "pr0"
    main(["pagerank", "--docs", SF, "--output", str(pr0), "--iterations", "3",
          "--directed"])
    out2 = tmp_path / "prw"
    main(["pagerank-warm", "--docs", SF, "--output", str(out2),
          "--iterations", "2", "--directed", "--init-scores", str(pr0)])
    df2 = spark.read.parquet(str(out2))
    assert df2.columns == ["node", "pagerank"]
    assert abs(df2.groupBy().sum("pagerank").first()[0] - 1.0) < 1e-6

    with pytest.raises(SystemExit):
        main(["pagerank-warm", "--docs", SF])


def test_cli_round5k_ops(spark, tmp_path):
    out = tmp_path / "km"
    main(["kmeans", "--docs", SF, "--output", str(out), "--k", "8"])
    df = spark.read.parquet(str(out))
    assert set(df.columns) == {"vec_id", "cluster", "cosine"}
    assert df.count() == 500

    out2 = tmp_path / "sd"
    main(["semantic-dedup", "--docs", SF, "--output", str(out2),
          "--k", "8", "--threshold", "0.35"])
    df2 = spark.read.parquet(str(out2))
    assert set(df2.columns) == {"vec_id", "cluster", "keep"}
    assert 0 < df2.filter("not keep").count() < 500

    old = tmp_path / "old_edges"
    spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long").write.parquet(str(old))
    new = tmp_path / "new_edges"
    spark.createDataFrame([(1, 2), (1, 4)], "src long, dst long").write.parquet(str(new))
    out3 = tmp_path / "churn"
    main(["link-churn", "--edges", str(old), "--edges2", str(new),
          "--output", str(out3), "--directed"])
    df3 = spark.read.parquet(str(out3))
    assert df3.count() == 1 and df3.first()["churn_rate"] == 0.666667

    with pytest.raises(SystemExit):
        main(["link-churn", "--edges", str(old)])


def test_cli_boilerplate(spark, tmp_path):
    docs = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(1, "s", "body one\n\nfoot"), (2, "s", "body two\n\nfoot"), (3, "s", "body three")],
        "doc_id long, source string, text string",
    ).write.parquet(str(docs))
    out = tmp_path / "bp"
    main(["boilerplate", "--docs", str(docs), "--output", str(out),
          "--min-frac", "0.5"])
    df = spark.read.parquet(str(out))
    assert df.count() == 3
    assert df.filter("n_removed = 1").count() == 2


def test_cli_components_warm_start(spark, tmp_path):
    cold = tmp_path / "cc0"
    main(["components", "--docs", SF, "--output", str(cold)])
    warm = tmp_path / "cc1"
    main(["components", "--docs", SF, "--output", str(warm),
          "--init-labels", str(cold)])
    a = {r["node"]: r["component"] for r in spark.read.parquet(str(cold)).collect()}
    b = {r["node"]: r["component"] for r in spark.read.parquet(str(warm)).collect()}
    assert a == b


def test_cli_url_templates(spark, tmp_path):
    pages = tmp_path / "pages.parquet"
    spark.createDataFrame(
        [("https://a.example/p/1",), ("https://a.example/p/2",)], "url string"
    ).write.parquet(str(pages))
    out = tmp_path / "tpl"
    main(["url-templates", "--pages", str(pages), "--output", str(out)])
    df = spark.read.parquet(str(out))
    assert df.collect()[0]["template"] == "/p/{n}" and df.count() == 1

    with pytest.raises(SystemExit):
        main(["url-templates"])
