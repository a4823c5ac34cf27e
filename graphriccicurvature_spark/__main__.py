"""spark-submit entry point (north-rule deployment surface).

Run any engine operator over parquet inputs and write a parquet result:

    # on a cluster — master/executors come from spark-submit, not from us
    spark-submit --py-files graphriccicurvature_spark.zip \
        -m graphriccicurvature_spark curvature \
        --edges s3://bucket/edges.parquet --output s3://bucket/kappa \
        --method OTDSinkhornMix --mode ego

    # locally
    python -m graphriccicurvature_spark pagerank \
        --docs /root/testdata/sf0.001 --output /tmp/pr --iterations 10

Graph operators accept either ``--edges`` (a parquet of src,dst[,weight]),
``--docs`` (a testdata-shaped dir; the F2 link graph is derived from
documents.parquet), or ``--pages`` (a crawl pages parquet: url,html,...;
edges come from link extraction — the BASELINE.json input path). Text
operators take ``--docs`` (documents.parquet with doc_id,text).
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import DataFrame, SparkSession


def build_session(master: str | None, shuffle_partitions: int | None) -> SparkSession:
    """Engine-tuned session that DEFERS cluster topology to spark-submit.

    Unlike session.get_spark (tests/bench: pins master + driver memory for a
    known local box), this only sets engine-semantic configs — Arrow batch
    sizing and AQE skew handling — and sets master only when the caller asks
    or when no spark.master exists (plain ``python -m`` runs). A builder
    .master() would silently override ``spark-submit --master yarn``.
    """
    from pyspark import SparkConf

    builder = (
        SparkSession.builder.appName("graphriccicurvature-spark")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fat ego-gather rows: cap Arrow batches well below the 10k default
        # (see session.py for the OOM rationale)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    )
    if shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if master:
        builder = builder.master(master)
    elif not SparkConf().contains("spark.master"):
        builder = builder.master(os.environ.get("SPARK_MASTER", "local[*]"))
    return builder.getOrCreate()


def _autodetect(args) -> None:
    """Map ``--input`` onto the typed flags by schema (run_job.py heritage):
    (src, dst) -> edges, html -> pages, doc_id -> documents."""
    if not args.input:
        return
    import pyarrow.parquet as pq

    path = args.input
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "documents.parquet")):
        args.docs = args.docs or path
        return
    probe = path
    if os.path.isdir(probe):
        parts = [f for f in sorted(os.listdir(probe)) if f.endswith(".parquet")]
        if not parts:
            sys.exit(f"no parquet files under --input {path}")
        probe = os.path.join(probe, parts[0])
    cols = set(pq.ParquetFile(probe).schema_arrow.names)
    if {"src", "dst"} <= cols:
        args.edges = args.edges or path
    elif "html" in cols:
        args.pages = args.pages or path
    elif "doc_id" in cols:
        args.docs = args.docs or path
    else:
        sys.exit(f"--input {path}: no (src,dst) / pages(html) / documents(doc_id) schema: {sorted(cols)}")


def _load_edges(spark: SparkSession, args) -> DataFrame:
    from .sources.edges import canonicalize, edges_from_documents, prepare_edges

    if args.edges:
        e = prepare_edges(spark.read.parquet(args.edges))
    elif args.pages:
        from pyspark.sql import functions as F

        from .sources.extract import extract_links

        pages = spark.read.parquet(args.pages)
        links = (
            pages.select(
                F.xxhash64("url").alias("src"),
                F.explode(extract_links("html")).alias("dst_url"),
            )
            .select("src", F.xxhash64("dst_url").alias("dst"))
            .filter("src <> dst")
            .dropDuplicates(["src", "dst"])
        )
        e = prepare_edges(links)
    elif args.docs:
        d = args.docs
        if d.endswith(".parquet"):  # file path -> containing sf dir
            d = os.path.dirname(d.rstrip("/"))
        e = edges_from_documents(spark, d)
    else:
        sys.exit("graph operators need one of --edges / --docs / --pages")
    return e if args.directed else canonicalize(e)


def _load_embeddings(spark: SparkSession, args) -> DataFrame:
    if not args.docs:
        sys.exit("embedding operators need --docs (dir containing embeddings.parquet)")
    path = args.docs
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "embeddings.parquet")):
        path = os.path.join(path, "embeddings.parquet")
    return spark.read.parquet(path)


def _load_docs(spark: SparkSession, args) -> DataFrame:
    if not args.docs:
        sys.exit("text operators need --docs (dir containing documents.parquet)")
    path = args.docs
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "documents.parquet")):
        path = os.path.join(path, "documents.parquet")
    return spark.read.parquet(path)


def run_op(spark: SparkSession, args) -> DataFrame:
    op = args.op
    if op == "curvature":
        from .operators.ollivier import ricci_curvature_edges

        return ricci_curvature_edges(
            _load_edges(spark, args), alpha=args.alpha, method=args.method,
            mode=args.mode, directed=args.directed,
            exp_power=args.exp_power, nbr_topk=args.nbr_topk,
        )
    if op == "forman":
        from .operators.forman import forman_curvature

        return forman_curvature(_load_edges(spark, args), args.forman_method)
    if op == "flow":
        from .operators.flow import ricci_flow

        return ricci_flow(
            _load_edges(spark, args), iterations=args.iterations, delta=args.delta,
            mode=args.mode, method=args.method, alpha=args.alpha,
            exp_power=args.exp_power, nbr_topk=args.nbr_topk,
            checkpoint_dir=args.checkpoint_dir,
        )
    if op == "community":
        from .operators.community import ricci_community

        _, clustering = ricci_community(
            _load_edges(spark, args),
            flow_kwargs={"mode": args.mode, "method": args.method, "alpha": args.alpha},
        )
        return clustering
    if op == "pagerank":
        from .operators.pagerank import pagerank

        return pagerank(
            _load_edges(spark, args), num_iterations=args.iterations,
            directed=args.directed,
        )
    if op == "components":
        from .operators.components import connected_components

        init = (
            spark.read.parquet(args.init_labels) if args.init_labels else None
        )
        return connected_components(_load_edges(spark, args), init=init)
    if op == "lpa":
        from .operators.labelprop import label_propagation

        return label_propagation(
            _load_edges(spark, args), max_iter=args.iterations, directed=args.directed
        )
    if op == "triangles":
        from .operators.triangles import triangle_counts

        return triangle_counts(_load_edges(spark, args))
    if op == "embeddedness":
        from .operators.triangles import edge_embeddedness

        return edge_embeddedness(_load_edges(spark, args))
    if op == "exact-dedup":
        from .operators.dedup import exact_dedup

        return exact_dedup(_load_docs(spark, args))
    if op == "minhash-dedup":
        from .operators.dedup import minhash_dedup

        return minhash_dedup(_load_docs(spark, args))
    if op == "paragraph-dedup":
        from .operators.dedup import paragraph_dedup

        return paragraph_dedup(_load_docs(spark, args), min_docs=args.min_docs)
    if op == "url-templates":
        from .operators.urltools import url_template_stats

        if not args.pages:
            sys.exit("url-templates needs --pages (parquet with a url column)")
        return url_template_stats(spark.read.parquet(args.pages))
    if op == "boilerplate":
        from .operators.dedup import boilerplate_strip

        return boilerplate_strip(
            _load_docs(spark, args),
            host_col=args.host_col,
            min_frac=args.min_frac,
            min_docs=args.min_docs,
        )
    if op == "containment":
        from .operators.dedup import ngram_containment_pairs

        return ngram_containment_pairs(
            _load_docs(spark, args), k=args.k, threshold=args.threshold
        )
    if op == "snapshot-dedup":
        from .operators.dedup import snapshot_dedup

        if not args.pages:
            sys.exit("snapshot-dedup needs --pages (parquet with url, warc_ts)")
        return snapshot_dedup(spark.read.parquet(args.pages))
    if op == "ppr-sweep":
        from .operators.linkgraph import ppr_sweep
        from .sources.edges import canonicalize

        if not args.seeds:
            sys.exit("ppr-sweep needs --seeds (comma-separated node ids)")
        seeds = spark.createDataFrame(
            [(int(s),) for s in args.seeds.split(",")], "node long"
        )
        return ppr_sweep(
            canonicalize(_load_edges(spark, args)),
            seeds,
            num_iterations=args.iterations,
            max_prefix=args.max_prefix,
        )
    if op == "scan":
        from .operators.linkgraph import scan_clustering
        from .sources.edges import canonicalize

        return scan_clustering(
            canonicalize(_load_edges(spark, args)), eps=args.eps, mu=args.mu
        )
    if op == "pagerank-warm":
        from .operators.pagerank import pagerank

        if not args.init_scores:
            sys.exit("pagerank-warm needs --init-scores (parquet of node, pagerank)")
        return pagerank(
            _load_edges(spark, args),
            num_iterations=args.iterations,
            directed=args.directed,
            init=spark.read.parquet(args.init_scores),
        )
    if op == "kmeans":
        from .operators.similarity import kmeans_clusters

        return kmeans_clusters(
            _load_embeddings(spark, args), k=args.k, rounds=1 if args.rounds is None else args.rounds
        )
    if op == "semantic-dedup":
        from .operators.similarity import semantic_dedup

        return semantic_dedup(
            _load_embeddings(spark, args),
            k=args.k,
            rounds=1 if args.rounds is None else args.rounds,
            threshold=args.threshold,
        )
    if op == "link-churn":
        from .operators.webgraph import link_churn

        if not args.edges2:
            sys.exit("link-churn needs --edges2 (the NEW snapshot's edge parquet; "
                     "--edges/--docs/--pages supply the OLD one)")
        return link_churn(
            _load_edges(spark, args), spark.read.parquet(args.edges2)
        )
    if op == "repetition":
        from .operators.textstats import repetition_stats

        return repetition_stats(_load_docs(spark, args))
    if op == "corpus-dup":
        from .operators.textstats import corpus_dup_passages

        return corpus_dup_passages(_load_docs(spark, args))
    if op == "quality":
        from .operators.textstats import quality_score

        return quality_score(_load_docs(spark, args))
    if op == "langid":
        from .operators.textstats import language_id

        return language_id(_load_docs(spark, args))
    if op == "token-freq":
        from .operators.textstats import token_frequency

        return token_frequency(_load_docs(spark, args), top_n=args.top_n)
    if op == "hash-split":
        from .operators.textstats import hash_split

        return hash_split(_load_docs(spark, args))
    if op == "contamination":
        from .operators.textstats import contamination_check

        return contamination_check(_load_docs(spark, args), prefix=args.prefix)
    if op == "minhash-contamination":
        from .operators.dedup import minhash_contamination

        return minhash_contamination(_load_docs(spark, args))
    if op == "host-stats":
        from .operators.textstats import host_stats

        if not args.pages:
            sys.exit("host-stats needs --pages")
        return host_stats(spark.read.parquet(args.pages))
    if op == "hits":
        from .operators.linkgraph import hits

        return hits(
            _load_edges(spark, args), num_iterations=args.iterations,
            directed=args.directed,
        )
    if op == "k-core":
        from .operators.linkgraph import k_core
        from .sources.edges import canonicalize

        return k_core(canonicalize(_load_edges(spark, args)), k=args.k, rounds=args.rounds)
    if op == "cocitation":
        from .operators.linkgraph import cocitation_jaccard

        return cocitation_jaccard(
            _load_edges(spark, args), min_shared=args.min_shared
        )
    if op == "core-number":
        from .operators.linkgraph import core_number

        return core_number(_load_edges(spark, args))
    if op == "spam-mass":
        from .operators.linkgraph import spam_mass

        e = _load_edges(spark, args)
        if not args.seeds:
            sys.exit("spam-mass needs --seeds (comma-separated trusted node ids)")
        seeds = spark.createDataFrame(
            [(int(s),) for s in args.seeds.split(",")], "node long"
        )
        return spam_mass(e, seeds, num_iterations=args.iterations)
    if op == "ppr":
        from pyspark.sql import functions as F

        from .operators.linkgraph import personalized_pagerank

        e = _load_edges(spark, args)
        if not args.seeds:
            sys.exit("ppr needs --seeds (comma-separated node ids)")
        seeds = spark.createDataFrame(
            [(int(s),) for s in args.seeds.split(",")], "node long"
        )
        return personalized_pagerank(
            e, seeds, num_iterations=args.iterations, directed=args.directed
        )
    if op == "adamic-adar":
        from .operators.linkgraph import adamic_adar
        from .sources.edges import canonicalize

        return adamic_adar(
            canonicalize(_load_edges(spark, args)), min_common=args.min_shared
        )
    if op == "clustering":
        from .operators.linkgraph import clustering_coefficient
        from .sources.edges import canonicalize

        return clustering_coefficient(canonicalize(_load_edges(spark, args)))
    if op == "assortativity":
        from .operators.linkgraph import degree_assortativity
        from .sources.edges import canonicalize

        return degree_assortativity(canonicalize(_load_edges(spark, args)))
    if op == "reciprocity":
        from .operators.linkgraph import reciprocity

        return reciprocity(_load_edges(spark, args))
    if op == "avg-neighbor-degree":
        from .operators.linkgraph import average_neighbor_degree
        from .sources.edges import canonicalize

        return average_neighbor_degree(canonicalize(_load_edges(spark, args)))
    if op == "sssp":
        from .operators.linkgraph import sssp_bounded

        if not args.seeds:
            sys.exit("sssp needs --seeds (comma-separated node ids)")
        seeds = spark.createDataFrame(
            [(int(s),) for s in args.seeds.split(",")], "node long"
        )
        return sssp_bounded(
            _load_edges(spark, args), seeds,
            rounds=args.iterations, directed=args.directed,
        )
    if op == "harmonic":
        from .operators.linkgraph import harmonic_closeness
        from .sources.edges import canonicalize

        return harmonic_closeness(
            canonicalize(_load_edges(spark, args)), radius=args.radius
        )
    if op == "hyperball-harmonic":
        from .operators.linkgraph import hyperball_harmonic
        from .sources.edges import canonicalize

        return hyperball_harmonic(
            canonicalize(_load_edges(spark, args)), radius=args.radius
        )
    if op == "salsa":
        from .operators.linkgraph import salsa

        return salsa(_load_edges(spark, args), num_iterations=args.iterations)
    if op == "k-truss":
        from .operators.linkgraph import k_truss
        from .sources.edges import canonicalize

        return k_truss(canonicalize(_load_edges(spark, args)), k=args.k, rounds=args.rounds)
    if op == "bfs":
        from .operators.linkgraph import bfs_distance

        if not args.seeds:
            sys.exit("bfs needs --seeds (comma-separated node ids)")
        seeds = spark.createDataFrame(
            [(int(s),) for s in args.seeds.split(",")], "node long"
        )
        return bfs_distance(
            _load_edges(spark, args), seeds,
            max_hops=args.iterations, directed=args.directed,
        )
    if op == "neighborhood":
        from .operators.linkgraph import neighborhood_function
        from .sources.edges import canonicalize

        return neighborhood_function(
            canonicalize(_load_edges(spark, args)), radius=args.radius
        )
    if op == "hyperball":
        from .operators.linkgraph import hyperball
        from .sources.edges import canonicalize

        return hyperball(
            canonicalize(_load_edges(spark, args)), radius=args.radius
        )
    if op == "distance-distribution":
        from .operators.linkgraph import distance_distribution
        from .sources.edges import canonicalize

        return distance_distribution(
            canonicalize(_load_edges(spark, args)), radius=args.radius
        )
    if op == "effective-diameter":
        from .operators.linkgraph import effective_diameter
        from .sources.edges import canonicalize

        return effective_diameter(
            canonicalize(_load_edges(spark, args)), radius=args.radius
        )
    if op == "hyperball-dd":
        from .operators.linkgraph import hyperball_distance_distribution
        from .sources.edges import canonicalize

        return hyperball_distance_distribution(
            canonicalize(_load_edges(spark, args)), radius=args.radius
        )
    if op == "scc":
        from .operators.webgraph import strongly_connected_components

        return strongly_connected_components(_load_edges(spark, args))
    if op == "bowtie":
        from .operators.webgraph import bowtie_classification

        return bowtie_classification(_load_edges(spark, args))
    if op == "katz":
        from .operators.webgraph import katz_centrality_bounded

        return katz_centrality_bounded(
            _load_edges(spark, args), alpha=args.alpha_katz, beta=args.beta,
            num_iterations=args.iterations, directed=args.directed,
        )
    if op == "host-graph":
        from .operators.webgraph import host_graph
        from .sources.extract import extract_links
        from pyspark.sql import functions as FF

        if not args.pages:
            sys.exit("host-graph needs --pages (url,html parquet)")
        pages = spark.read.parquet(args.pages)
        url_edges = (
            pages.select(
                FF.col("url").alias("src_url"),
                FF.explode(extract_links("html")).alias("dst_url"),
            )
            .filter(FF.col("src_url") != FF.col("dst_url"))
            .dropDuplicates(["src_url", "dst_url"])
        )
        return host_graph(url_edges, exclude_intra=args.exclude_intra)
    if op == "random-walks":
        from .operators.webgraph import random_walks

        if not args.seeds:
            sys.exit("random-walks needs --seeds (comma-separated node ids)")
        seeds = spark.createDataFrame(
            [(int(s),) for s in args.seeds.split(",")], "node long"
        )
        return random_walks(
            _load_edges(spark, args), seeds, steps=args.iterations
        )
    if op == "url-normalize":
        from .operators.urltools import normalize_url
        from pyspark.sql import functions as FF

        if not args.pages:
            sys.exit("url-normalize needs --pages (url,... parquet)")
        pages = spark.read.parquet(args.pages)
        return pages.select("url", normalize_url(FF.col("url")).alias("url_norm"))
    if op == "condensation":
        from .operators.webgraph import condensation_graph

        return condensation_graph(_load_edges(spark, args))
    if op == "topo-levels":
        from .operators.webgraph import condensation_graph, topological_levels
        from pyspark.sql import functions as FF

        cond = condensation_graph(_load_edges(spark, args)).select(
            FF.col("scc_src").alias("src"), FF.col("scc_dst").alias("dst")
        )
        return topological_levels(cond)
    if op == "eigenvector":
        from .operators.webgraph import eigenvector_centrality_bounded

        return eigenvector_centrality_bounded(
            _load_edges(spark, args),
            num_iterations=args.iterations,
            directed=args.directed,
        )
    if op == "betweenness":
        from .operators.webgraph import betweenness_from_sources

        if not args.seeds:
            sys.exit("betweenness needs --seeds (comma-separated pivot ids)")
        seeds = spark.createDataFrame(
            [(int(s),) for s in args.seeds.split(",")], "node long"
        )
        return betweenness_from_sources(
            _load_edges(spark, args), seeds, directed=args.directed
        )
    if op == "tfidf":
        from .operators.textstats import tfidf_top_terms

        return tfidf_top_terms(_load_docs(spark, args), k=args.k)
    if op == "pii-redact":
        from .operators.textstats import pii_redact

        return pii_redact(_load_docs(spark, args))
    if op == "pack":
        from .operators.filtering import pack_documents

        return pack_documents(_load_docs(spark, args), budget=args.budget)
    if op == "anchor-stats":
        from .sources.extract import anchor_text_stats

        if not args.pages:
            sys.exit("anchor-stats needs --pages (url,html parquet)")
        return anchor_text_stats(spark.read.parquet(args.pages))
    if op == "sessions":
        from .streaming.events import session_event_counts_batch

        if not args.events:
            sys.exit("sessions needs --events (event_id,ts,user_id,value parquet)")
        return session_event_counts_batch(
            spark.read.parquet(args.events), gap=args.gap
        )
    if op == "asof-join":
        from pyspark.sql import functions as F

        from .operators.temporal import asof_join_backward

        if not args.events:
            sys.exit("asof-join needs --events (event_id,ts,user_id,value parquet)")
        ev = spark.read.parquet(args.events)
        return asof_join_backward(
            ev.filter(F.col("event_type") == "purchase").select(
                "event_id", "user_id", "ts", "value"
            ),
            ev.filter(F.col("event_type") == "click").select(
                "event_id", "user_id", "ts", "value"
            ),
            by=["user_id"],
            right_value_cols=["event_id", "value"],
            tiebreak_col="event_id",
        )
    if op == "range-join":
        from pyspark.sql import functions as F

        from .operators.temporal import range_join_points
        from .streaming.events import session_event_counts_batch

        if not args.events:
            sys.exit("range-join needs --events (event_id,ts,user_id,value parquet)")
        ev = spark.read.parquet(args.events)
        sessions = session_event_counts_batch(ev, gap=args.gap).select(
            "user_id",
            F.col("session_start").alias("start"),
            F.col("session_end").alias("end"),
        )
        return range_join_points(
            ev.select("event_id", "user_id", "ts"), sessions, by=["user_id"]
        )
    if op == "bm25":
        from .operators.textstats import bm25_topk

        if not args.query:
            sys.exit("bm25 needs --query (comma-separated terms)")
        return bm25_topk(
            _load_docs(spark, args), args.query.split(","), k=args.k
        )
    if op == "pmi":
        from .operators.textstats import pmi_pairs

        return pmi_pairs(
            _load_docs(spark, args), min_pair_docs=args.min_shared, k=args.k
        )
    if op == "unigram-kl":
        from .operators.textstats import unigram_kl

        return unigram_kl(_load_docs(spark, args))
    if op == "perplexity":
        from .operators.textstats import doc_perplexity

        return doc_perplexity(_load_docs(spark, args))
    if op == "bib-coupling":
        from .operators.linkgraph import bib_coupling

        return bib_coupling(_load_edges(spark, args), min_shared=args.min_shared)
    if op == "rich-club":
        from .operators.linkgraph import rich_club
        from .sources.edges import canonicalize

        return rich_club(canonicalize(_load_edges(spark, args)))
    if op == "truss-number":
        from .operators.linkgraph import truss_number
        from .sources.edges import canonicalize

        return truss_number(canonicalize(_load_edges(spark, args)), rounds=args.rounds)
    if op == "transitivity":
        from .operators.triangles import transitivity

        return transitivity(_load_edges(spark, args))
    if op == "powerlaw":
        from .operators.degrees import degree_powerlaw
        from .sources.edges import canonicalize

        # --k doubles as the degree-tail cutoff dmin here (default 3)
        return degree_powerlaw(canonicalize(_load_edges(spark, args)), dmin=args.k)
    if op == "keep-best":
        from .operators.dedup import keep_best_survivors, minhash_dedup

        docs = _load_docs(spark, args)
        return keep_best_survivors(docs, minhash_dedup(docs))
    if op == "mst":
        from .operators.spanning import minimum_spanning_forest

        return minimum_spanning_forest(_load_edges(spark, args), rounds=args.rounds)
    if op == "weighted-sample":
        from .operators.filtering import weighted_sample_topk

        docs = _load_docs(spark, args)
        return weighted_sample_topk(docs, "doc_id", "n_chars", k=args.top_n)
    if op == "ngram-contamination":
        from .operators.textstats import ngram_contamination

        return ngram_contamination(_load_docs(spark, args), n=args.k)
    if op == "louvain":
        from .operators.louvain import louvain_moves

        return louvain_moves(_load_edges(spark, args), rounds=args.rounds or 4)
    if op == "mis":
        from .operators.mis import luby_mis

        return luby_mis(_load_edges(spark, args), rounds=args.rounds)
    if op == "matching":
        from .operators.mis import maximal_matching

        return maximal_matching(_load_edges(spark, args), rounds=args.rounds)
    if op == "square-count":
        from .operators.triangles import square_count

        return square_count(_load_edges(spark, args))
    if op == "dup-histogram":
        from .operators.dedup import dup_cluster_histogram

        return dup_cluster_histogram(_load_docs(spark, args))
    if op == "robustness":
        from .operators.webgraph import robustness_report

        return robustness_report(_load_edges(spark, args), k=args.k)
    if op == "curation-funnel":
        from .operators.filtering import curation_funnel

        return curation_funnel(_load_docs(spark, args))
    if op == "coloring":
        from .operators.mis import jp_coloring

        return jp_coloring(_load_edges(spark, args), rounds=args.rounds)
    if op == "simrank":
        from .operators.linkgraph import simrank

        # --rounds, not --iterations: the exact pair table grows with
        # iteration count, so the default stays at a safe bounded 2
        return simrank(_load_edges(spark, args), num_iterations=args.rounds or 2)
    if op == "bpe-tokens":
        from .operators.textstats import bpe_token_stats

        return bpe_token_stats(_load_docs(spark, args))
    if op == "closeness":
        from .operators.linkgraph import closeness_centrality
        from .sources.edges import canonicalize

        return closeness_centrality(canonicalize(_load_edges(spark, args)), radius=args.radius)
    if op == "dsir":
        from pyspark.sql import functions as F

        from .operators.textstats import dsir_log_ratio

        docs = _load_docs(spark, args)
        target = docs.filter(F.col("lang") == args.target_lang).select("doc_id")
        return dsir_log_ratio(docs, target)
    sys.exit(f"unknown op {op!r}")


OPS = (
    "curvature forman flow community pagerank components lpa triangles "
    "exact-dedup minhash-dedup repetition corpus-dup quality langid "
    "token-freq hash-split host-stats hits k-core cocitation ppr "
    "adamic-adar clustering assortativity reciprocity avg-neighbor-degree "
    "k-truss bfs neighborhood hyperball salsa sssp harmonic "
    "hyperball-harmonic distance-distribution effective-diameter "
    "hyperball-dd scc bowtie katz host-graph url-normalize random-walks "
    "condensation topo-levels eigenvector betweenness tfidf pii-redact "
    "pack anchor-stats sessions embeddedness contamination "
    "minhash-contamination spam-mass core-number bm25 pmi unigram-kl "
    "bib-coupling rich-club truss-number perplexity transitivity powerlaw "
    "keep-best mst dsir closeness louvain ngram-contamination weighted-sample "
    "mis matching bpe-tokens coloring simrank curation-funnel asof-join "
    "range-join square-count dup-histogram robustness paragraph-dedup "
    "snapshot-dedup containment ppr-sweep scan pagerank-warm kmeans "
    "semantic-dedup link-churn boilerplate url-templates"
).split()


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="graphriccicurvature_spark")
    p.add_argument("op", choices=OPS)
    p.add_argument("--input", help="parquet path/dir; schema auto-detected "
                   "(src,dst -> edges; html -> pages; doc_id -> documents)")
    p.add_argument("--edges", help="parquet of (src, dst[, weight])")
    p.add_argument("--docs", help="dir with documents.parquet (or a parquet path)")
    p.add_argument("--pages", help="parquet of crawl pages (url, html, ...)")
    p.add_argument("--output", help="output parquet dir; omit to print 20 rows")
    p.add_argument("--master", help="override only for local runs; on a cluster "
                   "leave unset so spark-submit --master wins")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--directed", action="store_true")
    p.add_argument("--mode", default="ego", choices=["ego", "component"],
                   help="ego is the scale path; component is exact-parity for small graphs")
    p.add_argument("--method", default="OTDSinkhornMix",
                   choices=["OTD", "ATD", "Sinkhorn", "OTDSinkhornMix"])
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--exp-power", type=float, default=2.0)
    p.add_argument("--nbr-topk", type=int, default=3000)
    p.add_argument("--forman-method", default="augmented", choices=["1d", "augmented"])
    p.add_argument(
        "--iterations", type=int, default=10,
        help="iteration budget, reused per-op: pagerank/hits/ppr/salsa power "
        "iterations, lpa max_iter, flow rounds, sssp rounds, bfs max_hops",
    )
    p.add_argument(
        "--rounds", type=int, default=None,
        help="k-core / k-truss: bounded peel rounds (default: run the exact "
        "fixpoint, one count action per peel round)",
    )
    p.add_argument("--delta", type=float, default=1e-4)
    p.add_argument("--checkpoint-dir", help="flow resume/checkpoint dir")
    p.add_argument("--top-n", type=int, default=100)
    p.add_argument("--target-lang", default="en",
                   help="dsir: lang value defining the target subset")
    p.add_argument("--k", type=int, default=3,
                   help="k-core / k-truss threshold; tfidf top-k terms")
    p.add_argument("--budget", type=int, default=2048,
                   help="pack: token budget per bin")
    p.add_argument("--gap", default="30 minutes",
                   help="sessions: inactivity gap")
    p.add_argument("--events", help="sessions: events parquet path")
    p.add_argument("--prefix", type=int, default=None,
                   help="contamination: canonicalize text to its first N "
                        "chars before hashing (default: full text)")
    p.add_argument("--radius", type=int, default=2,
                   help="neighborhood/hyperball ball radius (hops)")
    p.add_argument("--seeds", help="ppr / ppr-sweep: comma-separated seed node ids")
    p.add_argument("--min-docs", type=int, default=2,
                   help="paragraph-dedup: remove paragraphs in >= this many docs")
    p.add_argument("--threshold", type=float, default=0.8,
                   help="containment: minimum |Sa n Sb| / |Sa|")
    p.add_argument("--max-prefix", type=int, default=50,
                   help="ppr-sweep: sweep the top-k nodes by ppr/deg")
    p.add_argument("--eps", type=float, default=0.5,
                   help="scan: structural-similarity threshold ε")
    p.add_argument("--mu", type=int, default=3,
                   help="scan: minimum ε-neighborhood size for a core")
    p.add_argument("--init-scores", help="pagerank-warm: parquet of "
                   "(node, pagerank) from the previous crawl's run")
    p.add_argument("--edges2", help="link-churn: parquet of the NEW "
                   "snapshot's (src, dst) edges")
    p.add_argument("--init-labels", help="components: parquet of "
                   "(node, component) from the previous crawl's run — "
                   "warm start, EDGE ADDITIONS ONLY")
    p.add_argument("--host-col", default="source",
                   help="boilerplate: column holding the host/site key")
    p.add_argument("--min-frac", type=float, default=0.5,
                   help="boilerplate: min fraction of a host's docs a "
                   "paragraph must appear in to count as template")
    p.add_argument("--alpha-katz", type=float, default=0.1,
                   help="katz attenuation factor")
    p.add_argument("--beta", type=float, default=1.0, help="katz base weight")
    p.add_argument("--exclude-intra", action="store_true",
                   help="host-graph: drop same-host links before aggregating")
    p.add_argument("--min-shared", type=int, default=2,
                   help="cocitation/bib-coupling: min common sources/targets "
                        "per pair; adamic-adar: min common neighbors; "
                        "pmi: min co-occurrence documents per pair")
    p.add_argument("--query", help="bm25: comma-separated query terms")
    args = p.parse_args(argv)
    _autodetect(args)

    spark = build_session(args.master, args.shuffle_partitions)
    out = run_op(spark, args)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        out.show(20, truncate=False)


if __name__ == "__main__":
    main()
