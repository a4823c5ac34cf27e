"""Round-6 optimization measurement harness (bench.py stays FROZEN).

Per-query isolation per the optimization guide §1: each query is timed
with the noop sink (computes every column, discards output), labelled via
``setJobDescription``, and its ``explain("formatted")`` is dumped to
``plans/r06/<name>_<tag>.txt``. Job/stage counts per query come from the
status tracker, so per-round job overhead (the dominant cost at sf0.1)
is visible without the UI.

Usage::

    python bench_extra.py [--tag before|after] [--only q1,q2] [--trials N]

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
$SPARK_GRAFT_CPUS (default 32) exactly like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _spark():
    from graphriccicurvature_spark.session import get_spark

    return get_spark(
        master=f"local[{CPUS}]", app_name="bench_extra",
        shuffle_partitions=max(CPUS, 8),
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_queries(spark):
    """Same workloads as bench.py's per-query table, as (name, fn) pairs.

    fn() returns a DataFrame; the harness times a noop write of it.
    Loop-style operators (flow) execute inside fn and return the final df.
    """
    from pyspark.sql import functions as F

    from graphriccicurvature_spark.operators.components import connected_components
    from graphriccicurvature_spark.operators.dedup import minhash_dedup
    from graphriccicurvature_spark.operators.filtering import (
        curation_funnel,
        document_filter,
    )
    from graphriccicurvature_spark.operators.forman import forman_curvature
    from graphriccicurvature_spark.operators.linkgraph import (
        adamic_adar,
        clustering_coefficient,
        cocitation_jaccard,
        hits,
        hyperball,
        k_core,
        k_truss,
        simrank,
    )
    from graphriccicurvature_spark.operators.louvain import louvain_moves
    from graphriccicurvature_spark.operators.ollivier import ricci_curvature_edges
    from graphriccicurvature_spark.operators.pagerank import pagerank
    from graphriccicurvature_spark.operators.similarity import cosine_topk_bruteforce
    from graphriccicurvature_spark.operators.spanning import minimum_spanning_forest
    from graphriccicurvature_spark.operators.textstats import (
        corpus_dup_passages,
        repetition_stats,
    )
    from graphriccicurvature_spark.operators.triangles import triangle_count_global
    from graphriccicurvature_spark.operators.webgraph import (
        host_graph,
        katz_centrality_bounded,
        strongly_connected_components,
    )
    from graphriccicurvature_spark.sources.edges import (
        canonicalize,
        edges_from_documents,
    )
    from graphriccicurvature_spark.sources.extract import extract_links
    from graphriccicurvature_spark.sources.pages import generate_pages

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    edges = edges_from_documents(spark, SF_DIR).cache()
    edges.count()
    und = canonicalize(edges).cache()
    und.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    n_docs = docs.count()
    pages = generate_pages(spark, n_docs)
    url_edges = (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(extract_links("html")).alias("dst_url"),
        )
        .filter(F.col("src_url") != F.col("dst_url"))
        .dropDuplicates(["src_url", "dst_url"])
    )

    qs = [
        ("ollivier_ego", lambda: ricci_curvature_edges(und, method="OTDSinkhornMix", mode="ego")),
        ("pagerank_10it", lambda: pagerank(edges, num_iterations=10, directed=True)),
        ("connected_components", lambda: connected_components(und)),
        ("triangle_count", lambda: triangle_count_global(und)),
        ("forman_augmented", lambda: forman_curvature(und, "augmented")),
        ("minhash_dedup", lambda: minhash_dedup(docs)),
        ("repetition_stats", lambda: repetition_stats(docs)),
        ("corpus_dup_passages", lambda: corpus_dup_passages(docs)),
        ("hits_10it", lambda: hits(edges, num_iterations=10, directed=True)),
        ("k_core_3_fixpoint", lambda: k_core(und, k=3)),
        ("cocitation_jaccard", lambda: cocitation_jaccard(edges, min_shared=2)),
        ("adamic_adar", lambda: adamic_adar(und, min_common=2)),
        ("clustering_coeff", lambda: clustering_coefficient(und)),
        ("k_truss_3_2r", lambda: k_truss(und, k=3, rounds=2)),
        ("hyperball_3", lambda: hyperball(und, radius=3)),
        ("scc", lambda: strongly_connected_components(edges)),
        ("katz_5it", lambda: katz_centrality_bounded(edges, num_iterations=5)),
        ("mst_boruvka", lambda: minimum_spanning_forest(und)),
        ("louvain_4r", lambda: louvain_moves(und, rounds=4)),
        ("host_graph", lambda: host_graph(url_edges)),
        ("doc_filter", lambda: document_filter(docs)),
        ("ann_cosine_brute", lambda: cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 8), k=10)),
        ("simrank_2", lambda: simrank(edges, num_iterations=2)),
        ("curation_funnel", lambda: curation_funnel(docs)),
    ]
    return qs, und


def run_flow(spark, und):
    from graphriccicurvature_spark.operators.flow import ricci_flow

    rs: list = []
    t0 = time.time()
    ricci_flow(und, iterations=8, delta=1e-4, mode="ego", round_stats=rs).count()
    total = time.time() - t0
    return {
        "ricci_flow_ego_to_8rounds": round(total, 3),
        "ego_sec_per_round": round(sum(r["secs"] for r in rs) / max(len(rs), 1), 3),
        "rounds": len(rs),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--only", default=None)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--plans", action="store_true", help="dump explain output")
    ap.add_argument("--flow", action="store_true", help="also time the flow loop")
    args = ap.parse_args()

    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = _spark()
    sc = spark.sparkContext
    qs, und = build_queries(spark)
    only = set(args.only.split(",")) if args.only else None
    out: dict = {}
    jobs: dict = {}
    for name, fn in qs:
        if only and name not in only:
            continue
        if args.plans:
            try:
                df = fn()
                jvm = spark.sparkContext._jvm
                txt = jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(PLAN_DIR, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(txt)
            except Exception as exc:  # plan dump never blocks timing
                print(f"[plan {name}] failed: {exc}", file=sys.stderr)
        best = None
        for _ in range(args.trials):
            sc.setJobDescription(f"{name} [{args.tag}]")
            j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            t0 = time.time()
            _noop(fn())
            dt = time.time() - t0
            j1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            best = dt if best is None or dt < best else best
            jobs[name] = j1 - j0
        sc.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}s  jobs={jobs[name]}", flush=True)
    if args.flow and (only is None or "flow" in only):
        sc.setJobDescription(f"ricci_flow [{args.tag}]")
        out.update(run_flow(spark, und))
        print(f"flow: {out.get('ricci_flow_ego_to_8rounds')}s", flush=True)
    print(json.dumps({"tag": args.tag, "sf": SF_DIR, "queries": out, "jobs": jobs}))
    spark.stop()


if __name__ == "__main__":
    main()
