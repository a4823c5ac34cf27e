"""spark-submit entrypoint (north rule: runs via spark-submit --py-files).

Package and submit::

    cd /root/repo && zip -qr /tmp/grc_spark.zip graphriccicurvature_spark
    spark-submit --py-files /tmp/grc_spark.zip scripts/run_job.py \
        --job curvature --input /data/pages_parquet --output /data/curvature_out \
        [--mode ego --method OTDSinkhornMix --alpha 0.5 --nbr-topk 64]

Jobs: curvature | flow | pagerank | components | triangles | community.
Input: a parquet directory with either an ``edges(src,dst,weight)`` table or
a ``pages``/``documents`` table (edges are derived). Output: parquet.
"""

from __future__ import annotations

import argparse
import sys


def _load_edges(spark, path: str):
    from pyspark.sql import functions as F

    from graphriccicurvature_spark.sources.edges import prepare_edges
    from graphriccicurvature_spark.sources.extract import pages_to_edges

    df = spark.read.parquet(path)
    cols = set(df.columns)
    if {"src", "dst"} <= cols:
        return prepare_edges(df)
    if "html" in cols:  # pages table
        edges, _ = pages_to_edges(df)
        return edges
    if "doc_id" in cols:  # documents table -> deterministic F2 link graph
        from graphriccicurvature_spark.sources.edges import edges_from_documents
        import os

        return edges_from_documents(spark, os.path.dirname(path.rstrip("/")))
    raise SystemExit(
        f"input at {path} has no (src,dst) edge, pages(html), or documents(doc_id) "
        f"schema: {sorted(cols)}"
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--job", required=True,
                   choices=["curvature", "flow", "pagerank", "components", "triangles", "community"])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--mode", default="ego", choices=["ego", "component"])
    p.add_argument("--method", default="OTDSinkhornMix")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--exp-power", type=float, default=2.0)
    p.add_argument("--nbr-topk", type=int, default=3000)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--directed", action="store_true")
    p.add_argument("--checkpoint-dir", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"grc-{args.job}").getOrCreate()
    edges = _load_edges(spark, args.input)

    from graphriccicurvature_spark.sources.edges import canonicalize

    if args.job == "curvature":
        from graphriccicurvature_spark.operators.ollivier import ricci_curvature_edges

        out = ricci_curvature_edges(
            edges if args.directed else canonicalize(edges),
            directed=args.directed, alpha=args.alpha, method=args.method,
            exp_power=args.exp_power, nbr_topk=args.nbr_topk, mode=args.mode,
        )
    elif args.job == "flow":
        from graphriccicurvature_spark.operators.flow import ricci_flow

        out = ricci_flow(
            canonicalize(edges), iterations=args.iterations, alpha=args.alpha,
            method=args.method, exp_power=args.exp_power, nbr_topk=args.nbr_topk,
            mode=args.mode, checkpoint_dir=args.checkpoint_dir,
        )
    elif args.job == "pagerank":
        from graphriccicurvature_spark.operators.pagerank import pagerank

        out = pagerank(edges, num_iterations=args.iterations, directed=args.directed)
    elif args.job == "components":
        from graphriccicurvature_spark.operators.components import connected_components

        out = connected_components(edges)
    elif args.job == "triangles":
        from graphriccicurvature_spark.operators.triangles import triangle_counts

        out = triangle_counts(edges)
    else:  # community
        from graphriccicurvature_spark.operators.community import ricci_community

        cut, out = ricci_community(canonicalize(edges))
        print(f"community cutoff: {cut}")

    out.write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.output}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
