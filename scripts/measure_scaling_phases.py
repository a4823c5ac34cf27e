"""Decompose the dense-graph ego-curvature wall into pipeline phases at one
parallelism level — the diagnostic behind the round-3 scaling work.

Usage: python scripts/measure_scaling_phases.py <cpus>

Prints cumulative walls for nested plan prefixes (each timing re-executes
its upstream, so phase cost = difference of consecutive cumulative walls):

  adj      adjacency arrays build (symmetrize + groupBy collect_list)
  blocks   + eval-edge chunking, repartition, target-side join, block fold
  gather   + member explode, member-adjacency join, gather fold
  solve    + mapInArrow Arrow-batch kernel (full operator)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(cpus: int) -> None:
    from graphriccicurvature_spark.operators import ollivier as O
    from graphriccicurvature_spark.operators.ollivier import ricci_curvature_edges
    from graphriccicurvature_spark.session import get_spark
    from graphriccicurvature_spark.sources.edges import (
        canonicalize,
        dense_edges_from_documents,
        symmetrize,
    )

    spark = get_spark(master=f"local[{cpus}]", app_name="phase-diag",
                      shuffle_partitions=max(cpus, 8))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dense = dense_edges_from_documents(spark, sf, out_degree=32, multiply=4).cache()
    und = canonicalize(dense).cache()
    n = und.count()

    out_view = symmetrize(und)
    adj = O._adjacency(out_view, "src", "dst", "out", cap=3000)

    def t(fn):
        t0 = time.time()
        fn()
        return round(time.time() - t0, 2)

    # warm-up full pass (JIT + python workers + native compile)
    ricci_curvature_edges(und, method="OTDSinkhornMix", mode="ego").count()

    walls = {}
    walls["adj"] = t(lambda: adj.agg(F.sum(F.size("out_nbrs"))).collect())

    # rebuild the operator's own plan prefixes by running the operator with
    # a stub solve: mapInArrow is the last step, so timing the plan up to
    # `full` (forcing the heavy array columns) isolates the JVM gather.
    ev = und.select("src", "dst", "weight")
    # replicate _ego_mode up to the block fold
    adj_out = O._adjacency(out_view, "src", "dst", "out", cap=3000).cache()
    cnt = ev.groupBy("src").agg(F.count("*").alias("_nev"))
    ev2 = ev.join(cnt, "src").withColumn(
        "_blk",
        F.pmod(
            F.xxhash64("dst"),
            F.greatest(F.ceil(F.col("_nev") / F.lit(O.BLOCK_MAX_EDGES)), F.lit(1)),
        ).cast("int"),
    ).drop("_nev")
    n_part = max(
        spark.sparkContext.defaultParallelism * 4,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    ev2 = ev2.repartition(n_part, "src", "_blk")
    evt = ev2.join(
        adj_out.select(
            F.col("node").alias("dst"),
            F.col("out_nbrs").alias("t_nbrs"),
            F.col("out_ws").alias("t_ws"),
        ),
        "dst",
        "left",
    )
    blocks = evt.groupBy("src", "_blk").agg(
        F.collect_list(
            F.struct(
                F.col("dst").alias("dst"),
                F.col("weight").alias("weight"),
                F.coalesce("t_nbrs", O._empty_l()).alias("t_nbrs"),
                F.coalesce("t_ws", O._empty_d()).alias("t_ws"),
            )
        ).alias("targets")
    )
    walls["blocks"] = t(
        lambda: blocks.agg(F.sum(F.size(F.col("targets")))).collect()
    )
    e1 = blocks.join(
        adj_out.select(
            F.col("node").alias("src"),
            F.col("out_nbrs").alias("s_nbrs"),
            F.col("out_ws").alias("s_ws"),
        ),
        "src",
        "left",
    ).select(
        "src", "_blk", "targets",
        F.coalesce("s_nbrs", O._empty_l()).alias("s_nbrs"),
        F.coalesce("s_ws", O._empty_d()).alias("s_ws"),
    )
    members = e1.select(
        "src", "_blk",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array("src"),
                    F.col("s_nbrs"),
                    F.flatten(
                        F.transform(
                            "targets",
                            lambda tt: F.concat(F.array(tt["dst"]), tt["t_nbrs"]),
                        )
                    ),
                )
            )
        ).alias("member"),
    )
    adj_member = adj_out.select(
        F.col("node").alias("member"),
        F.col("out_nbrs").alias("m_nbrs"),
        F.col("out_ws").alias("m_ws"),
    )
    mem_adj = members.join(adj_member, "member", "left")
    gathered = mem_adj.groupBy("src", "_blk").agg(
        F.collect_list("member").alias("members"),
        F.collect_list(F.coalesce("m_nbrs", O._empty_l())).alias("members_nbrs"),
        F.collect_list(F.coalesce("m_ws", O._empty_d())).alias("members_ws"),
    )
    full = e1.join(gathered, ["src", "_blk"]).select(
        "src", "targets", "s_nbrs", "s_ws", "members", "members_nbrs", "members_ws",
    )
    walls["gather"] = t(
        lambda: full.agg(
            F.sum(F.size("members")), F.sum(F.size(F.col("members_nbrs")))
        ).collect()
    )
    walls["solve"] = t(
        lambda: ricci_curvature_edges(und, method="OTDSinkhornMix", mode="ego").count()
    )
    print(json.dumps({"cpus": cpus, "n_edges": n, "cumulative_walls": walls}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
