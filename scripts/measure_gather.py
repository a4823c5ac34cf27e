"""Measure wall time + total shuffle write of the ego curvature stage on
the dense bench graph (out_degree=32) — evidence for the CSR-blocked
gather's payload cut (each member adjacency row ships once per src block
instead of once per incident edge).

Usage: python scripts/measure_gather.py [out_degree] [sf_dir]
Prints one JSON line with wall seconds and shuffle-write bytes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shuffle_write_bytes(spark) -> int:
    """Sum shuffle-write bytes over all completed stages (AppStatusStore)."""
    store = spark._jsparkSession.sparkContext().statusStore()
    stages = store.stageList(
        spark._jvm.java.util.ArrayList(),
        getattr(store, "stageList$default$2")(),
        getattr(store, "stageList$default$3")(),
        getattr(store, "stageList$default$4")(),
        getattr(store, "stageList$default$5")(),
    )
    total = 0
    for i in range(stages.size()):
        total += stages.apply(i).shuffleWriteBytes()
    return int(total)


def main():
    out_degree = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from graphriccicurvature_spark.operators.ollivier import ricci_curvature_edges
    from graphriccicurvature_spark.session import get_spark
    from graphriccicurvature_spark.sources.edges import (
        canonicalize,
        dense_edges_from_documents,
    )

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    und = canonicalize(dense_edges_from_documents(spark, sf, out_degree=out_degree)).cache()
    n = und.count()
    # warm-up
    ricci_curvature_edges(und, method="OTDSinkhornMix", mode="ego").count()
    b0 = shuffle_write_bytes(spark)
    t0 = time.time()
    ricci_curvature_edges(und, method="OTDSinkhornMix", mode="ego").count()
    secs = time.time() - t0
    b1 = shuffle_write_bytes(spark)
    print(
        json.dumps(
            {
                "out_degree": out_degree,
                "n_edges": n,
                "curvature_secs": round(secs, 3),
                "shuffle_write_mb": round((b1 - b0) / 1e6, 2),
                "edges_per_sec": round(n / secs, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
