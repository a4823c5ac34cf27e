"""Probe the PageRank serial floor vs parallel compute split.

Runs `pagerank(dense_graph, num_iterations=I)` in THIS process at a given
core count and graph multiplier, printing one JSON line — invoked in
separate JVMs by the sweep in __main__ below to solve
`narrow = F + C, wide = F + C/4` at several problem sizes and pick the
size where a >=0.8 raw 1->4 efficiency is attainable (BENCH.md round-4
analysis: at mult=1/iters=10 the fixed cost F ~ 6 s caps the quotient
at 0.40 regardless of engine quality).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def child(cpus: int, mult: int, iters: int) -> dict:
    from graphriccicurvature_spark.operators.pagerank import pagerank
    from graphriccicurvature_spark.session import get_spark
    from graphriccicurvature_spark.sources.edges import dense_edges_from_documents

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    dense = dense_edges_from_documents(
        spark, SF_DIR, out_degree=32, multiply=mult
    ).cache()
    n_edges = dense.count()
    # warm-up: 2 rounds, full graph (JIT for the join/agg codegen)
    pagerank(dense, num_iterations=2, directed=True).count()
    t0 = time.time()
    pagerank(dense, num_iterations=iters, directed=True).count()
    t = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "mult": mult, "iters": iters, "n_edges": n_edges, "secs": round(t, 3)}


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        print(json.dumps(child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))))
        return
    mults = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "4,16").split(",")]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = []
    for mult in mults:
        for cpus in (4, 1):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(cpus), str(mult), str(iters)],
                capture_output=True, text=True,
            )
            r = json.loads(p.stdout.strip().splitlines()[-1])
            out.append(r)
            print(r, flush=True)
    # solve F + C = narrow, F + C/4 = wide per mult
    by_mult = {}
    for r in out:
        by_mult.setdefault(r["mult"], {})[r["cpus"]] = r["secs"]
    for mult, d in sorted(by_mult.items()):
        if 1 in d and 4 in d:
            F = max((4 * d[4] - d[1]) / 3.0, 0.0)
            C = d[1] - F
            eff = (d[1] / d[4]) / 4.0
            print(json.dumps({"mult": mult, "narrow": d[1], "wide": d[4],
                              "F_serial": round(F, 2), "C_parallel": round(C, 2),
                              "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
