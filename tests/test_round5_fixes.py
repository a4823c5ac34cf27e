"""Round-5 fixes under test: degenerate-parameter validation (hits),
distance-distribution zero-filled spine, cache hygiene, CLI --rounds,
and the oracle-type audit invariant (DuckDB HUGEINT sums vs Spark bigint).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.operators.linkgraph import (
    distance_distribution,
    hits,
    personalized_pagerank,
    reciprocity,
    salsa,
)


def _edges_df(spark, pairs, weight=1.0):
    return spark.createDataFrame(
        [(int(s), int(d), float(weight)) for s, d in pairs],
        "src long, dst long, weight double",
    )


def test_hits_zero_iterations_raises(spark):
    e = _edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError, match="num_iterations"):
        hits(e, num_iterations=0)


def test_hits_empty_graph_raises(spark):
    e = _edges_df(spark, [(1, 2)]).filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        hits(e, num_iterations=3)


def test_distance_distribution_full_spine_past_saturation(spark):
    # path graph 1-2-3: diameter 2, so radius=5 saturates at d=2; the
    # output must still carry radius+1 rows with zero-filled tail
    e = _edges_df(spark, [(1, 2), (2, 3)])
    rows = {r["d"]: r["pairs"] for r in distance_distribution(e, radius=5).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4, 5]
    assert rows[0] == 3  # self-pairs
    assert rows[1] == 4  # ordered adjacent pairs
    assert rows[2] == 2  # (1,3) and (3,1)
    assert rows[3] == rows[4] == rows[5] == 0


def test_cache_hygiene_no_leaked_storage(spark):
    """hits / ppr / salsa / reciprocity must unpersist every DataFrame they
    cache: a long-lived driver calling them repeatedly should not
    accumulate executor storage."""
    e = _edges_df(spark, [(1, 2), (2, 3), (3, 1), (2, 1)])
    seeds = spark.createDataFrame([(1,)], "node long")
    jsc = spark.sparkContext._jsc.sc()

    def n_cached():
        return jsc.getPersistentRDDs().size()

    base = n_cached()
    hits(e, num_iterations=2).count()
    personalized_pagerank(e, seeds, num_iterations=2).count()
    salsa(e, num_iterations=2).count()
    reciprocity(e).count()
    # truncate_plan's localCheckpoint RDDs are storage too, but they belong
    # to the *returned* result lineage; operator-internal caches must be gone.
    # Allow the returned results' own checkpoint RDDs (bounded per call),
    # but a leak of nodes/base_nodes/dangling/auths/hubs/e would add >=7.
    # unpersist() is async (blocking=False): under CPU contention the
    # executor-side release can lag the driver call, so poll briefly
    # before declaring a leak.
    import gc
    import time

    leaked = n_cached() - base
    for _ in range(20):
        if leaked <= 8:
            break
        # the returned results' checkpoint RDDs release via Spark's
        # ContextCleaner only after their py4j handles are GC'd — in a
        # long full-suite session that can lag the 10s poll, so force
        # both collectors each iteration (order-dependent flake seen in
        # the round-5 full run, passes in isolation without this)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        leaked = n_cached() - base
    assert leaked <= 8, f"persistent RDDs grew by {leaked}"


def test_reciprocity_values_after_cache_fix(spark):
    e = _edges_df(spark, [(1, 2), (2, 1), (2, 3), (3, 3)])
    row = reciprocity(e).collect()[0]
    assert row["n_arcs"] == 3  # self-loop dropped
    assert row["n_reciprocal"] == 2
    assert abs(row["reciprocity"] - 2 / 3) < 1e-12


def test_cli_k_core_rounds_flag(spark, tmp_path):
    import subprocess
    import sys
    import os

    edges = _edges_df(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    p = str(tmp_path / "edges.parquet")
    edges.write.parquet(p)
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "graphriccicurvature_spark", "k-core",
         "--edges", p, "--output", out, "--k", "2", "--rounds", "2",
         "--master", "local[2]"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {row["node"] for row in spark.read.parquet(out).collect()}
    assert got == {1, 2, 3}


def test_oracle_integer_sums_are_cast_to_bigint():
    """DuckDB sum(int) yields HUGEINT -> Arrow decimal128; the driver's
    value-hash then disagrees with Spark's bigint even at equal values
    (the CORRECTNESS_r04 corpus_dup_passages/hash_split/host_stats
    failures). Guard: every oracle whose Spark twin emits bigint must
    type as int64 in DuckDB's Arrow output."""
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("documents", "events", "embeddings", "lineitem", "orders",
              "customer", "supplier", "part", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = []
    for name in ("corpus_dup_passages", "hash_split", "host_stats", "ppm_decode"):
        schema = con.execute(entry.oracle_sql()[name]).arrow().schema
        for f in schema:
            if "decimal" in str(f.type) or "int128" in str(f.type):
                bad.append(f"{name}.{f.name}: {f.type}")
    assert not bad, bad
