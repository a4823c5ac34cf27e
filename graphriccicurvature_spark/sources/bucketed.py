"""Bucketed edge storage: co-located joins without a shuffle.

The big repeated cost in iterative link-graph analytics is re-shuffling the
edge table on ``src`` for every neighbor expansion. Persisting the edges
bucketed by ``src`` (hash-bucketed files + per-bucket sort) lets every
subsequent equi-join or aggregation keyed on ``src`` read co-located
buckets directly — Catalyst elides the Exchange on both sides of a
bucketed self-join (verified by plan assertion in
tests/test_round2_fixes.py). At 100 TB this converts the per-query O(E)
shuffle of the hot table into a one-time write cost.

Spark bucketing requires a catalog table (``saveAsTable``); the warehouse
location is session-configured (``spark.sql.warehouse.dir``). On a real
cluster the same call shapes write to the production metastore/Iceberg
catalog (Iceberg's ``bucket(N, src)`` partition transform is the
equivalent layout — see sources/catalog.py for the read path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed_edges(
    edges: DataFrame, table: str, buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Persist ``edges(src, dst, weight)`` hash-bucketed and sorted by src."""
    (
        edges.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, "src")
        .sortBy("src")
        .saveAsTable(table)
    )


def load_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed edge table; joins/aggregations on ``src`` against it
    skip the exchange (bucket metadata comes from the catalog)."""
    return spark.table(table)
