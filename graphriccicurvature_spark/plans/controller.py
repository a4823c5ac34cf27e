"""Round-based checkpoint/metrics controller (north-rule resumability).

Iterative jobs (Ricci flow, PageRank, CC) write each completed round as
parquet plus a ``_metrics.json`` sidecar carrying the round's scalar metrics
and per-partition lineage (partition id -> row count). A restarted job finds
the latest complete round and resumes from it — the Spark analog of the
reference's ``original_RC`` continue-to-refine behavior
(reference/GraphRicciCurvature/OllivierRicci.py:566-567).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RoundCheckpoint:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def _round_dir(self, i: int) -> str:
        return os.path.join(self.base_dir, f"round={i:05d}")

    def complete_rounds(self) -> list[int]:
        out = []
        if not os.path.isdir(self.base_dir):
            return out
        for name in sorted(os.listdir(self.base_dir)):
            if not name.startswith("round="):
                continue
            d = os.path.join(self.base_dir, name)
            if os.path.exists(os.path.join(d, "_metrics.json")) and os.path.exists(
                os.path.join(d, "data", "_SUCCESS")
            ):
                out.append(int(name.split("=")[1]))
        return out

    def save(self, i: int, df: DataFrame, metrics: dict) -> DataFrame:
        """Write round i; returns the re-read DataFrame (lineage truncated)."""
        d = self._round_dir(i)
        t0 = time.time()
        df.write.mode("overwrite").parquet(os.path.join(d, "data"))
        spark = df.sparkSession
        reread = spark.read.parquet(os.path.join(d, "data"))
        part_rows = (
            reread.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .orderBy("pid")
            .collect()
        )
        payload = dict(metrics)
        payload.update(
            {
                "round": i,
                "write_secs": time.time() - t0,
                "partitions": [{"pid": r["pid"], "rows": r["count"]} for r in part_rows],
            }
        )
        with open(os.path.join(d, "_metrics.json"), "w") as fh:
            json.dump(payload, fh)
        return reread

    def load(self, spark: SparkSession, i: int) -> tuple[DataFrame, dict]:
        d = self._round_dir(i)
        with open(os.path.join(d, "_metrics.json")) as fh:
            metrics = json.load(fh)
        return spark.read.parquet(os.path.join(d, "data")), metrics

    def latest(self, spark: SparkSession):
        rounds = self.complete_rounds()
        if not rounds:
            return None
        i = rounds[-1]
        df, metrics = self.load(spark, i)
        return i, df, metrics
