"""SparkSession helpers shared by tests, bench, and the driver contract."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "graphriccicurvature-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults are sized for local testing; on a real cluster the same code runs
    under ``spark-submit --py-files`` with cluster-provided configs. AQE is on
    so skewed self-joins on hub vertices get split at runtime.
    """
    master = master or os.environ.get("SPARK_MASTER", "local[4]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "8"))
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        # tmpfs-backed shuffle: on a single box, disk-backed shuffle saturates
        # well below core count and masks compute scaling; a real cluster adds
        # shuffle bandwidth with every node, which tmpfs approximates here.
        local_dir = "/dev/shm/spark-local"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.local.dir", local_dir or "/tmp")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches are capped by ROW count, but ego-gather rows carry
        # O(block_edges x degree) array payload — 10k fat rows per batch
        # OOM-kills python workers on dense graphs. 1024 rows ≈ 16-32k
        # edges per batch, still plenty for batched-EMD/Sinkhorn amortization.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # bucketed tables (sources/bucketed.py) land here, not in ./spark-warehouse
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/grc_warehouse"),
        )
    )
    # ``SPARK_GRAFT_EXTRA_CONFS="k1=v1;k2=v2"`` — session-level overrides for
    # workload-specific tuning (e.g. the scaling child disables AQE: its job
    # uses explicit numbered partitioning throughout, so AQE's per-exchange
    # query-stage barriers are pure serial overhead there).
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONFS", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    return builder.getOrCreate()
