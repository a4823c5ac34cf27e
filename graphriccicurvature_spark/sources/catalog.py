"""Table source abstraction: Iceberg when available, parquet otherwise.

The north rule targets Iceberg tables of Common-Crawl-style pages. This
container has no Iceberg runtime jar, so the engine reads through this
helper: an ``iceberg:`` / catalog-table identifier goes through the Iceberg
DataSource (available on a real cluster via
``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...``),
anything else is read as parquet. All downstream operators only see
DataFrames, so the swap is total at this boundary. Partition pruning and
column pruning push into either format via Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read ``ref`` as a DataFrame.

    - ``iceberg:<catalog.db.table>`` -> Iceberg catalog table
    - ``<name>`` registered in the session catalog -> ``spark.table``
    - otherwise -> parquet path
    """
    if ref.startswith("iceberg:"):
        return spark.read.format("iceberg").load(ref[len("iceberg:") :])
    try:
        if spark.catalog.tableExists(ref):
            return spark.table(ref)
    except Exception:
        pass
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    """Write a result table (Iceberg when addressed as such, else parquet)."""
    if ref.startswith("iceberg:"):
        df.writeTo(ref[len("iceberg:") :]).createOrReplace()
        return
    df.write.mode(mode).parquet(ref)
