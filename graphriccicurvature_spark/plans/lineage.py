"""Lineage truncation for iterative DataFrame algorithms.

``DataFrame.localCheckpoint`` truncates the RDD lineage but *rewrites* the
new LogicalRDD's statistics from the original plan
(``LogicalRDD.rewriteStatsAndConstraints``). For iterative algorithms whose
per-round plan contains joins, the size-in-bytes estimate is a *product*
over join children, so the inherited estimate grows double-exponentially
across rounds — after a few dozen rounds Catalyst spends whole seconds
multiplying million-digit BigInts and finally dies with "BigInteger would
overflow supported range" (observed on a 40-round Ricci flow over 78 edges).

``truncate_plan`` materializes the same local checkpoint but wraps the RDD
in a *fresh* LogicalRDD without the stats rewrite, so every round restarts
from default stats. Compile-time broadcast decisions are unaffected in
practice because AQE re-plans joins from actual runtime sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_plan(df: DataFrame, eager: bool = True) -> DataFrame:
    """Checkpoint ``df`` in executor memory and return a DataFrame whose
    logical plan is a bare LogicalRDD (no inherited statistics).

    ``eager=False`` defers materialization to the *first action* on the
    returned DataFrame — iterative loops use this to fold a per-round
    scalar aggregate (convergence delta) into the same job that
    materializes the round's state, instead of paying a separate job."""
    spark = df.sparkSession
    # localCheckpoint copies each InternalRow before caching (raw toRdd()
    # iterators reuse mutable row buffers, so checkpointing those directly
    # would corrupt the data); the rewrap below discards the inherited stats.
    lc = df.localCheckpoint(eager=eager)
    try:
        jdf = lc._jdf
        jrdd = jdf.queryExecution().toRdd()
        jdf2 = spark._jsparkSession.internalCreateDataFrame(jrdd, jdf.schema(), False)
        return DataFrame(jdf2, spark)
    except Exception:  # pragma: no cover - fallback for API drift
        return lc
