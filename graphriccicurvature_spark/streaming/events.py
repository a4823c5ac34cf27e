"""Structured-Streaming operators over the ``events`` table.

The reference is batch-iterative only (SURVEY.md §2.2 — no streams), so the
streaming surface here is the north-star-adjacent plumbing a link-graph
pipeline needs: windowed event aggregation with watermarks, plus an
incremental edge-ingest that folds micro-batches into the canonical edge
table. Each streaming query has a batch-equivalent twin (same column
expressions) so correctness is oracle-checkable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type (batch twin of the
    streaming query; identical expressions)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_event_counts_stream(
    spark: SparkSession,
    events_dir: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming variant: file source + watermark for late data."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    # watermarks require TIMESTAMP (tz-aware); parquet NTZ columns are cast
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def running_type_totals_stream(
    spark: SparkSession,
    events_dir: str,
    schema,
):
    """Custom stateful operator: running per-event-type totals via
    ``applyInPandasWithState`` (update mode) — the pattern for stateful
    logic Structured Streaming's built-in aggregates can't express
    (here kept oracle-checkable: state = (count, sum) per event_type).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(events_dir)

    def update(key, pdfs, state):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_events": [cnt], "sum_value": [total]}
        )

    return (
        stream.groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType="event_type string, n_events long, sum_value double",
            stateStructType="cnt long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def incremental_edge_ingest(
    spark: SparkSession,
    pages_dir: str,
    schema,
    edges_out: str,
    checkpoint: str,
):
    """Fold streamed page micro-batches into the canonical edge table.

    readStream over a pages directory -> per-batch link extraction
    (sources.extract, vectorized) -> append to the canonical parquet edge
    table via foreachBatch. Exactly-once per file via the stream checkpoint.
    Returns the started StreamingQuery (availableNow trigger).
    """
    from ..sources.extract import pages_to_edges

    stream = spark.readStream.schema(schema).parquet(pages_dir)

    def fold(batch_df, batch_id):
        edges, _ = pages_to_edges(batch_df)
        edges.write.mode("append").parquet(edges_out)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_exact_dedup(
    spark: SparkSession,
    docs_dir: str,
    schema,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
):
    """Streaming exact dedup: first document per md5(text) survives.

    With ``ts_col`` set (time-stamped corpora, e.g. warc_ts), uses
    ``dropDuplicatesWithinWatermark`` so the dedup state is bounded by the
    watermark horizon — the only state shape that survives an unbounded
    crawl stream. Without a timestamp it falls back to plain
    ``dropDuplicates`` on the hash (state grows with distinct documents;
    fine for bounded backfills, documented trade-off).
    """
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    hashed = stream.withColumn("group_hash", F.md5(F.col(text_col)))
    if ts_col is not None:
        hashed = hashed.withColumn("_ts", F.col(ts_col).cast("timestamp"))
        return hashed.withWatermark("_ts", watermark).dropDuplicatesWithinWatermark(
            ["group_hash"]
        )
    return hashed.dropDuplicates(["group_hash"])


def run_stream_to_memory(stream_df, name: str):
    """Drain a stream with availableNow into an in-memory sink (tests)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def session_event_counts_batch(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Per-user session aggregation with a ``gap`` inactivity timeout —
    ``F.session_window`` in batch mode (batch twin of the streaming
    query; identical expressions). Returns
    ``(user_id, session_start, session_end, n_events, sum_value)`` with
    ``session_end = last event + gap`` (Spark session-window semantics;
    the DuckDB oracle reproduces it gaps-and-islands style with
    ``lag()`` + a cumulative break count).

    Sessionization is the canonical stateful-stream operator a crawl/
    clickstream pipeline needs (visit stitching, crawl-session cost
    attribution). The groupBy is keyed (user, session_window): Spark
    sorts within the user partition and merges overlapping windows —
    shuffle keyed by user, per-partition sort bounded by that user's
    events, the same skew profile as host_top_pages.
    """
    return (
        events.groupBy(
            F.session_window(F.col("ts"), gap).alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_event_counts_stream(
    spark: SparkSession,
    events_dir: str,
    schema,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    """Streaming sessionization: file source + watermark; session windows
    close when the watermark passes session_end, giving exactly-once
    per-session output in append mode."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def running_host_stats_stream(
    spark: SparkSession,
    pages_dir: str,
    schema,
):
    """Streaming twin of ``textstats.host_stats``: running per-host page,
    distinct-language and token totals over a pages file stream — the
    live crawl-monitoring rollup (per-domain ingest rates feed politeness
    budgets and domain blocklists while the crawl runs).

    Complete-mode keyed aggregate: state is one row per host (hosts are
    bounded — millions, not trillions — so host-keyed state survives an
    unbounded page stream where page-keyed state would not). The
    expressions are IDENTICAL to the batch operator, so a drained
    availableNow pass must equal host_stats on the same files
    (stream==batch parity test), and restarts resume exactly-once from
    the checkpoint like every other stream here.

    approx_count_distinct replaces the batch exact count(DISTINCT lang):
    exact distinct inside a streaming aggregate would keep per-(host,
    lang) state; the HLL++ sketch is mergeable per micro-batch. At a
    5-language corpus the sketch is exact, which is what the parity test
    pins.
    """
    from ..operators.textstats import token_count

    stream = spark.readStream.schema(schema).parquet(pages_dir)
    host = F.regexp_extract(F.col("url"), r"^https?://([^/]+)/", 1)
    return (
        stream.select(
            host.alias("host"),
            F.col("lang"),
            token_count(F.col("text")).alias("nt"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.approx_count_distinct("lang").alias("n_langs"),
            F.sum("nt").alias("n_tokens_total"),
        )
    )
