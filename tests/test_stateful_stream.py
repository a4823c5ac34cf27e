"""Custom stateful streaming operator (applyInPandasWithState)."""

import shutil

from pyspark.sql import functions as F

from graphriccicurvature_spark.streaming.events import running_type_totals_stream


def test_running_type_totals_matches_batch(tmp_path, spark):
    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    stream_dir = tmp_path / "ev"
    stream_dir.mkdir()
    shutil.copy(f"{sf}/events.parquet", stream_dir / "p0.parquet")

    out = running_type_totals_stream(spark, str(stream_dir), ev.schema)
    q = (
        out.writeStream.format("memory")
        .queryName("type_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode: take the latest row per event_type
    got = {
        r.event_type: (r.n_events, round(r.sum_value, 6))
        for r in spark.sql(
            "select * from (select *, row_number() over "
            "(partition by event_type order by n_events desc) rn from type_totals) "
            "where rn = 1"
        ).collect()
    }
    want = {
        r.event_type: (r.n, round(r.s, 6))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_running_host_stats_matches_batch(tmp_path, spark):
    from graphriccicurvature_spark.operators.textstats import host_stats
    from graphriccicurvature_spark.sources.pages import generate_pages
    from graphriccicurvature_spark.streaming.events import (
        running_host_stats_stream,
    )

    pages = generate_pages(spark, 100)
    stream_dir = tmp_path / "pages"
    # two files -> two micro-batches under availableNow
    pages.filter("url like '%/p/1%' or url like '%/p/2%'").coalesce(1).write.parquet(
        str(stream_dir / "b0"), mode="overwrite"
    )
    pages.filter(
        "not (url like '%/p/1%' or url like '%/p/2%')"
    ).coalesce(1).write.parquet(str(stream_dir / "b1"), mode="overwrite")
    flat = tmp_path / "flat"
    flat.mkdir()
    import glob
    import shutil

    for i, f in enumerate(
        sorted(glob.glob(str(stream_dir / "b*" / "*.parquet")))
    ):
        shutil.copy(f, flat / f"p{i}.parquet")

    out = running_host_stats_stream(spark, str(flat), pages.schema)
    q = (
        out.writeStream.format("memory")
        .queryName("host_totals")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.host: (r.n_pages, r.n_langs, r.n_tokens_total)
        for r in spark.sql("select * from host_totals").collect()
    }
    want = {
        r.host: (r.n_pages, r.n_langs, r.n_tokens_total)
        for r in host_stats(pages).collect()
    }
    assert got == want
