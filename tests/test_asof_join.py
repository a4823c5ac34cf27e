import datetime as dt
import random

import duckdb

from graphriccicurvature_spark.operators.temporal import asof_join_backward


def test_asof_matches_duckdb(spark):
    rng = random.Random(3)
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, rng.randrange(5), base + dt.timedelta(seconds=rng.randrange(10000)))
        for i in range(60)
    ]
    rrows = [
        (100 + i, rng.randrange(5), base + dt.timedelta(seconds=rng.randrange(10000)), float(i))
        for i in range(40)
    ]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        rrows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r["event_id"]): (r["event_id_r"], r["ts_r"], r["value_r"])
        for r in asof_join_backward(
            left, right, by=["user_id"], right_value_cols=["event_id", "value"],
            tiebreak_col="event_id",
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE l(event_id BIGINT, user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.execute("CREATE TABLE r(event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE)")
    con.executemany("INSERT INTO r VALUES (?,?,?,?)", rrows)
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute("""
            WITH rd AS (
                SELECT * FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY user_id, ts ORDER BY event_id DESC) rn
                    FROM r
                ) WHERE rn = 1
            )
            SELECT l.event_id, rd.event_id, rd.ts, rd.value
            FROM l ASOF LEFT JOIN rd
            ON l.user_id = rd.user_id AND l.ts >= rd.ts
        """).fetchall()
    }
    assert got == want
