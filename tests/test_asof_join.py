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


def test_range_join_matches_duckdb_inequality(spark):
    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    pts = [
        (i, rng.randrange(4), base + dt.timedelta(seconds=rng.randrange(20000)))
        for i in range(80)
    ]
    ivs = []
    for i in range(25):
        s = rng.randrange(18000)
        ivs.append(
            (200 + i, rng.randrange(4),
             base + dt.timedelta(seconds=s),
             base + dt.timedelta(seconds=s + rng.randrange(1, 5000)))
        )
    from graphriccicurvature_spark.operators.temporal import range_join_points

    points = spark.createDataFrame(pts, "event_id long, user_id long, ts timestamp")
    intervals = spark.createDataFrame(
        ivs, "iv_id long, user_id long, start timestamp, end timestamp"
    )
    got = {
        (r["event_id"], r["iv_id"])
        for r in range_join_points(
            points, intervals, by=["user_id"], bucket_seconds=600
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE p(event_id BIGINT, user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO p VALUES (?,?,?)", pts)
    con.execute(
        "CREATE TABLE iv(iv_id BIGINT, user_id BIGINT, start TIMESTAMP, \"end\" TIMESTAMP)"
    )
    con.executemany("INSERT INTO iv VALUES (?,?,?,?)", ivs)
    want = set(
        con.execute(
            'SELECT p.event_id, iv.iv_id FROM p JOIN iv ON p.user_id = iv.user_id '
            'AND p.ts >= iv.start AND p.ts < iv."end"'
        ).fetchall()
    )
    assert got == want
    assert got  # non-degenerate fixture


def test_range_join_plan_has_no_nested_loop(spark):
    import datetime as dtm

    from graphriccicurvature_spark.operators.temporal import range_join_points

    points = spark.createDataFrame(
        [(0, 0, dtm.datetime(2024, 1, 1))], "event_id long, user_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(1, 0, dtm.datetime(2024, 1, 1), dtm.datetime(2024, 1, 2))],
        "iv_id long, user_id long, start timestamp, end timestamp",
    )
    p = (
        range_join_points(points, intervals, by=["user_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p, p
