"""Driver-contract replica: entry() smoke + queries() vs oracle_sql() via
DuckDB at sf0.001 (the driver itself runs sf0.01; same code path)."""

import math

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
                    if v == -0.0:
                        v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"src", "dst", "ricci_curvature"} <= set(df.columns)


def test_every_query_runs(spark):
    for name, fn in E.queries().items():
        df = fn(spark, SF)
        assert df.count() >= 0, name


def test_queries_match_oracles(spark, con):
    oracles = E.oracle_sql()
    qs = E.queries()
    assert set(oracles) <= set(qs)
    failures = []
    for name, sql in oracles.items():
        sdf = qs[name](spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        res = con.sql(sql)
        dcols = res.columns
        drows = res.fetchall()
        if sorted(scols) != sorted(dcols):
            failures.append((name, "cols", scols, dcols))
            continue
        a = _normalize(srows, scols)
        b = _normalize(drows, dcols)
        if a != b:
            only_a = [r for r in a if r not in set(b)][:3]
            only_b = [r for r in b if r not in set(a)][:3]
            failures.append((name, f"rows {len(a)} vs {len(b)}", only_a, only_b))
    assert not failures, failures
