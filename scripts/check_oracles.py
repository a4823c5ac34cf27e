"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at a given sf dir, compare row count,
column names, and order-insensitive values (rounded floats).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from graphriccicurvature_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="check_oracles")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            fails.append(name)
            continue
        took = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows={len(rows)} ({took:.1f}s) [no_oracle]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            fails.append(name)
            continue
        ok_cols = sorted(cols) == sorted(ocols)
        a, b = canon(rows, cols), canon(orows, ocols)
        ok_vals = a == b
        status = "OK" if (ok_cols and ok_vals) else "MISMATCH"
        print(
            f"{name}: rows={len(rows)}/{len(orows)} cols={'ok' if ok_cols else (cols, ocols)} "
            f"vals={'ok' if ok_vals else 'DIFF'} ({took:.1f}s) {status}"
        )
        if not (ok_cols and ok_vals):
            fails.append(name)
            if a and b:
                sa, sb = set(a), set(b)
                print("  only_spark:", list(sa - sb)[:3])
                print("  only_oracle:", list(sb - sa)[:3])
    print("FAILURES:", fails if fails else "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
