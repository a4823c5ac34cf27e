"""Audit oracle-vs-Spark column TYPES, not just values.

The driver hashes values after pulling both sides into a columnar frame;
DuckDB HUGEINT (the default integer-sum type) becomes float64/object there
while Spark's bigint stays int64 — identical values, different hash. This
script runs every (queries(), oracle_sql()) pair at a small sf and flags any
column whose Arrow type class differs between the two sides.

Usage: python scripts/audit_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def type_class(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    from graphriccicurvature_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="audit_types")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf)
            s_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
            o_schema = con.execute(oracles[name]).arrow().schema
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            bad.append(name)
            continue
        o_types = {f.name: type_class(f.type) for f in o_schema}
        spark_class = {
            "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
            "double": "float", "float": "float",
            "string": "str", "boolean": "bool", "binary": "binary",
            "timestamp": "timestamp", "date": "timestamp",
            # tz-naive Spark timestamps map to the same Arrow
            # timestamp('us') (no tz field) as DuckDB TIMESTAMP — the
            # driver's value-hash sees identical columns (events_window
            # hash-passed with this shape), so it is the same class
            "timestamp_ntz": "timestamp",
        }
        msgs = []
        for c, st in s_types.items():
            sc = spark_class.get(st, st.split("<")[0])
            oc = o_types.get(c)
            if oc is None:
                msgs.append(f"{c}: missing in oracle (oracle cols {sorted(o_types)})")
            elif oc != sc:
                msgs.append(f"{c}: spark={st}({sc}) oracle={oc}")
        for c in o_types:
            if c not in s_types:
                msgs.append(f"{c}: missing in spark")
        if msgs:
            bad.append(name)
            print(f"{name}: MISMATCH  " + "; ".join(msgs))
        else:
            print(f"{name}: ok")
    print("TYPE-MISMATCHES:", ", ".join(bad) if bad else "none")
    spark.stop()


if __name__ == "__main__":
    main()
