#!/usr/bin/env python3
"""Local rehearsal of the driver's t2 correctness gate.

Usage: check_parity.py <verify_out_dir> <sf_dir>

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the same fixture tables,
and compares values with columns sorted by name (the driver's semantics).
Exit 0 iff every query matches.
"""
import sys, os, json, glob
import datetime as dt
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Normalize a value for cross-engine compare."""
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):  # pyarrow may give struct as dict
        return tuple((k, norm(v[k])) for k in sorted(v))
    return v


def spark_rows(path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None, None
    tbl = pq.read_table(files[0])
    names = sorted(tbl.column_names)
    cols = [tbl.column(n).to_pylist() for n in names]
    return names, [tuple(norm(c[i]) for c in cols) for i in range(tbl.num_rows)]


def duck_rows(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = cur.fetchall()
    return [names[i] for i in order], [tuple(norm(r[i]) for i in order) for r in rows]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_ok = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        s_names, s_rows = spark_rows(os.path.join(out_dir, name))
        if s_rows is None:
            print(f"FAIL {name}: missing spark output")
            n_fail += 1
            continue
        try:
            d_names, d_rows = duck_rows(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if s_names != d_names:
            print(f"FAIL {name}: column names {s_names} != {d_names}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: row count {len(s_rows)} != {len(d_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first @{i}:")
            print(f"  cols : {s_names}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(s_rows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
