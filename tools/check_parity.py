#!/usr/bin/env python3
"""Local rehearsal of the driver's t2 correctness gate — driver-faithful.

Usage: check_parity.py <verify_out_dir> <sf_dir> [only_query1,only_query2]

Replicates the driver's comparison semantics exactly (no value
normalization — round 1 proved a normalizing rehearsal masks reds):

  * Spark side: pandas.read_parquet over the Verify output dir.
  * Oracle side: DuckDB .df() of the oracle SQL over the same fixtures.
  * Columns sorted by name, rows sorted with DataFrame.sort_values over
    ALL columns (this is what dies on array columns: "unhashable type:
    'numpy.ndarray'"), then hashed with pd.util.hash_pandas_object.
  * rows_match = row counts, schema_match = sorted column names,
    hash_match = per-row hashes all equal.

Validated against round 1: this script reproduces CORRECTNESS_r01.json
red/green row-for-row (5 hash-fails from DECIMAL-object-vs-float64, 3
errs from array columns) on the archived /tmp/final_0.01 output.

Exit 0 iff every query is fully green.
"""
import sys, os, json, traceback

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Driver canonicalization: columns by name, rows by all columns."""
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(s, o):
    res = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        res["spark_rows"], res["oracle_rows"] = len(s), len(o)
        res["rows_match"] = len(s) == len(o)
        res["schema_match"] = sorted(s.columns) == sorted(o.columns)
        sc, oc = canon(s), canon(o)
        if res["rows_match"] and res["schema_match"]:
            hs = pd.util.hash_pandas_object(sc, index=False)
            ho = pd.util.hash_pandas_object(oc, index=False)
            res["hash_match"] = bool((hs.values == ho.values).all())
        else:
            res["hash_match"] = False
    except Exception:
        res = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None,
               "err": traceback.format_exc()[-1500:]}
    return res


def first_diff(s, o):
    """Best-effort diagnostic: first differing row after canon (may throw)."""
    try:
        sc, oc = canon(s), canon(o)
        hs = pd.util.hash_pandas_object(sc, index=False).values
        ho = pd.util.hash_pandas_object(oc, index=False).values
        bad = (hs != ho).nonzero()[0]
        if len(bad):
            i = int(bad[0])
            return (f"  {len(bad)}/{len(sc)} rows differ; first @{i}:\n"
                    f"  cols : {list(sc.columns)}\n"
                    f"  spark: {[repr(v) for v in sc.iloc[i].tolist()]}\n"
                    f"  duck : {[repr(v) for v in oc.iloc[i].tolist()]}\n"
                    f"  dtypes spark={list(map(str, sc.dtypes))} duck={list(map(str, oc.dtypes))}")
    except Exception as e:
        return f"  (diff diagnostics failed: {e})"
    return ""


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
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: missing spark output")
            n_fail += 1
            continue
        try:
            s = pd.read_parquet(spark_path)
        except Exception:
            results[name] = {"err": traceback.format_exc()[-1500:]}
            print(f"ERR  {name}: spark parquet load failed")
            n_fail += 1
            continue
        try:
            o = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        res = compare(s, o)
        results[name] = res
        if res["err"]:
            print(f"ERR  {name}: comparator exception "
                  f"(driver would record err):\n{res['err'].splitlines()[-1]}")
            n_fail += 1
        elif res["rows_match"] and res["schema_match"] and res["hash_match"]:
            print(f"OK   {name} ({res['spark_rows']} rows)")
            n_ok += 1
        else:
            why = ("rows" if not res["rows_match"] else
                   "schema" if not res["schema_match"] else "hash")
            print(f"FAIL {name}: {why} mismatch "
                  f"(spark={res['spark_rows']} oracle={res['oracle_rows']})")
            if why == "hash":
                print(first_diff(s, o))
            elif why == "schema":
                print(f"  spark cols: {sorted(s.columns)}")
                print(f"  duck  cols: {sorted(o.columns)}")
            n_fail += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
