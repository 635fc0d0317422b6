#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs `graft.Verify` output (parquet per query + oracle_sql.json) against
DuckDB on the same sf dir and reports per-query match. Use while iterating:

    sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out'
    python3 tools/check_parity.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def load_spark_result(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()

def canon(df):
    import numpy as np
    df = df[sorted(df.columns)].copy()
    # normalize dtypes: timestamps to us; array columns to repr strings
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].apply(lambda v: str(list(v)))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_df = load_spark_result(out_dir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        # dtype check (approximate driver's schema compare)
        mism = [c for c in a.columns if str(a[c].dtype) != str(b[c].dtype)]
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            ok = True
        except AssertionError as e:
            ok = False
            msg = str(e).splitlines()[0]
        if ok and not mism:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
        elif ok and mism:
            print(f"WARN {name}: value match but dtype mismatch on {mism}: "
                  f"{[(str(a[c].dtype), str(b[c].dtype)) for c in mism]}")
            n_fail += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    # queries without oracle
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(p.rstrip("/"))
        if name not in oracle:
            df = load_spark_result(out_dir, name)
            n = len(df) if df is not None else 0
            print(f"ROWS-ONLY {name}: {n} rows {'(EMPTY!)' if n == 0 else ''}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
