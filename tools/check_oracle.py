#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables, and
compares: schema (column names sorted), row count, and a value hash with
columns sorted by name. Mirrors the driver contract so oracle mismatches are
caught before a round ends.

Tolerance note: floats compare with atol=1e-9 here, while the driver's check
is a strict hash of the (already-rounded) values. The engine-side contract
closes that gap: every float column in an oracle-paired query is round()ed
in BOTH the Spark query and its SQL, far coarser than 1e-9, so any pair that
passes here with a sub-1e-9 difference produces identical rounded values for
the driver's hash. A true mismatch (>= one rounding unit) fails both.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                          else (tuple(v) if isinstance(v, list) else v))
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = sorted(glob.glob(f"{d}/*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {e}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}"
        else:
            ok = True
            for c in a.columns:
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                try:
                    if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
                        same = np.allclose(av.astype(float), bv.astype(float),
                                           rtol=0, atol=1e-9, equal_nan=True)
                    else:
                        same = (pd.Series(av).fillna("\0NULL") ==
                                pd.Series(bv).fillna("\0NULL")).all()
                except Exception:
                    same = list(av) == list(bv)
                if not same:
                    diff = [(i, av[i], bv[i]) for i in range(len(av))
                            if not _eq(av[i], bv[i])][:3]
                    results[name] = f"VALUE-MISMATCH col={c} first={diff}"
                    ok = False
                    break
            if ok:
                results[name] = f"OK rows={len(a)}"
    bad = 0
    for k in sorted(results):
        flag = "  " if results[k].startswith(("OK", "NO-ORACLE")) else "!!"
        if flag == "!!":
            bad += 1
        print(f"{flag} {k}: {results[k]}")
    print(f"\n{len(results)} queries, {bad} mismatches")
    sys.exit(1 if bad else 0)

def _eq(x, y):
    try:
        if isinstance(x, float) or isinstance(y, float):
            if pd.isna(x) and pd.isna(y):
                return True
            return abs(float(x) - float(y)) <= 1e-9
    except Exception:
        pass
    if pd.isna(x) and pd.isna(y):
        return True
    return x == y

if __name__ == "__main__":
    main()
