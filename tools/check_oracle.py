#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare — DRIVER-STRICT.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables, and
compares the way the driver does:

- columns sorted by name, rows sorted by all columns (pandas sort_values);
- dtype-SENSITIVE: int64 vs HUGEINT(object) is a failure, exactly as the
  driver's hash sees it (round 2 shipped a red row because the old replica
  tolerated this);
- floats compare EXACTLY (the engine contract round()s every float on both
  sides, so any bit difference is a real contract violation);
- array/binary cells (ndarray / bytes / bytearray / list) are flagged as
  DRIVER-UNHASHABLE before the sort — the driver's pandas compare crashes
  on them, so a query emitting them is red no matter how correct it is.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]


def unhashable_cols(df: pd.DataFrame):
    """Columns whose cells would crash the driver's sort_values/hash.

    Scans EVERY cell of each object column: a mixed column whose first
    non-null value is a scalar can still hold ndarray/bytes later, and
    the driver would crash on those rows just the same.
    """
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            if any(isinstance(v, (np.ndarray, list, bytes, bytearray, dict))
                   for v in df[c]):
                bad.append(c)
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: sort columns by name, rows by all
    columns. Timestamps normalized to int64 micros on both sides (the one
    place the driver's pyarrow/duckdb paths agree to differ in repr only).
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
    if len(df) and len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def col_equal(a: pd.Series, b: pd.Series):
    """Exact, dtype-sensitive equality. Returns (ok, reason)."""
    if str(a.dtype) != str(b.dtype):
        return False, f"DTYPE spark={a.dtype} duck={b.dtype}"
    av, bv = a.to_numpy(), b.to_numpy()
    if pd.api.types.is_float_dtype(a):
        same = np.array_equal(av, bv, equal_nan=True)
    else:
        same = (pd.Series(av).fillna("\0NULL") ==
                pd.Series(bv).fillna("\0NULL")).all()
    if not same:
        diff = [(i, av[i], bv[i]) for i in range(len(av))
                if not _eq(av[i], bv[i])][:3]
        return False, f"VALUES first={diff}"
    return True, None


def _eq(x, y):
    if pd.isna(x) and pd.isna(y):
        return True
    try:
        return x == y
    except Exception:
        return False


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
        bad_cols = unhashable_cols(spark_df)
        if bad_cols:
            results[name] = f"DRIVER-UNHASHABLE cols={bad_cols}"
            continue
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
            fails = []
            for c in a.columns:
                same, why = col_equal(a[c], b[c])
                if not same:
                    fails.append(f"col={c} {why}")
            results[name] = f"OK rows={len(a)}" if not fails \
                else "MISMATCH " + "; ".join(fails)
    bad = 0
    for k in sorted(results):
        flag = "  " if results[k].startswith(("OK", "NO-ORACLE")) else "!!"
        if flag == "!!":
            bad += 1
        print(f"{flag} {k}: {results[k]}")
    print(f"\n{len(results)} queries, {bad} mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
