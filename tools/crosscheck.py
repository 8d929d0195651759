#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same
parquet tables and compare (schema-insensitive to column order: columns
sorted by name; rows sorted by all columns).

Usage: python3 tools/crosscheck.py [sfDir] [outDir]
Dev tool only — the shipped Scala library does not depend on this.
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def values_equal(a, b):
    import datetime
    if a is b: return True
    if pd.isna(a) and pd.isna(b): return True
    if pd.isna(a) or pd.isna(b): return False
    # parquet DATE -> datetime.date via pandas, DuckDB DATE -> midnight
    # Timestamp via .df(); both engines hold logical DATE — normalize.
    if isinstance(a, datetime.date) or isinstance(b, datetime.date):
        try: return pd.Timestamp(a) == pd.Timestamp(b)
        except (TypeError, ValueError): return False
    if isinstance(a, float) or isinstance(b, float):
        try: return (a == b) or math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
        except (TypeError, ValueError): return False
    return a == b

def compare(name, mine: pd.DataFrame, oracle: pd.DataFrame):
    mine, oracle = canon(mine), canon(oracle)
    if list(mine.columns) != list(oracle.columns):
        return f"SCHEMA cols mine={list(mine.columns)} oracle={list(oracle.columns)}"
    # The driver hashes RENDERED values, so an int column on one side and
    # a float on the other (e.g. DuckDB HUGEINT from SUM(BIGINT) -> pandas
    # float64) hash-mismatches even when values compare equal ("0" vs
    # "0.0"). Mirror that strictness: numeric KIND must agree per column.
    def kind(s: pd.Series) -> str:
        if pd.api.types.is_integer_dtype(s): return "int"
        if pd.api.types.is_float_dtype(s): return "float"
        if s.dtype == object:
            # DuckDB surfaces DECIMAL as object(decimal.Decimal); the
            # driver renders those differently from a float64 ("0.00"
            # vs "0.0"), so an object-numeric column is its own kind.
            import decimal
            for v in s:
                if v is None or (isinstance(v, float) and math.isnan(v)): continue
                if isinstance(v, decimal.Decimal): return "objnum"
                if isinstance(v, (int, float)): return "objnum"
                return "other"
        return "other"
    for c in mine.columns:
        km, ko = kind(mine[c]), kind(oracle[c])
        numeric = {"int", "float", "objnum"}
        if km in numeric and ko in numeric and km != ko:
            return (f"DTYPE col={c}: mine={mine[c].dtype}({km}) oracle="
                    f"{oracle[c].dtype}({ko})"
                    " (cast the oracle aggregate to BIGINT/DOUBLE explicitly)")
    if len(mine) != len(oracle):
        return f"ROWS mine={len(mine)} oracle={len(oracle)}"
    for c in mine.columns:
        mv, ov = mine[c].tolist(), oracle[c].tolist()
        for i, (x, y) in enumerate(zip(mv, ov)):
            if not values_equal(x, y):
                return f"VALUE col={c} row={i}: mine={x!r} oracle={y!r}"
    return None

def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_sql = json.load(open(f"{OUT}/oracle_sql.json"))
    # Queries that threw in THIS Verify run: must FAIL even when a
    # stale output dir from a previous run into the same outDir exists.
    try:
        failures = json.load(open(f"{OUT}/_failures.json"))
    except FileNotFoundError:
        failures = {}
    # Drive the loop from the union of registered oracles and produced
    # output dirs — a registered query whose Verify run threw (so wrote
    # no directory) must surface as FAIL, not silently vanish.
    out_dirs = {n for n in os.listdir(OUT) if os.path.isdir(os.path.join(OUT, n))}
    n_pass = n_fail = 0
    for name in sorted(set(oracle_sql) | out_dirs):
        d = os.path.join(OUT, name)
        if name in failures:
            print(f"FAIL {name}: Verify error: {failures[name]}")
            n_fail += 1
            continue
        if not os.path.isdir(d):
            print(f"FAIL {name}: query produced no output (Verify error?)")
            n_fail += 1
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
        mine = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle_sql:
            print(f"rows-only {name}: {len(mine)} rows")
            continue
        try:
            oracle = con.sql(oracle_sql[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        err = compare(name, mine, oracle)
        if err:
            print(f"FAIL {name}: {err}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
