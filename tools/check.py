#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output against
DuckDB oracles and compare (schema + values, columns sorted by name).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, os, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for compare
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.floor("us")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                                hasattr(v, "__len__") and not isinstance(v, str) else v)
    try:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        df = df.iloc[df.astype(str).apply(tuple, axis=1).argsort()].reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name, sql in sorted(oracles.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            results[name] = "MISSING_RESULT"; continue
        try:
            got = pq.read_table(res_dir).to_pandas()
        except Exception as e:
            results[name] = f"READ_FAIL {e}"; continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_FAIL {e}"; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA cols {list(g.columns)} vs {list(w.columns)}"; continue
        if len(g) != len(w):
            results[name] = f"ROWS {len(g)} vs {len(w)}"; continue
        bad = None
        for c in g.columns:
            a, b = g[c], w[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                aa = pd.to_numeric(a, errors="coerce")
                bb = pd.to_numeric(b, errors="coerce")
                # NULL == NULL; a one-sided NULL is a mismatch (the old
                # fillna(0) both failed both-NaN rows — 0 <= NaN*tol is
                # False — and silently passed one-sided-NaN rows)
                both_nan = aa.isna() & bb.isna()
                close = (aa - bb).abs() <= 1e-9 * (1 + bb.abs())
                if not (close | both_nan).fillna(False).all():
                    bad = c; break
            else:
                if not (a.astype(str) == b.astype(str)).all():
                    bad = c; break
        if bad:
            i = (g[bad].astype(str) != w[bad].astype(str)).idxmax()
            results[name] = f"VALUE col={bad} row={i} got={g[bad][i]} want={w[bad][i]}"
        else:
            results[name] = "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, r in sorted(results.items()):
        print(("PASS " if r == "OK" else "FAIL ") + name + ("" if r == "OK" else f"  [{r}]"))
    print(f"\n{n_ok}/{len(results)} OK")
    # also report queries with no oracle
    have = set(oracles)
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(os.path.join(out_dir, d)) and d not in have:
            print(f"NOORACLE {d}")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
