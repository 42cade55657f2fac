#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every query in
<verifyOutDir>/oracle_sql.json, and compares against the Spark result
parquet at <verifyOutDir>/<name>/ — columns sorted by name, rows sorted,
values compared with a small float tolerance check as a diagnostic
(exact hash equality is what the real driver checks).
"""
import json
import sys
import warnings

import duckdb
import pandas as pd

warnings.filterwarnings("ignore", category=DeprecationWarning)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware → naive for comparison parity
    for c in df.columns:
        if pd.api.types.is_datetime64tz_dtype(df[c]):
            df[c] = df[c].dt.tz_localize(None)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata is a single file; Spark-written (e.g. MakeScale
        # sf1) tables are part-file directories — register either shape
        p = f"{sf_dir}/{t}.parquet"
        pattern = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        w, g = canon(want), canon(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns differ: oracle={list(w.columns)} spark={list(g.columns)}")
            n_fail += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rowcount differ: oracle={len(w)} spark={len(g)}")
            n_fail += 1
            continue
        mismatch = []
        for c in w.columns:
            a, b = w[c], g[c]
            if a.dtype != b.dtype:
                try:
                    b = b.astype(a.dtype)
                except Exception:
                    mismatch.append(f"{c}: dtype {a.dtype} vs {g[c].dtype}")
                    continue
            eq = (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                bad = (~eq).sum()
                i = (~eq).idxmax()
                mismatch.append(f"{c}: {bad} diffs, e.g. [{i}] {a[i]!r} vs {b[i]!r}")
        if mismatch:
            print(f"FAIL {name}: " + "; ".join(mismatch))
            n_fail += 1
        else:
            # dtype parity matters for the driver's hash — warn if differs
            dt = [f"{c}:{w[c].dtype}/{pd.read_parquet(f'{out_dir}/{name}')[c].dtype}"
                  for c in w.columns
                  if str(w[c].dtype) != str(pd.read_parquet(f'{out_dir}/{name}')[c].dtype)]
            extra = f"  [dtype-diff: {dt}]" if dt else ""
            print(f"OK   {name} ({len(w)} rows){extra}")
    print(f"\n{len(oracle) - n_fail}/{len(oracle)} OK")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
