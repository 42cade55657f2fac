#!/usr/bin/env python3
"""DuckDB-native large-SF oracle check — same verdict semantics as
check_oracle.py, engineered for multi-GB results.

Usage: python3 tools/check_oracle_fast.py <sfDir> <verifyOutDir> [only,...]

The reference checker (check_oracle.py — the driver-parity gate) pulls
both sides into pandas and sort-compares; at sf10 a single merge query
returns 20M+ rows and the python sort dominates hours. Here the compare
stays INSIDE DuckDB: columns aligned by sorted name, the Spark parquet
side cast to the oracle side's types, then an `EXCEPT ALL` multiset
diff in both directions — vectorized, parallel, order-insensitive,
duplicate-exact. Exact compare can false-FAIL on float ULP differences
(legitimate: sum order differs between engines), so any mismatch falls
back to the reference checker's tolerant pandas path for that query
before reporting.
"""
import json
import os
import sys
import warnings

import duckdb

warnings.filterwarnings("ignore", category=DeprecationWarning)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def pandas_fallback(con, sql, got_glob):
    """check_oracle.py's tolerant compare, for ULP-level float diffs."""
    import pandas as pd

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if pd.api.types.is_datetime64tz_dtype(df[c]):
                df[c] = df[c].dt.tz_localize(None)
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = df[c].astype("datetime64[us]")
        return df.sort_values(by=list(df.columns), ignore_index=True,
                              key=lambda s: s.astype(str))

    want = canon(con.execute(sql).df())
    got = canon(con.execute(
        f"SELECT * FROM read_parquet('{got_glob}')").df())
    if list(want.columns) != list(got.columns) or len(want) != len(got):
        return False, "columns/rows differ in fallback"
    import numpy as np
    for c in want.columns:
        w, g = want[c], got[c]
        if np.issubdtype(w.dtype, np.floating) or \
                np.issubdtype(g.dtype, np.floating):
            wf = w.astype(float).to_numpy()
            gf = g.astype(float).to_numpy()
            ok = np.allclose(wf, gf, rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = (w.astype(str).to_numpy() == g.astype(str).to_numpy()).all()
        if not ok:
            return False, f"column {c} differs beyond tolerance"
    return True, ""


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        pattern = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        got_glob = f"{out_dir}/{name}/*.parquet"
        try:
            con.execute(f"CREATE OR REPLACE VIEW __want AS ({sql})")
            cols = [r[0] for r in con.execute("DESCRIBE __want").fetchall()]
            types = {r[0]: r[1] for r in con.execute(
                "DESCRIBE __want").fetchall()}
            ordered = sorted(cols)
            wsel = ", ".join(f'"{c}"' for c in ordered)
            # cast the Spark side to the oracle's types (a BIGINT sum vs
            # HUGEINT etc. must not fail the compare on type identity);
            # tz-aware spark timestamps collapse to naive like canon()
            gsel = ", ".join(
                f'CAST("{c}" AS {types[c]}) AS "{c}"' for c in ordered)
            con.execute(f"""CREATE OR REPLACE VIEW __got AS
                SELECT {gsel} FROM read_parquet('{got_glob}')""")
            gcols = sorted(r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{got_glob}')"
            ).fetchall())
            if gcols != ordered:
                print(f"FAIL {name}: columns differ: oracle={ordered} "
                      f"spark={gcols}", flush=True)
                n_fail += 1
                continue
            nw = con.execute("SELECT count(*) FROM __want").fetchone()[0]
            ng = con.execute("SELECT count(*) FROM __got").fetchone()[0]
            if nw != ng:
                print(f"FAIL {name}: rows differ: oracle={nw} spark={ng}",
                      flush=True)
                n_fail += 1
                continue
            diff = con.execute(f"""SELECT
                (SELECT count(*) FROM
                  (SELECT {wsel} FROM __want EXCEPT ALL
                   SELECT {wsel} FROM __got)) +
                (SELECT count(*) FROM
                  (SELECT {wsel} FROM __got EXCEPT ALL
                   SELECT {wsel} FROM __want))""").fetchone()[0]
            if diff == 0:
                print(f"OK   {name} ({nw} rows)", flush=True)
                continue
            ok, why = pandas_fallback(con, f"SELECT {wsel} FROM __want",
                                      got_glob)
            if ok:
                print(f"OK   {name} ({nw} rows, float-tolerance path)",
                      flush=True)
            else:
                print(f"FAIL {name}: {diff} multiset-different rows; "
                      f"fallback: {why}", flush=True)
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
            n_fail += 1
    total = len(only) if only else len(oracle)
    print(f"\n{total - n_fail}/{total} OK", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
