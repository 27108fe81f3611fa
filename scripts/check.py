#!/usr/bin/env python3
"""Local oracle checker — dev tooling only (mimics the driver's t2 gate).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads each Spark result parquet under <verifyOutDir>/<name>/, runs the
matching DuckDB SQL from oracle_sql.json against views over <sfDir>'s
parquet tables, sorts columns by name, sorts rows, and compares values
cell-exactly (reporting float max-abs-diff on mismatch).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            dt = df[c]
            if getattr(dt.dtype, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[us]")
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def cmp_cell(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    try:
        return bool(a == b)
    except Exception:
        return str(a) == str(b)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # pin the session zone: TIMESTAMPTZ->TIMESTAMP casts (to_timestamp in
    # window oracles) render in session TZ; Spark is pinned UTC, so a
    # non-UTC host would shift every window bound without this
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = canon(pd.read_parquet(f"{outdir}/{name}"))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} "
                  f"duck={list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            mism = [i for i in range(len(gv)) if not cmp_cell(gv[i], wv[i])]
            if mism:
                i = mism[0]
                detail = f"row{i} spark={gv[i]!r} duck={wv[i]!r}"
                if isinstance(gv[i], float) and isinstance(wv[i], float):
                    diffs = [abs(gv[j] - wv[j]) for j in mism
                             if not (pd.isna(gv[j]) or pd.isna(wv[j]))]
                    if diffs:
                        detail += f" maxdiff={max(diffs):.3g}"
                bad.append(f"{c}({len(mism)} cells: {detail})")
        # dtype drift report (non-fatal hint)
        dt = [f"{c}:{got[c].dtype}!={want[c].dtype}" for c in got.columns
              if str(got[c].dtype) != str(want[c].dtype)]
        if bad:
            print(f"FAIL {name}: {'; '.join(bad[:4])}"
                  + (f" [dtypes: {','.join(dt)}]" if dt else ""))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"
                  + (f" [dtype drift: {','.join(dt)}]" if dt else ""))
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
