#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage:
  python3 tools/check.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json, runs each oracle statement in DuckDB
against views over <sf_dir>/*.parquet, loads the Spark parquet result for the
same query name, sorts columns by name and rows by all values, and compares.

Dev-only tool (NOT part of the shipped library): uses the driver-side python
stack (duckdb/pyarrow/pandas) to get feedback before the real gate runs.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    spark_dirs = sorted(
        d.name for d in out_dir.iterdir() if d.is_dir() and not d.name.startswith("_")
    )
    # Work-list = union of oracle keys and Spark output dirs, so a query whose
    # Spark job failed (Verify logs + continues) shows up as FAIL rather than
    # silently vanishing.
    for name in sorted(set(spark_dirs) | set(oracle)):
        if name not in spark_dirs:
            results[name] = "SPARK-OUTPUT-MISSING (job failed in Verify?)"
            continue
        try:
            got = canon(
                con.execute(
                    f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
                ).fetchdf()
            )
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            # Driver records a weaker rows-only check for oracle-less queries.
            results[name] = (
                f"OK(rows-only) rows={len(got)}" if len(got) > 0 else "EMPTY-NO-ORACLE"
            )
            continue
        try:
            want = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"
            continue
        if list(got.columns) != list(want.columns):
            results[name] = f"SCHEMA-MISMATCH got={list(got.columns)} want={list(want.columns)}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWCOUNT-MISMATCH got={len(got)} want={len(want)}"
            continue
        g = got.map(cell)
        w = want.map(cell)
        if g.equals(w):
            results[name] = f"OK rows={len(got)}"
        else:
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            detail = []
            for i in idx:
                detail.append(f"row{i}: got={got.loc[i].to_dict()} want={want.loc[i].to_dict()}")
            results[name] = "VALUE-MISMATCH " + " | ".join(detail)

    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith('OK') else 'FAIL':4} {k}: {results[k]}")
    print(f"\n{n_ok}/{len(results)} passed")
    # Nonzero when anything failed OR when there was nothing to compare —
    # an empty output dir must not look like a green gate.
    sys.exit(0 if (results and n_ok == len(results)) else 1)


if __name__ == "__main__":
    main()
