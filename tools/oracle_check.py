#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each Spark result parquet under <verifyOutDir>/<name>/, runs the
corresponding oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with
views named after the testdata tables, sorts columns by name, and compares
row-by-row (exact for non-floats; floats reported exact + with tolerance).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def compare(name, spark_rows, oracle_rows, cols):
    if len(spark_rows) != len(oracle_rows):
        return f"ROWCOUNT spark={len(spark_rows)} oracle={len(oracle_rows)}"
    worst = 0.0
    for i, (a, b) in enumerate(zip(spark_rows, oracle_rows)):
        for c, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None:
                continue
            if x is None or y is None:
                return f"row {i} col {cols[c]}: {x!r} vs {y!r}"
            if isinstance(x, float) or isinstance(y, float):
                if isinstance(x, float) and isinstance(y, float) and math.isnan(x) and math.isnan(y):
                    continue
                d = abs(float(x) - float(y))
                worst = max(worst, d)
                if d > 1e-9:
                    return f"row {i} col {cols[c]}: {x!r} vs {y!r} (diff {d})"
            elif x != y:
                return f"row {i} col {cols[c]}: {x!r} vs {y!r}"
    return f"OK (max float diff {worst:.2e})"


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_ok = 0
    names = sorted(d.name for d in out.iterdir() if d.is_dir())
    for name in names:
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{out / name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"{name}: SPARK READ FAIL {e}")
            continue
        if name not in oracle:
            print(f"{name}: rows-only ({len(sdf)} rows) — no oracle")
            n_ok += len(sdf) > 0
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL FAIL {e}")
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"{name}: SCHEMA spark={scols} oracle={ocols}")
            continue
        sdf, odf = sdf[scols], odf[scols]
        res = compare(name, sdf.values.tolist(), odf.values.tolist(), scols)
        print(f"{name}: {res}")
        n_ok += res.startswith("OK")
    print(f"== {n_ok}/{len(names)} OK")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
