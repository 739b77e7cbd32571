#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Mirrors the driver's asymmetric read paths so the comparison catches the
same failures the driver reports (ADVICE r1: a pandas fetchdf() on BOTH
sides collapses DECIMAL to float64 and is blind to decimal-vs-float
representation mismatches):

  - Spark side: read result parquet with *pyarrow* and take Python values
    (``to_pylist``) — parquet DECIMAL comes back as ``decimal.Decimal``,
    timestamps as ``datetime``, exactly what the driver hashes.
  - Oracle side: run the SQL in DuckDB and take ``fetchall`` Python values —
    DECIMAL stays ``decimal.Decimal``, doubles stay ``float``.

Columns are sorted by name (driver behavior), then values are compared with
a canonicalization that treats a type-class difference (Decimal vs float,
int vs float) as FAIL even when numerically equal, and requires exact
(bit-level for floats) equality — any diff here is a driver hash mismatch.
"""
import json
import math
import sys
from datetime import date, datetime, timezone
from decimal import Decimal
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    """Canonical (type-class, value) pair — what a value hash would see."""
    if v is None:
        return ("null", None)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        return ("float", v.hex() if not math.isnan(v) else "nan")
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, datetime):
        ts = v if v.tzinfo else v.replace(tzinfo=timezone.utc)
        return ("ts", ts.astimezone(timezone.utc).isoformat())
    if isinstance(v, date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(canon(x) for x in v))
    return (type(v).__name__, v)


def compare(spark_rows, oracle_rows, cols):
    if len(spark_rows) != len(oracle_rows):
        return f"ROWCOUNT spark={len(spark_rows)} oracle={len(oracle_rows)}"
    for i, (a, b) in enumerate(zip(spark_rows, oracle_rows)):
        for c, (x, y) in enumerate(zip(a, b)):
            cx, cy = canon(x), canon(y)
            if cx != cy:
                return (f"row {i} col {cols[c]}: spark {x!r} ({cx[0]}) "
                        f"vs oracle {y!r} ({cy[0]})")
    return "OK"


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    # The driver runs a NEWER DuckDB than this container (r8: the driver's
    # >=1.1 binder rejected lambda SQL that 1.0.0 accepts, and this gate was
    # blind to it). Static lint for the known version-fragile constructs
    # runs first and fails the gate loudly — see tools/oracle_lint.py.
    import subprocess
    lint = subprocess.run(
        [sys.executable, str(Path(__file__).parent / "oracle_lint.py"),
         str(out / "oracle_sql.json")], capture_output=True, text=True)
    sys.stdout.write(lint.stdout)
    if lint.returncode != 0:
        print(f"== ORACLE LINT FAILED (local duckdb {duckdb.__version__} "
              f"may accept SQL the driver's newer DuckDB rejects)")
        return 1
    print(f"(local duckdb {duckdb.__version__}; driver may run newer — "
          f"lint green)")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_ok, n_fail = 0, 0
    names = sorted(d.name for d in out.iterdir() if d.is_dir())
    for name in names:
        try:
            tbl = pq.read_table(str(out / name))
        except Exception as e:
            print(f"{name}: SPARK READ FAIL {e}")
            n_fail += 1
            continue
        scols = sorted(tbl.column_names)
        sdf = tbl.select(scols)
        # The driver sorts result rows via pandas sort_values, which raises
        # "unhashable type: numpy.ndarray" on LIST columns (seen: q50 r5).
        # Flag them here so the failure is caught before the driver runs.
        import pyarrow as pa
        listy = [c for c in scols
                 if pa.types.is_list(tbl.schema.field(c).type)
                 or pa.types.is_large_list(tbl.schema.field(c).type)]
        if listy:
            print(f"{name}: LIST COLUMNS {listy} — driver pandas sort will fail")
            n_fail += 1
            continue
        spark_rows = [tuple(r[c] for c in scols) for r in sdf.to_pylist()]
        if name not in oracle:
            status = "nonempty" if spark_rows else "EMPTY (driver may flag)"
            print(f"{name}: rows-only ({len(spark_rows)} rows, {status})")
            n_ok += bool(spark_rows)
            n_fail += not spark_rows
            continue
        try:
            cur = con.execute(oracle[name])
            ocols_raw = [d[0] for d in cur.description]
            orows_raw = cur.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE SQL FAIL {e}")
            n_fail += 1
            continue
        ocols = sorted(ocols_raw)
        if scols != ocols:
            print(f"{name}: SCHEMA spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        perm = [ocols_raw.index(c) for c in ocols]
        # The driver's oracle path goes through pandas (fetchdf), which
        # collapses DuckDB DECIMAL to float64 — mirror that collapse here
        # (spark-side values stay as pyarrow gives them, Decimal included),
        # so a decimal-typed Spark output column fails exactly as it would
        # under the driver.
        def pandasify(v):
            return float(v) if isinstance(v, Decimal) else v
        oracle_rows = [tuple(pandasify(r[j]) for j in perm) for r in orows_raw]
        res = compare(spark_rows, oracle_rows, scols)
        print(f"{name}: {res}")
        n_ok += res == "OK"
        n_fail += res != "OK"
    print(f"== {n_ok}/{len(names)} OK, {n_fail} FAIL")
    return n_fail


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
