#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
same sfDir parquet tables, sorts columns by name and rows by all columns,
and reports row/schema/value match per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].map(lambda v: hasattr(v, "__len__")
                       and not isinstance(v, str)).any():
            df[col] = df[col].map(
                lambda v: tuple(v) if v is not None
                and not isinstance(v, str) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def dtype_kind(series):
    """Coarse dtype class used to mirror the driver's dtype-sensitive hash.

    DuckDB widens integer SUMs to HUGEINT, which pandas materializes as
    float64 or object — the driver's serialize-then-hash compare treats
    that as different from Spark's int64 even when values are equal, so
    the mirror must too.
    """
    k = series.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    if k == "O":
        # object column: classify by the first non-null Python value
        for v in series:
            if v is None:
                continue
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            return "other"
        return "other"
    return "other"


def cells_equal(a, b):
    if a is None and b is None:
        return True
    # Mirror the driver: int-typed vs float-typed cells never hash equal,
    # even when numerically identical (e.g. HUGEINT 42 vs BIGINT 42).
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if (isinstance(a, int) and not isinstance(a, bool)
            and isinstance(b, float)):
        return False
    if (isinstance(b, int) and not isinstance(b, bool)
            and isinstance(a, float)):
        return False
    try:
        import pandas as pd
        if not isinstance(a, (list, tuple)) and not isinstance(b, (list, tuple)):
            if pd.isna(a) and pd.isna(b):  # covers NaN and NaT
                return True
    except (ImportError, ValueError, TypeError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
    try:
        import numpy as np
        if isinstance(a, np.ndarray):
            a = a.tolist()
        if isinstance(b, np.ndarray):
            b = b.tolist()
    except ImportError:
        pass
    return a == b


def main(sf_dir, out_dir, name_filter=None):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import re
    for name, sql in sorted(oracle.items()):
        if name_filter and not re.fullmatch(name_filter, name):
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.execute(sql).df()
            got_c, exp_c = canon(got), canon(exp)
            if list(got_c.columns) != list(exp_c.columns):
                print(f"FAIL {name}: columns {list(got_c.columns)} vs "
                      f"{list(exp_c.columns)}")
                n_fail += 1
                continue
            if len(got_c) != len(exp_c):
                print(f"FAIL {name}: rows {len(got_c)} vs {len(exp_c)}")
                n_fail += 1
                continue
            dtype_bad = None
            for col in got_c.columns:
                gk, ek = dtype_kind(got_c[col]), dtype_kind(exp_c[col])
                if gk != ek and "other" not in (gk, ek):
                    dtype_bad = (col, gk, ek)
                    break
            if dtype_bad:
                col, gk, ek = dtype_bad
                print(f"FAIL {name}: dtype mismatch col={col}: "
                      f"spark={gk} vs oracle={ek} "
                      f"(driver hash-compare is dtype-sensitive)")
                n_fail += 1
                continue
            bad = None
            for col in got_c.columns:
                ga, ea = got_c[col].tolist(), exp_c[col].tolist()
                for i, (x, y) in enumerate(zip(ga, ea)):
                    if not cells_equal(x, y):
                        bad = (col, i, x, y)
                        break
                if bad:
                    break
            if bad:
                col, i, x, y = bad
                print(f"FAIL {name}: value mismatch col={col} row={i}: "
                      f"{x!r} vs {y!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got_c)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracle-checked")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
              sys.argv[3] if len(sys.argv) > 3 else None))
