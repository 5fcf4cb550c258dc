#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with every testdata table
registered as a view, and compares: schema (column names, sorted), row count,
and cell values on rows sorted by all columns. Exit 1 on any mismatch.
"""
import json, math, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    try:  # decimal.Decimal → float when small enough to be exact-ish
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return str(v)


def rows_of(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    data = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    rows = sorted([tuple(norm(r[i]) for i in order) for r in data],
                  key=lambda t: tuple(str(x) for x in t))
    return cols_sorted, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{res_dir}/*.parquet"):
            print(f"FAIL {name}: no spark result at {res_dir}")
            failures += 1
            continue
        try:
            got_cols, got = rows_of(
                con, f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            want_cols, want = rows_of(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            failures += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: {len(got)} rows != {len(want)}")
            failures += 1
        elif got != want:
            bad = next(i for i in range(len(got)) if got[i] != want[i])
            print(f"FAIL {name}: first diff row {bad}:\n  spark:  {got[bad]}\n  duckdb: {want[bad]}")
            failures += 1
        else:
            print(f"ok   {name}: {len(got)} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
