#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: selfcheck.py <sfDir> <verifyOutDir> [only...]

Reads each SparkEntry query result (parquet written by graft.Verify),
runs the corresponding oracle SQL in DuckDB against the same tables,
sorts columns by name and rows by value, and compares.

Extra positional args restrict the run to those query names (prefix
`-` to EXCLUDE instead, e.g. `- q_substring_dup`); output is
line-flushed with per-query wall time so long scale runs (sf1 DuckDB
can take minutes per heavy oracle) are observable mid-flight.
"""
import duckdb
import json
import math
import sys
import time

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    import numpy as np
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, (float, np.floating)):
                # exact: all oracles are engineered to be bit-identical
                # (decimal-routed sums, identical fold orders)
                v = float(v)
                cells.append("NaN" if math.isnan(v) else repr(v))
            elif isinstance(v, (bool, np.bool_)):
                cells.append(repr(bool(v)))
            elif isinstance(v, (int, np.integer)):
                cells.append(repr(int(v)))
            elif hasattr(v, "tolist"):  # numpy arrays / lists
                cells.append(repr(v.tolist()))
            else:
                cells.append(repr(v))
        rows.append("|".join(cells))
    return sorted(rows), list(df.columns)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    exclude = names and names[0] == "-"
    if exclude:
        names = names[1:]
    con = duckdb.connect()
    import os
    for t in TABLES:
        # Driver testdata is a single file per table; ScaleUp output
        # (e.g. /tmp/sf1) is a Spark directory of part files.
        p = f"{sfdir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if names and (name in names) == exclude:
            continue
        t0 = time.monotonic()
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            duck_df = con.sql(sql).df()
            srows, scols = canon(spark_df)
            drows, dcols = canon(duck_df)
            dt = f"{time.monotonic() - t0:7.1f}s"
            if scols != dcols:
                print(f"FAIL {name}: columns {scols} vs {dcols}",
                      flush=True)
                n_bad += 1
            elif srows != drows:
                diff = [
                    (a, b) for a, b in zip(srows, drows) if a != b
                ][:3]
                print(f"FAIL {name}: {len(srows)} vs {len(drows)} rows; "
                      f"first diffs: {diff}", flush=True)
                n_bad += 1
            else:
                print(f"OK   {name} ({len(srows)} rows, {dt})", flush=True)
                n_ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}", flush=True)
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==", flush=True)
    if names and not exclude and n_ok + n_bad < len(set(names)):
        # A typo'd include (e.g. an attached-dash '-q_foo' meant as an
        # exclude) must not read as a green no-op run.
        missing = sorted(set(names) - set(oracle))
        print(f"ERR  requested names not in oracle set: {missing}",
              flush=True)
        sys.exit(1)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
