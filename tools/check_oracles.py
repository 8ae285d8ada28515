#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify at a given
SF, then execute each oracle_sql.json query in DuckDB over the same parquet
tables and diff (column-name-sorted, row-sorted, float-tolerant).

Dev tool only — the library itself never depends on Python.

Usage: python3 tools/check_oracles.py [sfdir] [outdir]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.01"
OUT = Path(ARGS[1] if len(ARGS) > 1 else "/tmp/graft_verify")


def run_verify():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit(1)


def canon_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 4)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [cols[i] for i in order]


def main():
    if "--no-verify" not in sys.argv:
        run_verify()
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        p = f"{SF}/{tbl}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name, sql in sorted(oracle.items()):
        pq = OUT / name
        if not pq.exists():
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            spark_rel = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        s_rows, s_cols = canon_rows(spark_rows, spark_cols)
        d_rows, d_cols = canon_rows(duck_rows, duck_cols)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            failures += 1
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            failures += 1
        else:
            bad = None
            for a, b in zip(s_rows, d_rows):
                if not rows_eq(a, b):
                    bad = (a, b)
                    break
            if bad:
                print(f"FAIL {name}: first diff\n  spark={bad[0]}\n  duck ={bad[1]}")
                failures += 1
            else:
                print(f"OK   {name} ({len(s_rows)} rows)")
    sys.exit(1 if failures else 0)


def rows_eq(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y):
                continue
            if abs(x - y) > 1e-6 * max(1.0, abs(x), abs(y)):
                return False
        elif x != y:
            return False
    return True


if __name__ == "__main__":
    main()
