#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only, not part of
the library): run graft.Verify first (sbt "runMain graft.Verify <sfDir>
<outDir>"), then this script loads each <outDir>/<name> parquet result,
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
same sf parquet tables, sorts columns by name, and compares values.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet")
            n_bad += 1
            continue
        try:
            rel = con.sql(sql)
            # Driver-faithful dtype gate: pandas widens DuckDB HUGEINT to
            # float64, so the driver's hash sees int64-vs-float64 even when
            # every value matches. Ban HUGEINT-typed oracle output outright.
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if "HUGEINT" in str(t).upper()]
            if huge:
                print(f"FAIL {name}: oracle columns {huge} type as HUGEINT "
                      f"(cast to BIGINT in the SQL)")
                n_bad += 1
                continue
            mine = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            ref = rel.df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        mine = mine[sorted(mine.columns)]
        ref = ref[sorted(ref.columns)]
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != "
                  f"{list(ref.columns)}")
            n_bad += 1
            continue
        # The driver hashes the pandas VALUES (stringified), so dtype CLASS
        # drift fails its gate even when values compare equal here: int64 1
        # vs float64 1.0 hash differently, and float32 vs float64 repr can
        # differ. Integer WIDTH (int32 vs int64) is invisible to it — warn
        # only, so real queries using row_number() (int32) vs DuckDB BIGINT
        # don't churn.
        def dclass(dt):
            return "int" if dt.kind in "iu" else str(dt)
        dbad, dwarn = [], []
        for c in mine.columns:
            a, b = mine[c].dtype, ref[c].dtype
            if dclass(a) != dclass(b):
                dbad.append((c, str(a), str(b)))
            elif a != b:
                dwarn.append((c, str(a), str(b)))
        if dwarn:
            print(f"WARN {name}: int width differs {dwarn}")
        if dbad:
            print(f"FAIL {name}: dtype class mismatch {dbad}")
            n_bad += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} != {len(ref)}")
            n_bad += 1
            continue
        a = [tuple(norm(v) for v in row) for row in mine.itertuples(False)]
        b = [tuple(norm(v) for v in row) for row in ref.itertuples(False)]
        if a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  mine: {a[bad]}")
            print(f"  ref : {b[bad]}")
            n_bad += 1
            continue
        print(f"OK   {name} ({len(mine)} rows)")
    print(f"{'PASS' if n_bad == 0 else 'FAIL'}: "
          f"{len(oracle) - n_bad}/{len(oracle)} queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
