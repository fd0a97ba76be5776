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
import pyarrow.parquet as pq
import pyarrow.types as pat


def arrow_class(t):
    """Collapse an arrow type to the class the driver's typed hash sees.

    The r13 hole: the value compare below reads the Spark parquet back
    THROUGH DuckDB->pandas, which silently coerces decimal128 to float64
    -- so a Spark-side DECIMAL result column compared green locally while
    the driver (which reads the parquet directly) hashed Decimal reprs
    and stayed red for two rounds. This classifier looks at the parquet
    FOOTER type, before any coercion can hide it.
    """
    if pat.is_decimal(t):
        return "decimal"
    if pat.is_float64(t):
        return "float64"
    if pat.is_float32(t):
        return "float32"
    if pat.is_integer(t):
        return "int"
    if pat.is_boolean(t):
        return "bool"
    if pat.is_string(t) or pat.is_large_string(t):
        return "string"
    if pat.is_date(t):
        return "date"
    if pat.is_timestamp(t):
        return "timestamp"
    if pat.is_list(t) or pat.is_large_list(t) or pat.is_fixed_size_list(t):
        return "list<" + arrow_class(t.value_type) + ">"
    return str(t)


def duck_class(t):
    """Same classes for a DuckDB relation type string."""
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s == "DOUBLE":
        return "float64"
    if s in ("FLOAT", "REAL"):
        return "float32"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s == "BOOLEAN":
        return "bool"
    if s == "VARCHAR":
        return "string"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s.endswith("[]"):
        return "list<" + duck_class(s[:-2]) + ">"
    return s

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
            # Footer-level schema gate (the r13 fix): compare the Spark
            # result parquet's PHYSICAL arrow types against the oracle
            # relation's types BEFORE the value compare, because the
            # DuckDB->pandas read below coerces decimal to float64 and
            # would hide exactly the dtype drift the driver fails on.
            spark_types = {f.name: arrow_class(f.type)
                           for f in pq.read_schema(files[0])}
            duck_types = {c: duck_class(t)
                          for c, t in zip(rel.columns, rel.types)}
            sbad = []
            for c in sorted(duck_types):
                a = spark_types.get(c)
                if a is not None and a != duck_types[c]:
                    sbad.append((c, a, duck_types[c]))
            if sbad:
                print(f"FAIL {name}: parquet schema class mismatch "
                      f"(spark vs oracle) {sbad}")
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
