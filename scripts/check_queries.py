#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare VerifyOne
parquet dumps against their DuckDB oracle rows (columns sorted by name,
rows sorted, exact value compare). Usage:
  python3 scripts/check_queries.py OUTDIR [SFDIR]
"""
import json, math, sys
from pathlib import Path

import duckdb

outdir = Path(sys.argv[1])
sfdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")

con = duckdb.connect()
for p in sfdir.glob("*.parquet"):
    con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")

oracles = json.loads((outdir / "oracle_sql.json").read_text())


# The driver hashes results through pandas: HUGEINT/DECIMAL lose their
# integer dtype (-> float64/object) and LIST/STRUCT columns crash
# sort_values ("unhashable type"). Reject them here so an uncast oracle
# column can never ship green locally and fail the driver's gate.
BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "STRUCT", "MAP", "[]")


def dtype_offenders(rel):
    return [
        f"{c}:{t}"
        for c, t in zip(rel.columns, rel.types)
        if any(bad in str(t).upper() for bad in BAD_TYPES)
    ]


fail = 0
for name, sql in sorted(oracles.items()):
    spark_rel = con.sql(f"SELECT * FROM '{outdir / name}/*.parquet'")
    cols = sorted(spark_rel.columns)
    sel = ", ".join(f'"{c}"' for c in cols)
    srows = con.sql(f'SELECT {sel} FROM spark_rel ORDER BY ALL').fetchall()
    orel = con.sql(sql)
    bad = [("oracle", o) for o in dtype_offenders(orel)]
    bad += [("spark", o) for o in dtype_offenders(spark_rel)]
    if bad:
        for side, o in bad:
            print(f"[FAIL] {name}: {side} column {o} is not driver-hashable "
                  f"(CAST to BIGINT/DOUBLE or posexplode)")
        fail += 1
        continue
    ocols = sorted(orel.columns)
    orows = con.sql(f'SELECT {", ".join(chr(34)+c+chr(34) for c in ocols)} FROM orel ORDER BY ALL').fetchall()
    ok = cols == ocols and len(srows) == len(orows)
    if ok:
        for a, b in zip(srows, orows):
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    if not (x == y or (math.isnan(x) and math.isnan(y))):
                        ok = False
                elif x != y:
                    ok = False
            if not ok:
                break
    status = "OK " if ok else "FAIL"
    print(f"[{status}] {name}: spark={len(srows)} cols={cols} oracle={len(orows)} cols={ocols}")
    if not ok:
        fail += 1
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                print(f"  first diff at row {i}:\n    spark : {a}\n    oracle: {b}")
                break
sys.exit(1 if fail else 0)
