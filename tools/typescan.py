#!/usr/bin/env python3
"""Pre-close oracle TYPE scan: plan (LIMIT 0 — no data read beyond what
DuckDB needs to bind) every SQL in SparkEntry.oracleSql against the sf
tables and assert no output column is HUGEINT/INT128 or an unintended
DECIMAL. The driver's hash is type-sensitive, so a DuckDB-widened
sum(BIGINT) → HUGEINT ships as a correctness failure even when every
value matches (the round-8 defect class; FIXTURES.md §6). Run this
after ANY oracle twin edit and before every round close.

Usage: python3 tools/typescan.py <sfdir> <oracle_sql.json>
       (oracle_sql.json comes from any graft.Verify run's outDir)
"""
import json, sys, glob, os
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

# DECIMAL is legitimate ONLY where the Spark side deliberately emits
# DecimalType and the twin matches it; list those (name, col) pairs here.
ALLOWED_DECIMAL = set()

oracle = json.load(open(oracle_path))
bad = 0
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        cols, types = rel.columns, [str(t) for t in rel.types]
    except Exception as e:
        print(f"FAIL {name}: oracle does not plan: {e}")
        bad += 1
        continue
    for c, t in zip(cols, types):
        if t in ("HUGEINT", "UHUGEINT", "INT128"):
            print(f"FAIL {name}: col {c} plans to {t} — add CAST(... AS BIGINT)")
            bad += 1
        elif t.startswith("DECIMAL") and (name, c) not in ALLOWED_DECIMAL:
            print(f"FAIL {name}: col {c} plans to {t} — unintended widening"
                  " (cast, or allow-list the pair if the Spark side is decimal)")
            bad += 1

print("TYPESCAN PASS" if bad == 0 else f"TYPESCAN: {bad} bad columns")
sys.exit(1 if bad else 0)
