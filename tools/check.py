#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle (oracle_sql.json) on the same parquet
tables, compare TYPES (the driver's hash is type-sensitive — a DuckDB
HUGEINT/DECIMAL vs a Spark BIGINT is a driver failure even when every
value matches; see FIXTURES.md §6) and then values exactly (columns
sorted by name, rows as ordered).

Usage: python3 tools/check.py <sfdir> <verify_out_dir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")


def canon(t):
    """Canonical type label for arrow-type comparison: width-insensitive
    for string/binary flavors (duckdb emits large_string, spark plain
    string), unit-insensitive for timestamps; everything else literal —
    which is exactly what makes HUGEINT (arrow decimal128(38,0)) vs
    BIGINT (int64) a loud local failure instead of a driver surprise."""
    s = str(t)
    if s in ("string", "large_string", "string_view"):
        return "string"
    if s in ("binary", "large_binary", "binary_view"):
        return "binary"
    if s.startswith("timestamp["):
        return "timestamp"
    if s.startswith("large_list<") or s.startswith("list<"):
        # canonicalize the element type too (duckdb emits
        # large_list<large_string> where spark reads list<string>)
        try:
            return f"list<{canon(t.value_type)}>"
        except AttributeError:
            return f"list<{s[s.index('<') + 1:-1]}>"
    return s


oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
ftxt = f"{outdir}/failures.txt"
if os.path.exists(ftxt) and open(ftxt).read().strip():
    for line in open(ftxt).read().strip().splitlines():
        print(f"FAIL (spark error) {line}")
        fails += 1
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    try:
        files = glob.glob(f"{spark_dir}/*.parquet")
        got_tbl = pq.read_table(files[0])
        got = got_tbl.to_pandas()
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fails += 1; continue
    try:
        exp_tbl = con.execute(sql).arrow()
        exp = exp_tbl.to_pandas()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1; continue
    # type gate: the driver hashes values WITH their types, so a
    # HUGEINT- or DECIMAL-widened oracle column fails there even when
    # values are exact — fail it here first.
    gtypes = {f.name: canon(f.type) for f in got_tbl.schema}
    etypes = {f.name: canon(f.type) for f in exp_tbl.schema}
    tbad = [c for c in got.columns if gtypes[c] != etypes[c]]
    if tbad:
        for c in tbad:
            print(f"FAIL {name}: col {c} TYPE spark={gtypes[c]} oracle={etypes[c]}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    ok = True
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a != b and not (a != a and b != b):  # NaN==NaN ok
                print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
                ok = False; fails += 1; break
        if not ok: break
    if ok:
        print(f"PASS {name} ({len(got)} rows)")

# rows-only queries (in verify out but no oracle)
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle:
        try:
            n = sum(pq.read_table(f).num_rows for f in glob.glob(f"{d}/*.parquet"))
            print(f"ROWS {name}: {n} rows {'(ok)' if n > 0 else '(EMPTY!)'}")
            if n == 0: fails += 1
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1

print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
