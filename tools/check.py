#!/usr/bin/env python3
"""Local pre-verification harness mimicking the driver's correctness gate:
runs graft.Verify at a given SF dir, then replays each oracle SQL in DuckDB
over the same parquet tables and compares (columns sorted by name, rows
sorted, values compared with a small float tolerance report + exact-match
flag). Dev tool only — not part of the library.

Usage: python3 tools/check.py [sfdir] [outdir] [query ...]
"""
import json, math, subprocess, sys, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def run_verify():
    names = " ".join(sorted(ONLY))
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT} {names}'.strip()],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
    if r.returncode != 0:
        print(tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def compare(name, got_rows, want_rows):
    if len(got_rows) != len(want_rows):
        return f"ROWCOUNT got={len(got_rows)} want={len(want_rows)}"
    worst = 0.0
    for g, w in zip(got_rows, want_rows):
        if len(g) != len(w):
            return f"COLCOUNT {len(g)} vs {len(w)}"
        for a, b in zip(g, w):
            a, b = norm(a), norm(b)
            if a == b: continue
            if isinstance(a, float) and isinstance(b, float):
                d = abs(a - b)
                if d > 0: worst = max(worst, d)
                if d > 1e-9:
                    return f"FLOATDIFF {a} vs {b} (d={d})"
            else:
                return f"VALUEDIFF {a!r} vs {b!r}"
    return "OK" if worst == 0 else f"OK~ (maxfloatdiff={worst:g})"

def type_family(t):
    import pyarrow.types as pt
    if pt.is_boolean(t): return "bool"
    if pt.is_integer(t): return "int"
    if pt.is_floating(t): return "float"
    if pt.is_decimal(t): return "decimal"
    if pt.is_string(t) or pt.is_large_string(t): return "string"
    if pt.is_date(t): return "date"
    if pt.is_timestamp(t): return "timestamp"
    if pt.is_binary(t) or pt.is_large_binary(t): return "binary"
    if pt.is_list(t) or pt.is_large_list(t): return "list"
    return str(t)

def type_mismatches(got_df, want_df, cols):
    bad = []
    for c in cols:
        g = type_family(got_df.schema.field(c).type)
        w = type_family(want_df.schema.field(c).type)
        if g != w:
            bad.append(f"{c}: spark={g} oracle={w}")
    return "; ".join(bad)

def check_one(name, sql):
    """Replay one oracle on a thread-local DuckDB connection (duckdb
    releases the GIL during execution, so a thread pool gives real
    parallelism; independent connections avoid shared-cursor races)."""
    import duckdb, threading
    tls = check_one.__dict__.setdefault("tls", threading.local())
    con = getattr(tls, "con", None)
    if con is None:
        con = tls.con = duckdb.connect()
        # Bound each connection's internal parallelism: every pooled
        # connection defaults to all 32 cores, so 16 workers would
        # oversubscribe 512-way. 2 threads/conn x 16 workers ~ the box.
        con.execute(f"PRAGMA threads={os.environ.get('CHECK_DUCK_THREADS', '2')}")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    pdir = f"{OUT}/{name}"
    if not os.path.isdir(pdir):
        return "MISSING SPARK OUTPUT"
    try:
        got_df = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").fetch_arrow_table()
        cols = sorted(got_df.column_names)
        got = con.execute(
            f"SELECT {', '.join(cols)} FROM got_df ORDER BY {', '.join(cols)}").fetchall()
        want_all = con.execute(sql).fetch_arrow_table()
        wcols = sorted(want_all.column_names)
        if cols != wcols:
            return f"SCHEMA got={cols} want={wcols}"
        # Type-family check: the driver's hash is type-tagged, so a
        # value-equal result in a different family (e.g. DuckDB
        # HUGEINT/INT128 from sum(BIGINT) vs Spark's LongType) still
        # fails there. Catch it locally before the driver does.
        tf = type_mismatches(got_df, want_all, cols)
        if tf:
            return f"TYPEFAMILY {tf}"
        want = con.execute(
            f"SELECT {', '.join(wcols)} FROM want_all ORDER BY {', '.join(wcols)}").fetchall()
        return compare(name, got, want)
    except Exception as e:
        return f"ERROR {e}"

def main():
    from concurrent.futures import ThreadPoolExecutor
    run_verify()
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    todo = [(n, s) for n, s in sorted(oracles.items()) if not ONLY or n in ONLY]
    nthreads = int(os.environ.get("CHECK_THREADS", "16"))
    with ThreadPoolExecutor(max_workers=nthreads) as ex:
        results = dict(zip([n for n, _ in todo],
                           ex.map(lambda p: check_one(*p), todo)))
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') else 'FAIL':4} {k}: {v}")
    print(f"== {ok}/{len(results)} pass ==")

if __name__ == "__main__":
    main()
