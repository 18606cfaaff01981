#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool, not shipped code).

Usage: tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), registers the
<sfDir> parquet tables as DuckDB views, runs each oracle SQL, loads the
Spark result parquet, sorts columns by name and rows by all values, and
compares cell-by-cell (exact; floats also get a 1e-9-relative fallback so
we can tell 'wrong' from 'last-ulp').

Each oracle runs under a wall-clock limit (CHECK_TIMEOUT_SEC, default 60)
enforced via duckdb's interrupt() from a watchdog thread, and every result
line is flushed as it is produced — so one pathological oracle degrades to
a single "FAIL name: oracle timeout" line instead of starving the whole
run (the r7 incident: q138's un-materialized CTE chain ran >10 min and
zeroed the entire round's correctness output).
"""
import sys, json, glob, math, os, threading
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
TIMEOUT = float(os.environ.get("CHECK_TIMEOUT_SEC", "60"))

def norm(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))

def close(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return False

def run_limited(con, sql):
    """Execute sql; on timeout interrupt the connection and raise TimeoutError.

    The interrupt is guarded by a flag under a lock so a timer firing just
    as the query completes cannot leave a stale interrupt pending for the
    next execute on this connection (which would abort the whole checker —
    the race the round-8 advice flagged)."""
    lock = threading.Lock()
    running = [True]
    def fire():
        with lock:
            if running[0]:
                con.interrupt()
    timer = threading.Timer(TIMEOUT, fire)
    timer.start()
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    except duckdb.InterruptException:
        raise TimeoutError(f"oracle timeout after {TIMEOUT:.0f}s")
    finally:
        with lock:
            running[0] = False
        timer.cancel()

def read_spark(con, files):
    """Read the Spark result parquet; retry once if a stale watchdog
    interrupt from the previous oracle lands on this execute."""
    for attempt in range(2):
        try:
            s = con.execute(f"SELECT * FROM read_parquet({files!r})")
            return [d[0] for d in s.description], s.fetchall()
        except duckdb.InterruptException:
            if attempt:
                raise
    raise RuntimeError("unreachable")

def out(line):
    print(line, flush=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            out(f"FAIL {name}: no spark result parquet"); n_bad += 1; continue
        try:
            ocols, orows = run_limited(con, sql)
        except TimeoutError as e:
            out(f"FAIL {name}: {e}"); n_bad += 1; continue
        except Exception as e:
            out(f"FAIL {name}: oracle sql error: {e}"); n_bad += 1; continue
        scols, srows = read_spark(con, files)
        oc, orr = norm(orows, ocols)
        sc, srr = norm(srows, scols)
        if oc != sc:
            out(f"FAIL {name}: columns spark={sc} oracle={oc}"); n_bad += 1; continue
        if len(orr) != len(srr):
            out(f"FAIL {name}: rows spark={len(srr)} oracle={len(orr)}"); n_bad += 1; continue
        exact = srr == orr
        ok = exact or all(
            all(close(a, b) for a, b in zip(sr, orr_)) for sr, orr_ in zip(srr, orr))
        if ok:
            tag = "OK  " if exact else "OK~ (float-tolerance only!)"
            out(f"{tag} {name}: {len(srr)} rows"); n_ok += 1
        else:
            n_bad += 1
            out(f"FAIL {name}: value mismatch; first diffs:")
            shown = 0
            for i, (sr, orr_) in enumerate(zip(srr, orr)):
                if not all(close(a, b) for a, b in zip(sr, orr_)):
                    out(f"  row {i}: spark={sr}\n         oracle={orr_}")
                    shown += 1
                    if shown >= 3:
                        break
    out(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
