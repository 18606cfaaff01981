#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool, not shipped code).

Usage: tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), registers the
<sfDir> parquet tables as DuckDB views, runs each oracle SQL, loads the
Spark result parquet, sorts columns by name and rows by all values, and
compares cell-by-cell (exact; floats also get a 1e-9-relative fallback so
we can tell 'wrong' from 'last-ulp').
"""
import sys, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

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
            print(f"FAIL {name}: no spark result parquet"); n_bad += 1; continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_bad += 1; continue
        s = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        oc, orr = norm(orows, ocols)
        sc, srr = norm(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}"); n_bad += 1; continue
        if len(orr) != len(srr):
            print(f"FAIL {name}: rows spark={len(srr)} oracle={len(orr)}"); n_bad += 1; continue
        exact = srr == orr
        ok = exact or all(
            all(close(a, b) for a, b in zip(sr, orr_)) for sr, orr_ in zip(srr, orr))
        if ok:
            tag = "OK  " if exact else "OK~ (float-tolerance only!)"
            print(f"{tag} {name}: {len(srr)} rows"); n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: value mismatch; first diffs:")
            shown = 0
            for i, (sr, orr_) in enumerate(zip(srr, orr)):
                if not all(close(a, b) for a, b in zip(sr, orr_)):
                    print(f"  row {i}: spark={sr}\n         oracle={orr_}")
                    shown += 1
                    if shown >= 3:
                        break
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
