#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against the Verify dump
(column names sorted, rows sorted, values hashed)."""
import sys, json, glob, hashlib
import duckdb

def table_hash(rows, cols):
    h = hashlib.sha256()
    for row in sorted(rows, key=lambda r: tuple(str(x) for x in r)):
        for v in row:
            h.update(repr(v).encode())
            h.update(b"|")
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        pq = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not pq:
            results[name] = "MISSING_RESULT"
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({pq!r})")
            got_cols = sorted(got.columns)
            # quote identifiers: an unaliased aggregate name like count(1)
            # or a reserved word would otherwise be a spurious syntax error
            gsel = ', '.join(f'"{c}"' for c in got_cols)
            got_rows = con.sql(
                f"SELECT {gsel} FROM read_parquet({pq!r})").fetchall()
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            esel = ', '.join(f'"{c}"' for c in exp_cols)
            exp_rows = con.sql(f"SELECT {esel} FROM ({sql})").fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {str(e)[:200]}"
            continue
        if got_cols != exp_cols:
            results[name] = f"SCHEMA_MISMATCH spark={got_cols} oracle={exp_cols}"
        elif len(got_rows) != len(exp_rows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(got_rows)} oracle={len(exp_rows)}"
        elif table_hash(got_rows, got_cols) != table_hash(exp_rows, exp_cols):
            diff = None
            for a, b in zip(sorted(got_rows, key=lambda r: tuple(str(x) for x in r)),
                            sorted(exp_rows, key=lambda r: tuple(str(x) for x in r))):
                if a != b:
                    diff = f"first diff: spark={a} oracle={b}"
                    break
            results[name] = f"HASH_MISMATCH rows={len(got_rows)} {diff}"
        else:
            results[name] = f"OK rows={len(got_rows)}"
    # queries without oracle → rows-only
    import os
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(d)
        if name not in oracle and os.path.isdir(d):
            pq = glob.glob(f"{d}/*.parquet")
            if pq:
                n = con.sql(f"SELECT count(*) FROM read_parquet({pq!r})").fetchone()[0]
                results[name] = f"ROWS_ONLY rows={n}"
            else:
                # an empty dir means the Verify write failed after the
                # stale-output delete — that is a FAILURE, not rows=0
                results[name] = "MISSING_RESULT (no parquet written)"
    bad = 0
    for k in sorted(results):
        ok = results[k].startswith(("OK", "ROWS_ONLY"))
        bad += 0 if ok else 1
        print(("PASS " if ok else "FAIL ") + k + " :: " + results[k])
    print(f"\n{len(results)-bad}/{len(results)} pass")
    # Round artifact (VERDICT r3 ask #10): persist the per-query verdicts —
    # including HASH_MISMATCH first-diff rows — so a driver-side red is
    # localized from the committed artifact instead of costing a round.
    art = sys.argv[3] if len(sys.argv) > 3 else "ORACLE_CHECK_LOCAL.json"
    with open(art, "w") as f:
        json.dump({"sf_dir": sf_dir, "pass": len(results) - bad,
                   "total": len(results), "results": results}, f, indent=1)
    print(f"wrote {art}")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
