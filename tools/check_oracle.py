#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against the Verify dump
(column names sorted, rows sorted, values hashed).

Also sweeps arrow-level dtype parity (VERDICT r4 ask #2): a DuckDB output
whose engine-native type differs in CLASS from the Spark parquet type (e.g.
HUGEINT -> decimal128 vs int64) can hash green locally but red at the driver
when a newer DuckDB maps it to a different Python type (q09's four-round
lottery). Any class divergence is a FAIL here even when values hash equal."""
import sys, json, glob, hashlib
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq_mod


def type_class(t):
    """Collapse arrow types to the classes whose Python values repr
    identically across engines; anything outside the known-benign set must
    match exactly."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_decimal(t):
        return "decimal(%d,%d)" % (t.precision, t.scale)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<%s>" % type_class(t.value_type)
    return str(t)


def dtype_divergence(spark_schema, oracle_schema, cols):
    bad = []
    for c in cols:
        a = spark_schema.field(c).type
        b = oracle_schema.field(c).type
        if type_class(a) != type_class(b):
            bad.append(f"{c}: spark={a} oracle={b}")
    return bad

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
            continue
        # arrow dtype parity: stricter than any driver hasher — engine-native
        # type lotteries (HUGEINT/decimal128) fail HERE even when the local
        # DuckDB happens to hash green
        try:
            spark_schema = pq_mod.read_schema(pq[0])
            oracle_schema = con.sql(f"SELECT {esel} FROM ({sql}) LIMIT 0").arrow().schema
            dt_bad = dtype_divergence(spark_schema, oracle_schema, exp_cols)
        except Exception as e:
            dt_bad = [f"dtype sweep error: {str(e)[:200]}"]
        if dt_bad:
            results[name] = "DTYPE_DIVERGENCE " + "; ".join(dt_bad)
        elif len(got_rows) != len(exp_rows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(got_rows)} oracle={len(exp_rows)}"
        elif table_hash(got_rows, got_cols) != table_hash(exp_rows, exp_cols):
            diffs = []
            for a, b in zip(sorted(got_rows, key=lambda r: tuple(str(x) for x in r)),
                            sorted(exp_rows, key=lambda r: tuple(str(x) for x in r))):
                if a != b:
                    diffs.append(f"spark={a} oracle={b}")
                    if len(diffs) >= 10:
                        break
            results[name] = (f"HASH_MISMATCH rows={len(got_rows)} first "
                             f"{len(diffs)} diffs: " + " || ".join(diffs))
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
