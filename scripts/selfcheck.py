#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark output), runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB with the testdata tables registered
as views, then compares: schema (column names sorted), row count, and a
hash of all values with columns sorted by name and rows sorted by all
columns. Mirrors the driver contract described in the builder prompt.
"""
import sys, json, glob, os
import duckdb

def norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return repr(v)  # full precision
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # driver fixtures are flat files; ScaleGen fixtures are
        # Spark-written directories — glob inside those
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            s = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            s_cols, s_types = list(s.columns), [str(t) for t in s.types]
            s_rows = s.fetchall()
            o = con.sql(oracle[name])
            o_cols, o_types = list(o.columns), [str(t) for t in o.types]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        problems = []
        # Portability invariant (learned round 7): HUGEINT / DECIMAL result
        # columns hash differently across DuckDB builds — every oracle (and
        # the Spark twin) must CAST wide-integer outputs to
        # BIGINT/INT/DOUBLE/VARCHAR/BOOLEAN in the final SELECT.
        wide = [f"oracle {c}:{t}" for c, t in zip(o_cols, o_types)
                if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()]
        wide += [f"spark {c}:{t}" for c, t in zip(s_cols, s_types)
                 if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()]
        if wide:
            problems.append(
                "non-portable wide-integer output columns ["
                + ", ".join(wide)
                + "] — CAST to BIGINT/DOUBLE/VARCHAR in the final SELECT")
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"schema spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        if len(s_rows) != len(o_rows):
            problems.append(f"rows spark={len(s_rows)} oracle={len(o_rows)}")
        if not problems and table_hash(s_cols, s_rows) != table_hash(o_cols, o_rows):
            problems.append("value hash mismatch")
            # show first differing row for debugging
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            ls = sorted("\x01".join(norm(r[i]) for i in order_s) for r in s_rows)
            lo = sorted("\x01".join(norm(r[i]) for i in order_o) for r in o_rows)
            for a, b in zip(ls, lo):
                if a != b:
                    problems.append(f"  spark : {a[:300]}")
                    problems.append(f"  oracle: {b[:300]}")
                    break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for extra in problems[1:]:
                print("      " + extra)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    # queries without oracle: rows-only check
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if os.path.isdir(d) and name not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
                print(f"INFO {name}: no oracle, {n} rows")
            except Exception as e:
                print(f"FAIL {name}: unreadable output: {e}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
