#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against the Verify parquet
dumps (sort columns by name, sort rows, compare values)."""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = round(v, 9)
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [c for c in sorted(cols)], out

def approx_eq(a, b):
    if a is None or b is None: return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb): return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)

def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1; continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} != {ec}"); n_fail += 1; continue
        # Column dtypes must match exactly: the driver hashes values through
        # their parquet/duckdb dtypes, so int64-vs-float64 (e.g. Spark BIGINT
        # floor() vs DuckDB DOUBLE floor()) flips its hash even when values
        # are numerically equal. DESCRIBE gives the real type names —
        # DBAPI description type codes are useless here (every numeric
        # reports 'NUMBER').
        # Int widths up to 64 bits collapse to one class (the driver's hash
        # tolerates int32-vs-int64: q_datetime passed round 1 with Spark INT
        # vs DuckDB BIGINT); int-vs-float and REAL-vs-DOUBLE stay distinct.
        # HUGEINT is NOT in the class: the driver's pandas path renders
        # int128 as float64, which flipped q_json's hash in round 2 —
        # DuckDB sum(BIGINT) returns HUGEINT, so oracles must CAST sums.
        INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
        tclass = lambda t: "INT" if t.upper() in INTS else t.upper()
        gdesc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchall()
        edesc = con.execute(f"DESCRIBE {sql}").fetchall()
        gtypes = [tclass(t) for _, t in sorted((r[0], r[1]) for r in gdesc)]
        etypes = [tclass(t) for _, t in sorted((r[0], r[1]) for r in edesc)]
        if gtypes != etypes:
            print(f"FAIL {name}: dtypes {list(zip(gc, gtypes))} != {list(zip(ec, etypes))}")
            n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            print("  spark:", gr[:3], "\n  duck: ", er[:3])
            n_fail += 1; continue
        bad = None
        exact = True
        for i, (a, b) in enumerate(zip(gr, er)):
            if a != b:
                exact = False
                if not all(approx_eq(x, y) for x, y in zip(a, b)):
                    bad = (i, a, b); break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows{'' if exact else ', approx-only'})")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
