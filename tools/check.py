#!/usr/bin/env python3
"""Self-check harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each oracle
SQL in DuckDB over views named after the fixture tables, reads our Spark
parquet output from <outDir>/<name>/, and compares schema + row values in
order. Exit code = number of failing queries.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            orel = con.sql(sql)
            ocols = list(orel.columns)
            otypes = [str(t) for t in orel.types]
            oracle = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            ucols = list(rel.columns)
            utypes = [str(t) for t in rel.types]
            ours = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(ucols):
            print(f"FAIL {name}: columns differ: oracle={ocols} ours={ucols}")
            n_fail += 1
            continue
        # align column order by name (the driver sorts columns by name)
        operm = sorted(range(len(ocols)), key=lambda i: ocols[i])
        uperm = sorted(range(len(ucols)), key=lambda i: ucols[i])
        if len(oracle) != len(ours):
            print(f"FAIL {name}: rows differ: oracle={len(oracle)} ours={len(ours)}")
            n_fail += 1
            continue
        # Compare DuckDB *logical* types (rel.types), not DB-API codes:
        # HUGEINT vs BIGINT both stringify as NUMBER at the DB-API layer,
        # but the driver's hasher canonicalizes integer widths differently,
        # so a width divergence is a guaranteed driver hash-fail. Same for
        # DECIMAL vs DOUBLE/FLOAT. Those are hard FAILs; anything else that
        # differs is still just a warning.
        type_warn = ""
        ot = [str(otypes[i]) for i in operm]
        ut = [str(utypes[i]) for i in uperm]
        type_fail = None
        if ot != ut:
            INT_WIDTHS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                          "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
                          "UBIGINT", "UHUGEINT"}
            FLOATY = {"FLOAT", "DOUBLE"}
            for i, (a, b) in enumerate(zip(ot, ut)):
                if a == b:
                    continue
                if a in INT_WIDTHS and b in INT_WIDTHS:
                    type_fail = (ocols[operm[i]], a, b)
                    break
                a_dec, b_dec = a.startswith("DECIMAL"), b.startswith("DECIMAL")
                if (a_dec and (b in FLOATY or b in INT_WIDTHS)) or \
                   (b_dec and (a in FLOATY or a in INT_WIDTHS)) or \
                   (a_dec and b_dec and a != b) or \
                   (a in FLOATY and b in INT_WIDTHS) or \
                   (b in FLOATY and a in INT_WIDTHS):
                    type_fail = (ocols[operm[i]], a, b)
                    break
            else:
                type_warn = f"  [type-warn] oracle={ot} ours={ut}"
        if type_fail:
            c, a, b = type_fail
            print(f"FAIL {name}: col {c} logical type: oracle={a} ours={b} "
                  f"(driver hash canonicalizes these differently)")
            n_fail += 1
            continue
        bad = None
        max_float_diff = 0.0
        for r, (orow, urow) in enumerate(zip(oracle, ours)):
            for oi, ui in zip(operm, uperm):
                a, b = orow[oi], urow[ui]
                if a is None and b is None:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if a != b:
                        d = abs(a - b)
                        max_float_diff = max(max_float_diff, d)
                        if not (math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)):
                            bad = (r, ocols[oi], a, b)
                            break
                        continue
                elif a != b:
                    bad = (r, ocols[oi], a, b)
                    break
            if bad:
                break
        if bad:
            r, c, a, b = bad
            print(f"FAIL {name}: row {r} col {c}: oracle={a!r} ours={b!r}")
            n_fail += 1
        else:
            extra = ""
            if max_float_diff > 0:
                extra = f"  [float-diff max {max_float_diff:.2e} — not hash-exact!]"
            print(f"PASS {name}: {len(oracle)} rows{extra}{type_warn}")
    sys.exit(min(n_fail, 100))


if __name__ == "__main__":
    main()
