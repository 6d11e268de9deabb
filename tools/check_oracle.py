#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the same parquet tables and compare with the Spark results
dumped by graft.Verify (sorted columns, sorted rows, value compare).

Also the DECLARED-vs-CHECKED guard (round-8 lesson): the driver's
CORRECTNESS artifact silently omits rows whose Verify output is missing, so
a sheet can read 82/82-clean while 10 of 92 declared queries failed at
analysis. Verify dumps `declared_queries.json`; every declared name with no
output dir counts as a FAIL here, oracle or not — run this before every
round-closing commit."""
import json, os, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    return v

def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda row: tuple((x is None, str(x)) for x in row))
    return [cols[i] for i in idx], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        srel = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols = [d[0] for d in srel.description]
        srows = srel.fetchall()
        oc, onorm = norm_rows(ocols, orows)
        sc, snorm = norm_rows(scols, srows)
        if oc != sc:
            print(f"SCHEMA   {name}: oracle={oc} spark={sc}")
            n_fail += 1
        elif onorm != snorm:
            diff_o = [r for r in onorm if r not in snorm][:3]
            diff_s = [r for r in snorm if r not in onorm][:3]
            print(f"VALUES   {name}: rows oracle={len(onorm)} spark={len(snorm)}")
            print(f"         only-oracle sample: {diff_o}")
            print(f"         only-spark  sample: {diff_s}")
            n_fail += 1
        else:
            print(f"OK       {name} ({len(snorm)} rows)")
            n_pass += 1
    no_oracle = [d.split('/')[-1] for d in glob.glob(f"{out_dir}/*")
                 if '/' in d and d.split('/')[-1] not in oracle
                 and not d.endswith('.json')]
    if no_oracle:
        print(f"rows-only (no oracle): {sorted(no_oracle)}")
    # declared-vs-checked guard: every declared query must have produced
    # output, oracle-checked or rows-only — missing output is a hidden
    # failure, never a clean sheet
    decl_path = f"{out_dir}/declared_queries.json"
    if os.path.exists(decl_path):
        declared = json.load(open(decl_path))
        try:
            verrs = json.load(open(f"{out_dir}/verify_errors.json"))
        except Exception:
            verrs = {}
        checked = set(oracle) | set(no_oracle)
        silent = [n for n in declared
                  if n not in checked or (n not in oracle
                      and not glob.glob(f"{out_dir}/{n}/*.parquet"))]
        for n in sorted(silent):
            print(f"DECLARED-MISSING {n}: no Verify output"
                  + (f" — {verrs[n]}" if n in verrs else ""))
            n_fail += 1
        print(f"declared {len(declared)}, with output {len(declared) - len(silent)}, "
              f"silently missing {len(silent)}")
    else:
        print("WARNING: no declared_queries.json — declared-vs-checked guard skipped "
              "(re-run graft.Verify to generate it)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
