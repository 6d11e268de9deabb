#!/usr/bin/env python3
"""sf1 full-surface gate: DuckDB-compare the Sf1Smoke dump at sf1 and write
SF1_SMOKE.json — per-query {sec, rows, oracle verdict, ratio vs sf0.1}.

Usage:
  python3 tools/sf1_gate.py <dump_dir> [sf0.1_dump]   # aggregate + write artifact
  python3 tools/sf1_gate.py --one <sf1_dir> <dump_dir> <name>   # internal

Each oracle runs in its OWN subprocess with a wall timeout. The pair-finder
rows whose truth statements are intentionally quadratic (all-pairs exact
Jaccard / levenshtein / batch-x-corpus — fine at the sf0.01/sf0.1 gates,
combinatorial at sf1) run the BOUNDED CERTIFICATE in tools/sf1_cert.py
instead (planted recall in full + md5-sampled restricted truth + structural
checks) and record `"oracle": "certificate_pass"`. An unexpected timeout on
any other row still records `"oracle": "timeout_quadratic_truth"` — and is
a signal to either fix the oracle or write that row a certificate.
sf0.1 per-query baselines come from BENCH_LOCAL.json (written by Bench) when
present, giving the sublinearity ratio x10_vs_sf01 (sf1 sec / sf0.1 sec;
< 10 = sublinear through the 10x step).
"""
import json, os, subprocess, sys, glob

TIMEOUT_SEC = int(os.environ.get("SF1_ORACLE_TIMEOUT", "240"))

# Rows whose full DuckDB truth is all-pairs/batch-x-corpus quadratic — at sf1
# they get the BOUNDED CERTIFICATE (tools/sf1_cert.py: full planted-pair
# recall + md5-sampled restricted truth + structural full checks) instead of
# a 240 s timeout that verifies nothing (round-12 directive #5). Any OTHER
# row that times out still records timeout_quadratic_truth, so a new
# quadratic truth can't silently inherit a certificate it doesn't have.
CERTIFIED = {
    "d_ngram_jaccard", "d_minhash_pairs", "d_ppjoin_pairs",
    "d_containment_pairs", "d_fuzzy_pairs", "d_incr_neardup",
    "d_incr_neardup_gen2", "d_stream_neardup",
    # all-pairs truth IS feasible on the small embedding fixture, but the
    # within-cluster semantics legitimately diverge from it once the sf1
    # replicator's perturbed replicas create natural near-1 pairs that can
    # straddle a Voronoi boundary (measured: 5 of ~21k drops at sf1) — the
    # certificate proves planted recall + never-over-drops + a bounded
    # boundary-miss rate instead of an equality SemDeDup doesn't promise
    "e_semdedup",
    # the X70 composition's near-dup doom set is the one quadratic stage;
    # the cert replays the gates+BPE plane linearly (the stream twin's
    # oracle) and pins membership via planted clones + a sampled doom pass
    "d_web_pipeline",
    # the streaming dedup twin's batch1 doom rule is the same all-pairs
    # truth (b1 x kept0 exact jaccard); batch0 + the budget plane verify
    # linearly inside its certificate
    "d_stream_web_pipeline_dedup",
    # X94 routed pairs: the same all-pairs truth class with the language
    # predicate; certificate adds the cross-language no-leak structural check
    "d_lang_routed_dedup",
    # X103 leakage-safe split: the train x eval all-pairs Jaccard truth is
    # quadratic at sf1; the certificate verifies labels + planted straddling
    # twins fully and the leak status exactly on an md5 sample
    "d_leakage_split",
}


def compare_one(sf_dir, dump_dir, name):
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # Sf1Smoke writes each table as a Spark parquet DIRECTORY
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'")
    sql = json.load(open(f"{dump_dir}/oracle_sql.json"))[name]

    def norm_cell(v):
        return round(v, 6) if isinstance(v, float) else v

    def norm_rows(cols, rows):
        idx = sorted(range(len(cols)), key=lambda i: cols[i])
        out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
        out.sort(key=lambda row: tuple((x is None, str(x)) for x in row))
        return [cols[i] for i in idx], out

    o = con.execute(sql)
    ocols = [d[0] for d in o.description]
    orows = o.fetchall()
    s = con.execute(f"SELECT * FROM '{dump_dir}/{name}/*.parquet'")
    scols = [d[0] for d in s.description]
    srows = s.fetchall()
    oc, onorm = norm_rows(ocols, orows)
    sc, snorm = norm_rows(scols, srows)
    if oc != sc:
        print(f"SCHEMA {name}: oracle={oc} spark={sc}")
        return 1
    if onorm != snorm:
        # Float-tolerance fallback, sf1 gate ONLY (the sf0.01 driver gate
        # stays exact): 10x-replicated data changes double-summation order,
        # which can flip a half-cent rounding boundary in a 2dp aggregate
        # (observed: q9 2332557.67 vs .66). Re-compare at 7 significant
        # digits; a real logic bug moves values far beyond an ULP boundary.
        def sig(v):
            return float(f"{v:.7g}") if isinstance(v, float) else v

        def sigrows(rows):
            return sorted([tuple(sig(x) for x in r) for r in rows],
                          key=lambda row: tuple((x is None, str(x)) for x in row))
        if sigrows(onorm) == sigrows(snorm):
            print(f"PASS {name} ({len(snorm)} rows, float-tol 7 sig digits)")
            return 0
        diff_o = [r for r in onorm if r not in snorm][:2]
        diff_s = [r for r in snorm if r not in onorm][:2]
        print(f"VALUES {name}: oracle={len(onorm)} spark={len(snorm)} "
              f"only-oracle={diff_o} only-spark={diff_s}")
        return 1
    print(f"PASS {name} ({len(snorm)} rows)")
    return 0


def main(dump_dir):
    # Loadavg guard (r15 verdict #8): the oracle subprocesses are CPU-bound
    # with wall timeouts — a contended box turns real oracles into spurious
    # timeout_quadratic_truth rows. Same precondition as round_gate.sh.
    import time
    max_load = float(os.environ.get("GRAFT_MAX_LOAD", "1.0"))
    for i in range(60):
        load = float(open("/proc/loadavg").read().split()[0])
        if load < max_load:
            break
        print(f"sf1 gate waiting: loadavg {load} >= {max_load} ({i + 1}/60)")
        time.sleep(30)
    else:
        print(f"SF1 GATE REFUSED: loadavg {load} >= {max_load} after 30 min")
        return 2
    print(f"sf1 gate loadavg_before: {load}")
    smoke_load = None
    if os.path.exists(f"{dump_dir}/loadavg_before.txt"):
        smoke_load = float(open(f"{dump_dir}/loadavg_before.txt").read().strip())
        print(f"sf1 smoke loadavg_before: {smoke_load}")
    sf_dir = open(f"{dump_dir}/sf1_dir.txt").read().strip()
    times = json.load(open(f"{dump_dir}/sf1_times.json"))
    oracle = json.load(open(f"{dump_dir}/oracle_sql.json"))
    declared = json.load(open(f"{dump_dir}/declared_queries.json"))
    verrs = json.load(open(f"{dump_dir}/verify_errors.json"))
    base = {}
    if os.path.exists("BENCH_LOCAL.json"):
        base = json.load(open("BENCH_LOCAL.json")).get("queries", {})

    rows = {}
    n_pass = n_fail = n_timeout = n_rows_only = n_cert = 0
    for name in sorted(declared):
        entry = dict(times.get(name, {}))
        if name in verrs:
            entry["oracle"] = "spark_error"
            n_fail += 1
        elif not glob.glob(f"{dump_dir}/{name}/*.parquet"):
            entry["oracle"] = "missing_output"
            n_fail += 1
        elif name not in oracle:
            entry["oracle"] = "rows_only"
            n_rows_only += 1
        elif name in CERTIFIED:
            cert_tool = os.path.join(os.path.dirname(__file__), "sf1_cert.py")
            try:
                r = subprocess.run(
                    [sys.executable, cert_tool, "--one", sf_dir, dump_dir, name],
                    capture_output=True, text=True, timeout=2 * TIMEOUT_SEC)
                detail = {}
                for line in r.stdout.splitlines():
                    if line.startswith("{"):
                        detail = json.loads(line).get(name, {})
                ok = r.returncode == 0 and detail.get("cert") == "pass"
                entry["oracle"] = "certificate_pass" if ok else "certificate_fail"
                entry["cert"] = detail
                if ok:
                    n_cert += 1
                else:
                    n_fail += 1
                    print((r.stdout.strip() or r.stderr.strip())[-800:])
            except subprocess.TimeoutExpired:
                entry["oracle"] = "certificate_timeout"
                n_fail += 1
        else:
            try:
                r = subprocess.run(
                    [sys.executable, __file__, "--one", sf_dir, dump_dir, name],
                    capture_output=True, text=True, timeout=TIMEOUT_SEC)
                ok = r.returncode == 0 and "PASS" in r.stdout
                entry["oracle"] = "pass" if ok else "fail"
                if ok:
                    n_pass += 1
                else:
                    n_fail += 1
                    print(r.stdout.strip() or r.stderr.strip()[-500:])
            except subprocess.TimeoutExpired:
                entry["oracle"] = "timeout_quadratic_truth"
                n_timeout += 1
        if name in base and "sec" in entry and base[name] > 0:
            entry["x10_vs_sf01"] = round(entry["sec"] / base[name], 2)
        rows[name] = entry
        sys.stdout.write(f"{name}: {entry.get('oracle')} "
                         f"{entry.get('sec', '?')}s\n")
        sys.stdout.flush()

    # Superlinearity is judged against BOTH input and OUTPUT growth: the
    # sf1 replicator turns every doc into 10 near-duplicates, so the TRUE
    # pair sets of the similarity rows legitimately grow 300–970× (measured)
    # while input grows 10× — time tracking output there is the correct
    # sublinear behavior, not a cliff. With an sf0.1 dump (optional second
    # CLI arg) each row gets x10_rows = sf1/sf0.1 output rows, and a row is
    # superlinear only when its time ratio exceeds max(12, 1.05·x10_rows)
    # (the 12 = 10× input with 20% amortization tolerance). Without the
    # dump, the bare >10 time-ratio rule applies as before.
    sf01_dump = sys.argv[2] if len(sys.argv) > 2 else None
    if sf01_dump:
        import duckdb
        for n, e in rows.items():
            f1 = glob.glob(f"{dump_dir}/{n}/*.parquet")
            f0 = glob.glob(f"{sf01_dump}/{n}/*.parquet")
            if f1 and f0 and "x10_vs_sf01" in e:
                r1 = duckdb.sql(
                    f"SELECT count(*) FROM '{dump_dir}/{n}/*.parquet'").fetchone()[0]
                r0 = duckdb.sql(
                    f"SELECT count(*) FROM '{sf01_dump}/{n}/*.parquet'").fetchone()[0]
                e["x10_rows"] = round(r1 / max(r0, 1), 2)

    def is_superlinear(e):
        t = e.get("x10_vs_sf01", 0)
        if "x10_rows" in e:
            return t > max(12, 1.05 * e["x10_rows"])
        return t > 10

    superlinear = sorted(n for n, e in rows.items() if is_superlinear(e))
    art = {"sf1_verify": 1, "sf1_dir": sf_dir, "n": len(rows),
           "loadavg_before": load, "smoke_loadavg_before": smoke_load,
           "n_pass": n_pass, "n_fail": n_fail,
           "n_certificate_pass": n_cert,
           "n_timeout_quadratic_truth": n_timeout,
           "n_rows_only": n_rows_only,
           "superlinear_vs_sf01": superlinear, "queries": rows}
    with open("SF1_SMOKE.json", "w") as f:
        json.dump(art, f, indent=1)
    print(f"\nsf1 gate: {n_pass} pass, {n_cert} certificate-pass, "
          f"{n_fail} fail, {n_timeout} quadratic-truth timeouts, "
          f"{n_rows_only} rows-only; superlinear: {superlinear}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if sys.argv[1] == "--one":
        sys.exit(compare_one(sys.argv[2], sys.argv[3], sys.argv[4]))
    sys.exit(main(sys.argv[1]))
