#!/usr/bin/env python3
"""Gate a BENCH artifact before anyone compares it round-over-round.

A bench JSON that was recorded on a contended box (`contended: true`), was
cut short by the harness's internal deadline (`truncated: true`), or failed
to parse at all is NOT COMPARABLE to baseline history — two rounds of
garbage artifacts proved that silent comparison is worse than no number.
This check makes the verdict explicit:

    python3 tools/check_bench.py BENCH_r08.json [BASELINE.json]

Exit 0 and a per-query table when the artifact is clean; exit 1 with an
explicit "NOT COMPARABLE" reason otherwise. With a baseline file, clean
artifacts also get a total and per-query delta report (queries >2x their
baseline are listed).
"""
import json, sys


def load(path):
    try:
        raw = open(path).read()
    except OSError as e:
        return None, f"unreadable: {e}"
    # driver artifacts may wrap the JSON line with rc/log metadata
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
        for line in raw.splitlines():
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                try:
                    d = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        if d is None:
            return None, "no parseable bench JSON line"
    if isinstance(d, dict) and "parsed" in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    # driver artifacts carry the harness stdout in a "tail" string — dig the
    # bench line out of it ("[info] {"metric":...}")
    if isinstance(d, dict) and "queries" not in d and isinstance(d.get("tail"), str):
        for line in d["tail"].splitlines():
            line = line.strip()
            if line.startswith("[info] "):
                line = line[len("[info] "):]
            if line.startswith("{") and '"queries"' in line:
                try:
                    inner = json.loads(line)
                except json.JSONDecodeError:
                    continue
                inner.setdefault("rc", d.get("rc"))
                d = inner
                break
    # last resort: a SIGKILLed harness never printed the final JSON, but the
    # per-query lines it streamed to stderr survive in the captured tail —
    # reconstruct an explicitly-partial artifact from them
    if isinstance(d, dict) and "queries" not in d:
        text = d.get("tail") if isinstance(d.get("tail"), str) else raw
        qs = {}
        for line in (text or "").splitlines():
            line = line.strip()
            for pfx in ("[error] ", "[info] "):
                if line.startswith(pfx):
                    line = line[len(pfx):]
            if line.startswith("{") and '"bench_query"' in line:
                try:
                    q = json.loads(line)
                    qs[q["bench_query"]] = (q["min"], q.get("max", q["min"]))
                except (json.JSONDecodeError, KeyError):
                    continue
        if qs:
            d = {"queries": {k: v[0] for k, v in qs.items()},
                 "queries_max": {k: v[1] for k, v in qs.items()},
                 "truncated": True, "reconstructed_from_stderr": True,
                 "skipped": [], "wall": 0.0}
    if not isinstance(d, dict) or "queries" not in d or d.get("queries") is None:
        return None, "parsed but carries no queries map (rc-killed before flush?)"
    return d, None


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    d, err = load(sys.argv[1])
    if err:
        print(f"NOT COMPARABLE: {sys.argv[1]}: {err}")
        return 1
    reasons = []
    if d.get("contended"):
        reasons.append(
            f"contended box (loadavg_before={d.get('loadavg_before')}, "
            f"load_ratio={d.get('load_ratio')}, spread_ratio={d.get('spread_ratio')})")
    if d.get("truncated"):
        what = ("reconstructed from streamed stderr lines (harness killed "
                "before flush)" if d.get("reconstructed_from_stderr")
                else f"truncated run ({len(d.get('skipped', []))} queries skipped)")
        reasons.append(what)
    n = len(d["queries"])
    total = sum(d["queries"].values())
    if reasons:
        print(f"NOT COMPARABLE: {sys.argv[1]}: " + "; ".join(reasons))
        print(f"  partial data: {n} queries, sum-of-mins {total:.1f}s — "
              "re-run on a quiet box before comparing to baseline history")
        return 1
    print(f"OK: {sys.argv[1]}: {n} queries, sum-of-mins {total:.1f}s, "
          f"wall {d.get('wall', 0):.0f}s, contended=false, truncated=false")
    if len(sys.argv) > 2:
        b, berr = load(sys.argv[2])
        if berr:
            print(f"  baseline {sys.argv[2]}: {berr} — skipping delta report")
            return 0
        bq = b["queries"]
        common = sorted(set(d["queries"]) & set(bq))
        if common:
            btotal = sum(bq[q] for q in common)
            ntotal = sum(d["queries"][q] for q in common)
            print(f"  vs baseline over {len(common)} common queries: "
                  f"{ntotal:.1f}s / {btotal:.1f}s = {ntotal / btotal:.2f}x")
            slow = [(q, d["queries"][q], bq[q]) for q in common
                    if bq[q] > 0.05 and d["queries"][q] > 2 * bq[q]]
            for q, nv, bv in sorted(slow, key=lambda t: t[1] / t[2], reverse=True):
                print(f"  >2x: {q}: {nv:.2f}s vs {bv:.2f}s ({nv / bv:.1f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
