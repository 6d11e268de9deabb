#!/usr/bin/env python3
"""Gate a BENCH artifact before anyone compares it round-over-round.

A bench JSON that was recorded on a contended box (`contended: true`), was
cut short by the harness's internal deadline (`truncated: true`), carries
FAILED queries, or failed to parse at all is NOT COMPARABLE to baseline
history — two rounds of garbage artifacts proved that silent comparison is
worse than no number. This check makes the verdict explicit:

    python3 tools/check_bench.py BENCH_r09.json [BASELINE.json]

Exit 0 and a per-query table when the artifact is clean; exit 1 with an
explicit "NOT COMPARABLE" reason otherwise. With a baseline file, clean
artifacts also get a total and per-query delta report (queries >2x their
baseline are listed).

Artifact shapes accepted, most- to least-complete:
  1. the harness's full JSON line (`"metric":"total"` with a `queries` map);
  2. the compact `"bench_summary"` line the harness prints SECOND — the full
     line is ~6 KB and driver artifacts keep only the last 2,000 chars of
     output, which beheads it (five rounds of artifacts died this way); the
     summary is <500 bytes and printed last, so it survives any sane tail
     window. Per-query detail is then reconstructed from the streamed
     `bench_query` stderr lines when they are present;
  3. streamed `bench_query` lines alone (harness SIGKILLed before flush) —
     explicitly partial.
"""
import json, sys


def _iter_lines(raw):
    """Yield candidate JSON payload lines, stripping sbt log prefixes."""
    for line in raw.splitlines():
        line = line.strip()
        for pfx in ("[error] ", "[info] "):
            if line.startswith(pfx):
                line = line[len(pfx):]
        if line.startswith("{"):
            yield line


def _scan_queries(text):
    """Reconstruct (queries, queries_max, failed) from streamed bench_query
    lines."""
    qs, qmax, failed = {}, {}, {}
    for line in _iter_lines(text or ""):
        if '"bench_query"' not in line:
            continue
        try:
            q = json.loads(line)
        except json.JSONDecodeError:
            continue
        name = q.get("bench_query")
        if name is None:
            continue
        if "failed" in q:
            failed[name] = q["failed"]
        elif "min" in q:
            qs[name] = q["min"]
            qmax[name] = q.get("max", q["min"])
    return qs, qmax, failed


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
        for line in _iter_lines(raw):
            if '"queries"' in line and '"bench_query"' not in line:
                try:
                    d = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        if d is None:
            d = {}
    if isinstance(d, dict) and "parsed" in d and isinstance(d.get("parsed"), dict):
        inner = d["parsed"]
        inner.setdefault("tail", d.get("tail"))
        d = inner
    text = d.get("tail") if isinstance(d.get("tail"), str) else raw
    # dig the full bench line out of a driver tail ("[info] {"metric":...}")
    if isinstance(d, dict) and "queries" not in d:
        for line in _iter_lines(text or ""):
            if '"queries"' in line and '"bench_query"' not in line:
                try:
                    inner = json.loads(line)
                except json.JSONDecodeError:
                    continue
                d = inner
                break
    # the compact second line: totals + flags survive a beheaded full line
    if isinstance(d, dict) and "queries" not in d:
        for line in _iter_lines(text or ""):
            if '"bench_summary"' in line:
                try:
                    summ = json.loads(line)
                except json.JSONDecodeError:
                    continue
                qs, qmax, failed = _scan_queries(text)
                d = dict(summ)
                d["summary_only"] = True
                d["queries"] = qs  # may be empty; totals come from the summary
                d["queries_max"] = qmax
                d.setdefault("failed", {})
                if isinstance(d["failed"], list):
                    d["failed"] = {k: "?" for k in d["failed"]}
                d["failed"].update(failed)
                break
    # last resort: a SIGKILLed harness never printed ANY final line, but the
    # per-query lines it streamed to stderr survive in the captured tail
    if isinstance(d, dict) and "queries" not in d:
        qs, qmax, failed = _scan_queries(text)
        if qs:
            d = {"queries": qs, "queries_max": qmax, "failed": failed,
                 "truncated": True, "reconstructed_from_stderr": True,
                 "skipped": [], "wall": 0.0}
    if not isinstance(d, dict) or "queries" not in d or d.get("queries") is None:
        return None, "parsed but carries no queries map or summary line (rc-killed before flush?)"
    return d, None


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    d, err = load(sys.argv[1])
    if err:
        print(f"NOT COMPARABLE: {sys.argv[1]}: {err}")
        return 1
    failed = d.get("failed") or {}
    if isinstance(failed, list):
        failed = {k: "?" for k in failed}
    n_failed = d.get("n_failed", len(failed))
    reasons = []
    if d.get("contended"):
        reasons.append(
            f"contended box (loadavg_before={d.get('loadavg_before')}, "
            f"load_ratio={d.get('load_ratio')}, spread_ratio={d.get('spread_ratio')})")
    if d.get("truncated"):
        what = ("reconstructed from streamed stderr lines (harness killed "
                "before flush)" if d.get("reconstructed_from_stderr")
                else f"truncated run ({len(d.get('skipped', [])) or d.get('n_skipped', 0)} queries skipped)")
        reasons.append(what)
    if n_failed:
        names = sorted(failed) if failed else []
        reasons.append(f"{n_failed} queries FAILED"
                       + (f": {', '.join(names[:12])}" if names else ""))
    n = len(d["queries"]) or d.get("n", 0)
    total = sum(d["queries"].values()) if d["queries"] else d.get("total", 0.0)
    if reasons:
        print(f"NOT COMPARABLE: {sys.argv[1]}: " + "; ".join(reasons))
        print(f"  partial data: {n} queries, sum-of-mins {total:.1f}s — "
              "re-run on a quiet box / fix failures before comparing to baseline history")
        return 1
    src = " (from compact summary line)" if d.get("summary_only") else ""
    print(f"OK: {sys.argv[1]}{src}: {n} queries, sum-of-mins {total:.1f}s, "
          f"wall {d.get('wall', 0):.0f}s, contended=false, truncated=false, failed=0")
    # Per-query load guard (round-9 verdict #1): a min whose repeat spread
    # exceeded 2.5x and never settled is load-suspect — the harness re-ran
    # exactly those before flushing and records the survivors in
    # `load_suspect`; older artifacts without the field fall back to the
    # max/min spread heuristic. Suspects stay in the artifact (an honest
    # partial beats a dropped row) but a comparer must discount them rather
    # than read a phantom regression.
    suspects = d.get("load_suspect")
    if suspects is None and d.get("queries_max"):
        qmax = d["queries_max"]
        suspects = [q for q, mn in d["queries"].items()
                    if mn > 0.05 and qmax.get(q, mn) > 2.5 * mn]
    for q in sorted(suspects or []):
        mx = (d.get("queries_max") or {}).get(q)
        print(f"  LOAD-SUSPECT {q}: min {d['queries'].get(q, float('nan')):.2f}s"
              + (f", max {mx:.2f}s" if mx else "")
              + " — unsettled under repeat; discount in round-over-round compares")
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
