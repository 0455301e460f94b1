#!/usr/bin/env python3
"""Round-over-round bench comparison, computed — never hand-written
(VERDICT r5 "Next round" #2).

Usage:  python tools_bench_compare.py BENCH_r05.json BENCH_r06.json [--thr 0.3]

Reads two bench JSON records (the driver's BENCH_rN.json or bench.py's
printed line saved to a file), restricts to the COMMON query set, and
prints a machine-made report: common-query totals, the ratio, slots
added/removed, and every per-query delta beyond the threshold (default
±30%, below which sub-second slots are load noise — adjudicated in
VERDICT r5). Exit code is always 0; this is a reporting tool, not a
gate.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics


def _from_raw_log(path: str, why: str,
                  named: str | None) -> tuple[dict[str, float], dict]:
    """Fall back to a committed bench_logs/raw-*.json when a driver
    BENCH_rN.json tail is truncated (VERDICT r6 #1). The record's OWN
    ``raw_log`` filename (the tail keeps the END of stdout, so it
    survives truncation) pairs the right log with the right round —
    only when that is absent does the newest log apply, with a loud
    note, so an old round's record is never silently backfilled with a
    newer round's data. The raw log carries every per-query run;
    medians recompute the same way bench.py does."""
    base = os.path.dirname(os.path.abspath(path))
    pick = None
    if named:
        cand = os.path.join(base, named)
        if os.path.exists(cand):
            pick = cand
    if pick is None:
        logs = sorted(glob.glob(os.path.join(base, "bench_logs",
                                             "raw-*.json")))
        if not logs:
            raise SystemExit(f"{path}: {why}, and no bench_logs/raw-*.json "
                             "fallback found")
        pick = logs[-1]
        print(f"WARNING: {path}: {why}; record names no recoverable "
              f"raw_log — using NEWEST {pick}, which may belong to a "
              "different round")
    else:
        print(f"note: {path}: {why}; using the record's own raw log {pick}")
    with open(pick) as fh:
        raw = json.load(fh)
    queries = {n: round(statistics.median(t), 3)
               for n, t in raw["per_query_runs"].items()}
    rec = {"queries": queries, "runs": raw.get("pass_totals"),
           "loadavg": raw.get("loadavg_after"),
           "calibration": raw.get("calibration"),
           "protocol": f"median-of-{raw.get('n_runs')} "
                       f"(recomputed from {os.path.basename(pick)})"}
    return queries, rec


def load(path: str) -> tuple[dict[str, float], dict]:
    import re

    with open(path) as fh:
        rec = json.load(fh)
    if "per_query_runs" in rec:
        # a bench_logs/raw-*.json passed directly: recompute the
        # per-query medians exactly as bench.py does
        queries = {n: round(statistics.median(t), 3)
                   for n, t in rec["per_query_runs"].items()}
        return queries, {"queries": queries,
                         "runs": rec.get("pass_totals"),
                         "loadavg": rec.get("loadavg_after"),
                         "calibration": rec.get("calibration"),
                         "protocol": f"median-of-{rec.get('n_runs')} "
                                     f"(raw log given directly)"}
    if "queries" not in rec and "tail" in rec:
        # the driver's BENCH_rN.json wraps bench.py stdout in a
        # 2000-char "tail" — pull the last {"metric": ...} line out of
        # it; once the registry grew past ~60 benched queries the line
        # no longer fits, so fall back to the committed raw log the
        # record itself names
        tail = rec["tail"]
        named = None
        m = re.search(r'"raw_log":\s*"([^"]+)"', tail)
        if m:
            named = m.group(1)
        start = tail.rfind('{"metric"')
        if start < 0:
            return _from_raw_log(path, "no bench JSON line in 'tail'",
                                 named)
        try:
            rec, _ = json.JSONDecoder().raw_decode(tail[start:])
        except json.JSONDecodeError:
            return _from_raw_log(path, "bench JSON line truncated by "
                                       "the 2000-char tail", named)
    return dict(rec["queries"]), rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--thr", type=float, default=0.3,
                    help="report per-query deltas beyond this fraction")
    args = ap.parse_args()

    qa, ra = load(args.old)
    qb, rb = load(args.new)
    common = sorted(set(qa) & set(qb))
    added = sorted(set(qb) - set(qa))
    removed = sorted(set(qa) - set(qb))

    ta = sum(qa[n] for n in common)
    tb = sum(qb[n] for n in common)
    print(f"common queries : {len(common)}")
    print(f"old total      : {ta:8.2f}s  ({args.old},"
          f" protocol={ra.get('protocol', 'single-run')})")
    print(f"new total      : {tb:8.2f}s  ({args.new},"
          f" protocol={rb.get('protocol', 'single-run')})")
    print(f"ratio new/old  : {tb / ta:8.3f}x" if ta else "ratio: n/a")
    # box-speed witness (VERDICT r10 #2): fixed-work calibration timed at
    # each bench's start — a query ratio tracking the calibration ratio
    # is host drift, not a plan change (bench_logs/R11_BENCH_REPORT.md)
    ca, cb = ra.get("calibration"), rb.get("calibration")
    if ca and cb:
        parts = []
        for key in ("python_s", "spark_1core_s"):
            if ca.get(key) and cb.get(key):
                parts.append(f"{key} {ca[key]:.2f}s -> {cb[key]:.2f}s "
                             f"({cb[key] / ca[key]:.2f}x)")
        if parts:
            print(f"calibration    : {'; '.join(parts)}")
    elif cb:
        print(f"calibration    : new-side only {cb} (old record predates "
              f"the r11 calibration field)")
    if rb.get("runs"):
        print(f"new pass totals: {rb['runs']} (loadavg {rb.get('loadavg')})")
    if added:
        print(f"added slots    : {', '.join(added)}"
              f"  (+{sum(qb[n] for n in added):.2f}s, outside the ratio)")
    if removed:
        print(f"removed slots  : {', '.join(removed)}")

    moved = [(n, qa[n], qb[n]) for n in common
             if max(qa[n], qb[n]) > 0
             and abs(qb[n] - qa[n]) / max(qa[n], 0.001) > args.thr
             and abs(qb[n] - qa[n]) > 0.05]
    if moved:
        print(f"\nper-query deltas beyond ±{args.thr:.0%} (and >50ms):")
        for n, a, b in sorted(moved, key=lambda t: -(abs(t[2] - t[1]))):
            print(f"  {n:32s} {a:7.2f}s -> {b:7.2f}s  ({b / max(a, 0.001):5.2f}x)")
    else:
        print(f"\nno per-query delta beyond ±{args.thr:.0%}")


if __name__ == "__main__":
    main()
