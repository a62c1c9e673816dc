#!/usr/bin/env python3
"""Bench trend guard (NOT part of the library): compare a fresh bench
line against a previous snapshot's per-query timings and fail loudly on
regressions — the check that would have caught round 11's q135 (9.5s in
the gate vs 2.0s fresh-JVM) before commit.

Usage: python3 tools/benchtrend.py <new.json> <old.json> [ratio=1.5]

A query counts as regressed when it is BOTH `ratio`× slower and >0.3s
absolutely slower (tiny queries jitter multiplicatively). Exit 1 on any
regression. Improvements print informationally. Queries present on only
one side (added/retired) are listed, never failed on.

ROUND-CLOSE GATE (blocking): before the final bench-snapshot commit of
a round, run this against the PREVIOUS ROUND's driver snapshot —
`bench_r{N-1}_driver.json` (a copy of the bench_last.json the driver
committed with the round-N-1 verdict), NEVER a mid-round snapshot: a
mid-round baseline already contains the round's own regressions and
masks them (round 18 shipped a 10.4× collocations regression that this
tool catches in one command when pointed at the right baseline). A
non-empty regression list blocks the commit: triage each row with a
fresh-JVM `runMain graft.QBench <names>` (driver-host contention
inflates driver numbers — fresh-JVM is the truth), fix real ones, and
record the triage in the bench snapshot commit message.
"""
import json
import sys


def load(path):
    """Accepts either a raw Bench line ({"queries": ...}) or a driver
    round snapshot BENCH_r{N}.json ({"parsed": {"queries": ...}})."""
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return {q: t for q, t in (d.get("queries") or {}).items() if t and t > 0}


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    new, old = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    bad, gained = [], []
    for q in sorted(new.keys() & old.keys()):
        o, n = old[q], new[q]
        if n > o * ratio and n - o > 0.3:
            bad.append((q, o, n))
        elif o > n * ratio and o - n > 0.3:
            gained.append((q, o, n))
    for q, o, n in bad:
        print(f"REGRESSION {q}: {o:.2f}s -> {n:.2f}s ({n / o:.1f}x)")
    for q, o, n in gained:
        print(f"improved   {q}: {o:.2f}s -> {n:.2f}s")
    added = sorted(new.keys() - old.keys())
    gone = sorted(old.keys() - new.keys())
    if added:
        print(f"new queries: {', '.join(added)}")
    if gone:
        print(f"missing queries (retired or FAILED): {', '.join(gone)}")
    tn, to = sum(new.values()), sum(old[q] for q in new.keys() & old.keys())
    print(f"== {len(bad)} regressions; common-query total "
          f"{to:.1f}s -> {sum(new[q] for q in new.keys() & old.keys()):.1f}s; "
          f"grand total {tn:.1f}s ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
