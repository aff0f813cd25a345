#!/usr/bin/env python3
"""Cross-run bench diff on NOISE-FLOOR numbers.

Usage: python3 tools/benchdiff.py <old_bench.json> <new_bench.json> [threshold_sec]

Compares per-query minima (`queries_min`, round 13+) when both files
carry them, falling back to the median `queries` map otherwise — the
r12 verdict's point: this box's same-code totals drift 33%, and medians
of interleaved repeats still absorb sustained drift, so regressions
should be called on min-of-repeats. Prints queries whose best-case time
moved more than `threshold_sec` (default 1.0) in either direction, plus
added/removed queries.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # the driver's BENCH_r{N}.json wraps the compact line under "parsed";
    # the compact line itself has no per-query map, so point such callers
    # at the committed BENCH_OUT.json instead — but unwrap what we can
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    qs = d.get("queries_min") or d.get("queries") or {}
    kind = "min" if "queries_min" in d else "median"
    return qs, kind, d


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old, okind, od = load(sys.argv[1])
    new, nkind, nd = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    if okind != nkind:
        print(f"note: comparing {okind} (old) vs {nkind} (new) — "
              "mixed basis, treat deltas as indicative only")
    both = sorted(set(old) & set(new))
    moved = [(n, old[n], new[n], new[n] - old[n]) for n in both
             if abs(new[n] - old[n]) > thr]
    moved.sort(key=lambda t: t[3])
    print(f"basis={nkind}  common={len(both)}  "
          f"added={sorted(set(new) - set(old))}  "
          f"removed={sorted(set(old) - set(new))}")
    print(f"old total={od.get('value')}s/{od.get('n_ok')}q  "
          f"new total={nd.get('value')}s/{nd.get('n_ok')}q")
    if not moved:
        print(f"no query moved more than {thr}s on the {nkind} basis")
    for n, a, b, d in moved:
        print(f"{'REGRESSED' if d > 0 else 'improved '} {n}: "
              f"{a:.2f} -> {b:.2f} ({d:+.2f}s)")


if __name__ == "__main__":
    main()
