#!/usr/bin/env python3
"""Compare two bench JSON records with calibration normalization.

Usage: python3 scripts/bench_compare.py <old_bench.json> <new_bench.json>
       [--threshold 1.5]

Joins per-query seconds by query id, divides each by its run's
calibration probe (the measured host/session factor — see Bench.scala),
and reports queries whose NORMALIZED time moved by more than the
threshold factor, plus totals. Dev/judge tooling — the shipped library
never depends on this. Cross-round caution from DESIGN.md §5 applies:
±10% run-to-run noise is normal; single-query spikes need the in-run
"retimed" discriminator (cache-warm flags included since round 10)
before being read as regressions.
"""
import json
import sys
from signal import signal, SIGPIPE, SIG_DFL

signal(SIGPIPE, SIG_DFL)  # piping into head must not traceback


def load(path):
    with open(path) as f:
        d = json.load(f)
    # Driver round records (BENCH_r{N}.json) wrap the bench line under
    # "parsed"; unwrap so both record shapes compare.
    if "parsed" in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    cal = d.get("calibration") or 1.0
    return d, cal


def main(old_path, new_path, threshold):
    old, ocal = load(old_path)
    new, ncal = load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    # Record shapes vary by round: full names (bench.json), short qNN
    # ids, or bare digits at the coarsest stdout tier (whole seconds —
    # ratios are then coarse; prefer bench_runs/ records when possible).
    # Normalize to bare digits when full names don't overlap.
    if not (set(oq) & set(nq)) and oq and nq:
        def norm(qs):
            return {k.split("_")[0].lstrip("q"): v for k, v in qs.items()}
        oq, nq = norm(oq), norm(nq)
    common = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    print(f"old: total {old.get('value')}s cal {ocal}s "
          f"({len(oq)} queries)  [{old_path}]")
    print(f"new: total {new.get('value')}s cal {ncal}s "
          f"({len(nq)} queries)  [{new_path}]")
    print(f"common {len(common)}, retired {len(only_old)}, "
          f"added {len(only_new)}")
    if only_new:
        added = sum(nq[k] for k in only_new)
        print(f"added queries account for {added:.1f}s raw: "
              + ", ".join(f"{k}={nq[k]:.2f}" for k in only_new))
    moved = []
    for k in common:
        o, n = oq[k] / ocal, nq[k] / ncal
        if o <= 0:
            continue
        ratio = n / o
        if ratio >= threshold or ratio <= 1 / threshold:
            moved.append((ratio, k, oq[k], nq[k]))
    moved.sort(reverse=True)
    if moved:
        print(f"\nnormalized movement beyond {threshold}x "
              "(new/old after dividing by each run's calibration):")
        for ratio, k, o, n in moved:
            tag = "SLOWER" if ratio > 1 else "faster"
            print(f"  {tag} {ratio:5.2f}x  {k}: {o:.2f}s -> {n:.2f}s raw")
    else:
        print(f"\nno query moved beyond {threshold}x normalized")
    osum = sum(oq[k] for k in common)
    nsum = sum(nq[k] for k in common)
    print(f"\ncommon-query totals: {osum:.1f}s -> {nsum:.1f}s raw; "
          f"{osum / ocal:.1f} -> {nsum / ncal:.1f} calibration-units")


if __name__ == "__main__":
    thr = 1.5
    args = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--threshold" or a.startswith("--threshold="):
            try:
                thr = float(a.split("=", 1)[1]) if "=" in a else float(next(it))
            except (StopIteration, ValueError):
                print(__doc__)
                sys.exit(2)
        elif a.startswith("--"):
            pass
        else:
            args.append(a)
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    main(args[0], args[1], thr)
