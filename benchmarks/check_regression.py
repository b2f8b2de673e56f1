"""Benchmark regression gate: diff a fresh results.json against committed.

Benchmark governance (VERDICT r2): throughput claims drifted across
refreshes (brusselator_2d_pallas 144k -> 59k steps/s) with nobody
checking. This script makes a silent drift impossible: it compares every
shared throughput/accuracy metric between a fresh run and the committed
`benchmarks/results.json` (from git HEAD by default) and fails loudly on
regressions beyond tolerance.

Throughput metrics (`*_per_sec`) regress when the fresh value is below
``(1 - tol)`` of the committed one (default tol 0.30 — the remote-TPU
tunnel plus chip contention produce real 10-20% swings; CLAUDE.md warns
contended timings can be arbitrarily wrong, so a >30% drop either means
contention — rerun on a quiet chip — or a genuine regression to fix).
Accuracy metrics (`max_error`) regress when they grow by more than 2x.
Improvements are reported, never fatal.

Usage:
    python benchmarks/check_regression.py fresh.json            # vs git HEAD
    python benchmarks/check_regression.py fresh.json old.json   # explicit
    python benchmarks/run_all.py   # calls compare() automatically at the end
"""

import json
import subprocess
import sys

TOL_THROUGHPUT = 0.30
TOL_ERROR_GROWTH = 2.0

_THROUGHPUT_SUFFIXES = ("_per_sec",)
_ERROR_KEYS = ("max_error",)


def _committed_results(path="benchmarks/results.json", rev="HEAD"):
    try:
        blob = subprocess.run(
            ["git", "show", f"{rev}:{path}"],
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(blob)
    except (subprocess.CalledProcessError, json.JSONDecodeError):
        return None


def defined_entries(run_all_path=None):
    """Every results key `benchmarks/run_all.py` can produce, parsed from
    its source (``results["<key>"] = ...`` assignments).

    The round-3 governance hole: run_all.py grew new entries whose
    numbers were quoted in ROADMAP/README while the committed
    results.json predated them — `compare` only flagged keys missing
    *from the fresh run*, so a stale committed artifact passed silently.
    This closes it from the other side."""
    import os
    import re

    if run_all_path is None:
        run_all_path = os.path.join(os.path.dirname(__file__), "run_all.py")
    src = open(run_all_path).read()
    return sorted(set(re.findall(r'results\[\s*"([^"]+)"\s*\]', src)))


def coverage_gaps(results, run_all_path=None):
    """Entries run_all.py defines that are absent from ``results``."""
    return [k for k in defined_entries(run_all_path) if k not in results]


def compare(fresh, committed, tol=TOL_THROUGHPUT):
    """Return (regressions, notes): lists of human-readable strings."""
    regressions, notes = [], []
    for entry, new in fresh.items():
        old = committed.get(entry)
        if not isinstance(old, dict) or not isinstance(new, dict):
            continue
        for key, nv in new.items():
            ov = old.get(key)
            if not isinstance(ov, (int, float)) or not isinstance(
                nv, (int, float)
            ) or isinstance(ov, bool) or ov == 0:
                continue
            if any(key.endswith(s) for s in _THROUGHPUT_SUFFIXES):
                ratio = nv / ov
                if ratio < 1.0 - tol:
                    regressions.append(
                        f"{entry}.{key}: {ov:.4g} -> {nv:.4g} "
                        f"({ratio:.2f}x, tol {1 - tol:.2f}x)"
                    )
                elif ratio > 1.0 + tol:
                    notes.append(
                        f"{entry}.{key}: improved {ov:.4g} -> {nv:.4g} "
                        f"({ratio:.2f}x)"
                    )
            elif key in _ERROR_KEYS:
                if nv > ov * TOL_ERROR_GROWTH and nv > 1e-12:
                    regressions.append(
                        f"{entry}.{key}: error grew {ov:.3g} -> {nv:.3g}"
                    )
    for entry in committed:
        if entry not in fresh:
            notes.append(f"{entry}: present in committed, missing in fresh run")
    return regressions, notes


def report(fresh, committed=None, tol=TOL_THROUGHPUT):
    """Print the comparison; return True iff no regressions."""
    if committed is None:
        committed = _committed_results()
    if committed is None:
        print("[check_regression] no committed results.json to compare against")
        return True
    regressions, notes = compare(fresh, committed, tol=tol)
    # completeness gate, BOTH directions: every entry run_all.py defines
    # must be present in the fresh run AND in the committed artifact —
    # a missing fresh key is a broken benchmark, a missing committed key
    # is a stale artifact whose numbers must not be quoted anywhere.
    for k in coverage_gaps(fresh):
        regressions.append(
            f"{k}: defined by run_all.py but MISSING from the fresh run"
        )
    for k in coverage_gaps(committed):
        regressions.append(
            f"{k}: defined by run_all.py but MISSING from the committed "
            f"results.json (stale artifact — refresh and commit)"
        )
    for n in notes:
        print(f"[check_regression] note: {n}")
    if regressions:
        print(f"[check_regression] {len(regressions)} REGRESSION(S):")
        for r in regressions:
            print(f"  REGRESSION {r}")
        print(
            "[check_regression] a >%.0f%% throughput drop means chip "
            "contention (rerun on a quiet chip) or a real regression — "
            "do not commit without resolving which." % (tol * 100)
        )
        return False
    print("[check_regression] OK — no regressions vs committed results")
    return True


def main(argv):
    if len(argv) > 1 and argv[1] == "--coverage":
        # stand-alone completeness check of the committed artifact
        results = json.load(open("benchmarks/results.json"))
        gaps = coverage_gaps(results)
        for k in gaps:
            print(f"[check_regression] MISSING from results.json: {k}")
        if not gaps:
            print("[check_regression] results.json covers every "
                  "run_all.py-defined entry")
        return 0 if not gaps else 1
    fresh = json.load(open(argv[1]))
    committed = json.load(open(argv[2])) if len(argv) > 2 else None
    ok = report(fresh, committed)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
