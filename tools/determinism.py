#!/usr/bin/env python3
"""Diff two graft.Determinism fingerprint dumps into a gate verdict.

Usage: python3 tools/determinism.py <passA.json> <passB.json> <out.json>

PASS iff every rows-only query fingerprint is bit-identical between the
two layouts AND the planted nondeterministic probe (__nondet_probe)
MISMATCHES — a probe that agrees means the two passes did not actually
differ in layout, making the per-query matches vacuous.
"""
import json, sys

PROBE = "__nondet_probe"

def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    names = sorted((set(a) | set(b)) - {PROBE})
    mismatches, errors = [], []
    n_match = 0
    for n in names:
        ra, rb = a.get(n), b.get(n)
        if ra is None or rb is None or ra.get("error") or rb.get("error"):
            errors.append(n)
        elif ra == rb:
            n_match += 1
        else:
            mismatches.append({"name": n, "a": ra, "b": rb})
    probe_a, probe_b = a.get(PROBE), b.get(PROBE)
    probe_tripped = (probe_a is not None and probe_b is not None
                     and probe_a != probe_b)
    ok = not mismatches and not errors and probe_tripped
    out = {
        "pass": ok,
        "n_queries": len(names),
        "n_match": n_match,
        "mismatches": mismatches,
        "errors": errors,
        "probe_tripped": probe_tripped,
    }
    json.dump(out, open(sys.argv[3], "w"), indent=1)
    print(f"determinism gate: {'PASS' if ok else 'FAIL'} "
          f"({n_match}/{len(names)} match, probe_tripped={probe_tripped}, "
          f"errors={errors or 'none'})")
    for m in mismatches:
        print(f"  MISMATCH {m['name']}: {m['a']} vs {m['b']}")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
