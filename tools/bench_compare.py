#!/usr/bin/env python3
"""Compare two bench rows from BENCH_FULL.jsonl (or BENCH_r*.json) on
their shared keys — the round regression sweep.

Usage:
    python3 tools/bench_compare.py <baseline.json|jsonl:N> <candidate.json|jsonl:N>

A `jsonl:N` spec means line N (1-based; negative = from the end) of
BENCH_FULL.jsonl. Rows with a "cold" map are warm-sampled (round 9+):
the comparison uses `queries` (warm) on both sides and prints the cold
column beside any flagged key for context. Flags keys at >1.3x and
>0.5s absolute — the same rule SCALE.md's regression notes use — and
prints shared-key totals.
"""
import json
import sys


def load(spec):
    if spec.startswith("jsonl:"):
        n = int(spec.split(":", 1)[1])
        with open("BENCH_FULL.jsonl") as f:
            lines = [json.loads(x) for x in f]
        return lines[n - 1] if n > 0 else lines[n]
    return json.load(open(spec))


def main():
    base, cand = load(sys.argv[1]), load(sys.argv[2])
    bq, cq = base["queries"], cand["queries"]
    shared = sorted(set(bq) & set(cq))
    only_b, only_c = sorted(set(bq) - set(cq)), sorted(set(cq) - set(bq))
    tb = sum(bq[k] for k in shared)
    tc = sum(cq[k] for k in shared)
    print(f"shared keys: {len(shared)}  baseline {tb:.1f}s -> candidate {tc:.1f}s "
          f"= {tc / tb:.2f}x")
    if only_b:
        print(f"only in baseline ({len(only_b)}): {', '.join(only_b[:10])}"
              + (" ..." if len(only_b) > 10 else ""))
    if only_c:
        tnew = sum(cq[k] for k in only_c)
        print(f"new keys ({len(only_c)}, {tnew:.1f}s total): "
              + ", ".join(f"{k}={cq[k]:.2f}" for k in only_c))
    flagged = [(k, bq[k], cq[k]) for k in shared
               if cq[k] > 1.3 * bq[k] and cq[k] - bq[k] > 0.5]
    flagged.sort(key=lambda t: t[1] - t[2])
    for k, b, c in flagged:
        cold = cand.get("cold", {}).get(k)
        extra = f"  (cold={cold:.2f})" if cold is not None else ""
        print(f"  REGRESSED {k}: {b:.2f} -> {c:.2f} ({c / b:.1f}x){extra}")
    if not flagged:
        print("no key trips the 1.3x-and->0.5s rule")


if __name__ == "__main__":
    main()
