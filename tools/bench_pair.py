#!/usr/bin/env python3
"""Merge two graft.Bench sidecars into the round's min-of-two PAIR and
compare it against a previous round's pair — the bench-pair discipline
(BENCH_NOTES_r14+) as a tool instead of ad-hoc REPL snippets.

Usage:
  python3 tools/bench_pair.py bench_detail_rN.json bench_detail_rNb.json \
      [prev_pair_or_detail.json] [--out pair_rN.json]

Prints: pair total / line count / query-only split, the shared-line delta vs
the previous round, every regression over the 1.3x-and-0.5s band, and the
new/removed lines. Writes the merged pair (same schema as bench_detail) to
--out when given.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    argv = sys.argv[1:]
    args, out, i = [], None, 0
    while i < len(argv):
        if argv[i] == "--out":
            out = argv[i + 1]
            i += 2  # skip the flag's value so it never lands in positionals
        elif argv[i].startswith("--"):
            i += 1
        else:
            args.append(argv[i])
            i += 1
    a, b = load(args[0]), load(args[1])
    if set(a) != set(b):
        print(f"WARN: sidecar line sets differ ({len(a)} vs {len(b)}); pairing the union")
    pair = {q: min(a.get(q, float("inf")), b.get(q, float("inf"))) for q in set(a) | set(b)}
    total = sum(pair.values())
    qonly = sum(v for q, v in pair.items() if not q.startswith("_sub_"))
    nsub = sum(1 for q in pair if q.startswith("_sub_"))
    print(f"pair: {total:.1f}s / {len(pair)} lines "
          f"({len(pair) - nsub} queries {qonly:.1f}s + {nsub} substrates {total - qonly:.1f}s)")
    if len(args) > 2:
        prev = load(args[2])
        shared = set(prev) & set(pair)
        tp, tn = sum(prev[q] for q in shared), sum(pair[q] for q in shared)
        print(f"shared {len(shared)}: prev {tp:.1f}s -> now {tn:.1f}s ({(tn / tp - 1) * 100:+.1f}%)")
        reg = sorted(((q, prev[q], pair[q]) for q in shared
                      if pair[q] > max(prev[q] * 1.3, prev[q] + 0.5)),
                     key=lambda x: x[1] - x[2])
        print(f"regressions over the 1.3x-and-0.5s band: {len(reg)}")
        for q, p, n in reg:
            print(f"  {q}: {p:.2f} -> {n:.2f}")
        new = sorted(set(pair) - set(prev))
        gone = sorted(set(prev) - set(pair))
        if new:
            print("new lines:", {q: round(pair[q], 2) for q in new})
        if gone:
            print("removed lines:", gone)
    if out:
        with open(out, "w") as f:
            json.dump({"metric": "pair_total", "value": round(total, 3), "unit": "sec",
                       "queries": {q: round(v, 3) for q, v in sorted(pair.items())}}, f)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
