#!/usr/bin/env python3
"""Compare a bench_detail.json from a larger scale point against the sf0.1
run, row-scaled (dev-only tool, driver-side python stack).

Usage:
  python3 tools/bench_scale_compare.py <detail_sf01.json> <detail_sfN.json> <scale> <out.json>

Writes <out.json> with per-query {t_small, t_big, ratio, bar, ok} where
bar = 2 * scale (the "within 2x at the same scale factor" bar applied at
linear row growth) and a summary line. Queries over fixed-size inputs
(nation/region harness graphs) are expected to come back ~flat — the bar
is one-sided, only growth beyond 2x-linear fails.
"""
import json
import sys


def main() -> int:
    small_p, big_p, scale_s, out_p = sys.argv[1:5]
    scale = float(scale_s)
    small = json.load(open(small_p))["queries"]
    big = json.load(open(big_p))["queries"]
    bar = 2.0 * scale
    rows = {}
    worst = (None, 0.0)
    for q, t_small in sorted(small.items()):
        if q not in big:
            continue
        t_big = big[q]
        ratio = t_big / t_small if t_small > 0 else float("inf")
        ok = ratio <= bar
        rows[q] = {
            "t_small": round(t_small, 3),
            "t_big": round(t_big, 3),
            "ratio": round(ratio, 2),
            "ok": ok,
        }
        if ratio > worst[1]:
            worst = (q, ratio)
    n_fail = sum(1 for r in rows.values() if not r["ok"])
    out = {
        "scale": scale,
        "bar": bar,
        "n_queries": len(rows),
        "n_over_bar": n_fail,
        "worst": {"query": worst[0], "ratio": round(worst[1], 2)},
        "total_small": round(sum(r["t_small"] for r in rows.values()), 1),
        "total_big": round(sum(r["t_big"] for r in rows.values()), 1),
        "queries": rows,
    }
    json.dump(out, open(out_p, "w"), indent=1)
    print(
        f"{len(rows)} queries, {n_fail} over the {bar:.0f}x bar; "
        f"worst {worst[0]} at {worst[1]:.2f}x; "
        f"totals {out['total_small']}s -> {out['total_big']}s"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
