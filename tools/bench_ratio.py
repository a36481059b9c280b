"""Per-query scale ratios between two bench runs (round-11 item 3:
make sf1 a standing bench tier). Reads two bench JSON records (the
one-line contract bench.py prints / the diag files it writes) and
reports per-query big/small ratios, flagging anything super-linear
beyond the data growth factor.

Usage: python tools/bench_ratio.py small.json big.json [growth=10]
Prints one JSON line: {growth, flagged: {q: ratio}, ratios: {...}}.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    growth = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    ratios = {}
    for q, t_small in small["queries"].items():
        t_big = big["queries"].get(q)
        if t_big is None or t_small <= 0:
            continue
        ratios[q] = round(t_big / t_small, 2)
    # pinned-k compat entries are super-linear BY DESIGN (frozen k=4
    # blocker; see bench.py BY_DESIGN_QUADRATIC) — report them apart so
    # flagged_super_linear only ever names genuine regressions
    by_design = set(
        big.get("by_design_quadratic") or small.get("by_design_quadratic") or ()
    )
    flagged = {
        q: r
        for q, r in sorted(ratios.items())
        if r > growth and q not in by_design
    }
    compat = {
        q: r for q, r in sorted(ratios.items())
        if q in by_design and r > growth
    }
    out = {
        "small_sf": small.get("sf"),
        "big_sf": big.get("sf"),
        "growth": growth,
        "total_ratio": round(big["value"] / small["value"], 2),
        "calibration": {
            "small": small.get("calibration"),
            "big": big.get("calibration"),
        },
        "flagged_super_linear": flagged,
        "compat_quadratic": compat,
        "worst": max(ratios.items(), key=lambda kv: kv[1]) if ratios else None,
        "ratios": dict(sorted(ratios.items(), key=lambda kv: -kv[1])),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
