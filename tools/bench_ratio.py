"""Per-query scale ratios between two bench runs (round-11 item 3:
make sf1 a standing bench tier). Reads two bench JSON records (the
one-line contract bench.py prints / the diag files it writes) and
reports per-query big/small ratios, flagging anything super-linear
beyond the data growth factor.

Usage: python tools/bench_ratio.py small.json big.json [growth=10]
Prints one JSON line: {growth, flagged: {q: ratio}, ratios: {...}}.

FULL-REGISTRY mode (VERDICT r15 item 4): pass the correctness-run
logs instead — ORACLE_SF01_r{N}.txt (check_oracle at sf0.1) as small
and SF1_r{N}.txt (sf1_check) as big. Both logs carry a SPARK-ONLY
first-execution wall per query, so every registered query — not just
the ~52 bench headliners — gets a scale ratio. Single-execution walls
are noisier than bench medians (no warmup, no median-of-reps), so the
advisory flag threshold is 4x rather than the growth factor; entries
in bench.py's BY_DESIGN_QUADRATIC report under compat_quadratic as in
the bench mode.

Usage: python tools/bench_ratio.py ORACLE_SF01_rN.txt SF1_rN.txt [flag=4]
"""

from __future__ import annotations

import json
import os
import re
import sys

_LOG_LINE = re.compile(
    r"^ok\*?\s+(\S+): (?:rows-only check, )?\d+ rows \((\d+\.\d+)s\)"
)


def _parse_correctness_log(path: str) -> dict[str, float]:
    walls: dict[str, float] = {}
    with open(path) as fh:
        for line in fh:
            m = _LOG_LINE.match(line.strip())
            if m:
                walls[m.group(1)] = float(m.group(2))
    if not walls:
        raise SystemExit(f"{path}: no 'ok <query>: N rows (Ts)' lines")
    return walls


def _main_correctness() -> None:
    small = _parse_correctness_log(sys.argv[1])
    big = _parse_correctness_log(sys.argv[2])
    flag_at = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    # anchor the bench import to the repo root (this script's parent)
    # so invocation from any cwd resolves the same module (r15 advice)
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import BY_DESIGN_QUADRATIC

    by_design = set(BY_DESIGN_QUADRATIC)
    ratios, floored = {}, []
    # queries present only in the big-tier log can never get a ratio —
    # name them in the output so a query added (or only meaningful) at
    # the big tier is visible rather than silently excluded (r15 advice)
    big_only = sorted(q for q in big if q not in small)
    for q, t_small in small.items():
        t_big = big.get(q)
        if t_big is None:
            continue
        if t_small < 0.3:
            # sub-300ms walls are launch-overhead-dominated; a ratio on
            # them flags nothing but noise — record and skip
            floored.append(q)
            continue
        ratios[q] = round(t_big / t_small, 2)
    flagged = {
        q: r
        for q, r in sorted(ratios.items(), key=lambda kv: -kv[1])
        if r > flag_at and q not in by_design
    }
    compat = {
        q: r for q, r in sorted(ratios.items())
        if q in by_design and r > flag_at
    }
    out = {
        "mode": "correctness-logs",
        "small": sys.argv[1],
        "big": sys.argv[2],
        "n_compared": len(ratios),
        "n_floored_sub300ms": len(floored),
        "big_only_queries": big_only,
        "flag_threshold": flag_at,
        "flagged_advisory": flagged,
        "compat_quadratic": compat,
        "worst": max(ratios.items(), key=lambda kv: kv[1]) if ratios else None,
        "ratios": dict(sorted(ratios.items(), key=lambda kv: -kv[1])),
    }
    print(json.dumps(out))


def main() -> None:
    if sys.argv[1].endswith(".txt"):
        return _main_correctness()
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
