"""Dual-scale oracle proof in one command (VERDICT r6 item 9: rounds
kept drifting because the sf0.01 and sf0.1 runs were launched — and
occasionally forgotten — separately).

Runs the full registry through tools/check_oracle.py at BOTH scale
factors and writes the round's proof artifacts:

    python tools/prove.py r08            # -> ORACLE_FULL_r08.txt (sf0.01)
                                         #    ORACLE_SF01_r08.txt (sf0.1)

Exits non-zero if either scale has any failure, so a red proof can
never be committed by accident.
"""

from __future__ import annotations

import subprocess
import sys

RUNS = (
    ("/root/testdata/sf0.01", "ORACLE_FULL_{tag}.txt"),
    ("/root/testdata/sf0.1", "ORACLE_SF01_{tag}.txt"),
)


def main() -> int:
    if len(sys.argv) != 2:
        print("usage: python tools/prove.py <round-tag, e.g. r08>")
        return 2
    tag = sys.argv[1]
    rc_total = 0
    for sf_dir, name_tpl in RUNS:
        out = name_tpl.format(tag=tag)
        print(f"== {sf_dir} -> {out}")
        with open(out, "w") as fh:
            rc = subprocess.call(
                [sys.executable, "tools/check_oracle.py", sf_dir],
                stdout=fh,
                stderr=subprocess.DEVNULL,
            )
        with open(out) as fh:
            tail = fh.readlines()[-1].strip()
        print(f"   {tail} (rc={rc})")
        rc_total |= rc
    return rc_total


if __name__ == "__main__":
    raise SystemExit(main())
