"""Partition-less window lint (VERDICT r15 item 7).

A ``Window.orderBy()`` with no ``partitionBy`` compiles to a
SinglePartition WindowExec — the whole input funnels through ONE task.
Every such site in this engine is bounded by construction (a k-row
Lloyd seed, a vocab-grain top-k, a histogram's bin table), but 115
known-benign WARNs in a full registry run meant the next UNBOUNDED
global window would land silently among them. This module walks a
query's physical plan and returns every partition-less window node, so
the test suite can assert each one sits in an explicitly whitelisted
query — a new query that funnels corpus-grain rows through a global
window now fails a test instead of adding warning #116.

Used by tests/test_window_lint.py; runnable standalone to (re)generate
the whitelist:

    python tools/window_lint.py [sf_dir]   # prints query -> hit count
"""

from __future__ import annotations

import sys


def partitionless_windows(df) -> list[str]:
    """Names of partition-less window-family physical nodes in ``df``'s
    pre-AQE physical plan (WindowExec / WindowGroupLimitExec /
    WindowInPandasExec with an empty partitionSpec). Walks children
    recursively; plan-embedded subqueries are covered by linting the
    registry query-by-query (each staged artifact build is itself a
    registered query's plan in some test tier)."""
    hits: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name in (
            "WindowExec",
            "WindowGroupLimitExec",
            "WindowInPandasExec",
        ):
            try:
                empty = node.partitionSpec().isEmpty()
            except Exception:  # noqa: BLE001 - node without the method
                empty = False
            if empty:
                hits.append(node.nodeName())
        children = node.children()
        for i in range(children.length()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().sparkPlan())
    return hits


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from timeseries_spark.queries import all_queries
    from timeseries_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("window_lint")
    offenders: dict[str, int] = {}
    for name, fn in sorted(all_queries().items()):
        try:
            hits = partitionless_windows(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            continue
        if hits:
            offenders[name] = len(hits)
            print(f"{name}: {len(hits)} partition-less window(s)")
    print(f"\n{len(offenders)} queries with partition-less windows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
