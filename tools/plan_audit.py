"""Executed-plan anti-pattern audit across the whole registry.

Runs every registered query's physical plan (sf0.01 by default) and
reports the scale anti-patterns a reviewer would grep for by hand:

- ``CartesianProduct`` — an unbounded cross join (broadcast cross joins
  compile to BroadcastNestedLoopJoin and are allowed when one side is a
  one-row/tiny aggregate; a true CartesianProduct never is).
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan (Arrow
  paths show ``ArrowEvalPython`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandas`` instead, which are the sanctioned kernels).
- ``global window`` — WindowExec directly above a SinglePartition
  exchange. Reported informationally with the window's input subtree
  hint; legitimate when the input is a bounded aggregate (a handful of
  language/cell rows), a scale bug when it's a full fact table.

The hard invariants (zero CartesianProduct, zero BatchEvalPython) are
also enforced by tests/test_plans.py::test_no_cartesian_or_row_python_anywhere
so a regression fails CI, not just this report.

Usage: python tools/plan_audit.py [sf_dir]
Prints one JSON line: {"cartesian": [...], "row_python": [...],
"global_windows": {query: n_occurrences}, "checked": N}
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(spark, sf_dir: str) -> dict:
    from boxoffice_spark.registry import load_all

    specs = load_all()
    cartesian, row_python = [], []
    global_windows: dict[str, int] = {}
    checked = 0
    for name, spec in specs.items():
        # streaming monitors (s_*) run a full availableNow drain just to
        # build their result frame — skip BEFORE calling fn(), both to
        # keep the audit cheap and so a genuine s_* failure isn't
        # swallowed by an exception guard; their batch twins cover the
        # plan shapes, and the stream==batch tests cover the monitors
        if name.startswith("s_"):
            continue
        plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        checked += 1
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan:
            row_python.append(name)
        # tree-prefix-tolerant: lines inside a join branch are prefixed
        # with ':'/':-'/':  +-' rather than plain '+-' — a global window
        # nested under a join must still be detected
        n_glob = len(
            re.findall(
                r"Window .*\n(?:[\s:+-]*Sort .*\n)?[\s:+-]*Exchange SinglePartition",
                plan,
            )
        )
        if n_glob:
            global_windows[name] = n_glob
    return {
        "cartesian": cartesian,
        "row_python": row_python,
        "global_windows": global_windows,
        "checked": checked,
    }


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from boxoffice_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(audit(spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
