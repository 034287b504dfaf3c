"""Registry-wide physical-plan audit — the scale gate.

For every registered query, build the physical plan (without executing
the query — EXCEPTION: iterative operators such as q57's
connected_components run real Spark jobs during plan CONSTRUCTION,
their per-iteration eager localCheckpoint/count; those in-loop shuffles
never appear in the counted final plan and are only partially visible
via checkpoint_scans) and count the operators that dominate 100 TB
behavior: shuffles (Exchange), sorts, nested-loop joins
(BroadcastNestedLoopJoin / CartesianProduct), and whole-stage-codegen
coverage. Compares against the committed budget
snapshot ``tools/plan_budget.json`` so a silent plan regression — a new
shuffle sneaking into a row-local operator, a join degrading to a
nested loop — fails loudly in CI (tests/test_plan_budget.py) instead of
surfacing as a 100× slowdown on a real cluster.

Nested-loop joins are NOT flat-banned: crossJoin against a broadcast
single-row/tiny frame (scalar constants, probe vectors, day grids) is
the intended way to keep corpus-level constants in-plan without a
driver collect. The budget records how many each query is ALLOWED —
the gate catches new, unbudgeted ones.

Usage:
  python tools/plan_audit.py [sf_dir]            # print table, diff vs budget
  python tools/plan_audit.py [sf_dir] --write    # rewrite the budget snapshot
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_budget.json")

# Operator names as they appear in explain("formatted") node headers.
# NOTE: a lazy localCheckpoint truncates the visible plan — upstream
# exchanges run once inside the checkpoint's own materialization job and
# do NOT appear here. checkpoint_scans makes that visible instead of
# letting a checkpoint silently zero a query's shuffle count.
_COUNTED = {
    "exchanges": re.compile(r"^\(\d+\) Exchange", re.M),
    "sorts": re.compile(r"^\(\d+\) Sort", re.M),
    "nested_loops": re.compile(
        r"^\(\d+\) (BroadcastNestedLoopJoin|CartesianProduct)", re.M
    ),
    "row_python_udfs": re.compile(r"^\(\d+\) BatchEvalPython", re.M),
    "checkpoint_scans": re.compile(r"^\(\d+\) Scan ExistingRDD", re.M),
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_one(df) -> dict[str, int]:
    text = plan_text(df)
    return {key: len(rx.findall(text)) for key, rx in _COUNTED.items()}


def audit_all(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    from bbc_news_data_pipeline_spark.plans import all_queries

    out: dict[str, dict[str, int]] = {}
    for q in all_queries():
        out[q.name] = audit_one(q.spark(spark, sf_dir))
    return out


def load_budget() -> dict[str, dict[str, int]]:
    with open(BUDGET_PATH) as f:
        return json.load(f)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from bbc_news_data_pipeline_spark import get_spark

    spark = get_spark("plan-audit")
    got = audit_all(spark, sf_dir)

    if write:
        with open(BUDGET_PATH, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        print(f"wrote {BUDGET_PATH}: {len(got)} queries")
        return 0

    budget = load_budget() if os.path.exists(BUDGET_PATH) else {}
    regressions = []
    for name, counts in got.items():
        allowed = budget.get(name)
        flag = ""
        if allowed is None:
            flag = "NEW (no budget — run --write)"
            regressions.append(name)
        else:
            over = [k for k, v in counts.items() if v > allowed.get(k, 0)]
            if over:
                flag = "OVER BUDGET: " + ", ".join(
                    f"{k} {counts[k]}>{allowed.get(k, 0)}" for k in over
                )
                regressions.append(name)
        print(
            f"{name:38s} ex={counts['exchanges']:2d} sort={counts['sorts']:2d} "
            f"nlj={counts['nested_loops']:d} pyudf={counts['row_python_udfs']:d} {flag}"
        )
    print(f"\n{len(regressions)} plan regression(s)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
