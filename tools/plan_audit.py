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


# --- broadcast-hint boundedness audit (analyzed LOGICAL plan) --------------
#
# A broadcast HINT overrides autoBroadcastJoinThreshold: if the build side
# grows with the corpus, the hint is an OOM by construction at scale — the
# one failure class AQE cannot save you from. This walker classifies every
# ResolvedHint subtree as bounded/unbounded:
#
#   bounded  — grouping-free Aggregate (≤1 row), Limit, a Filter whose
#              condition bounds a string length against a literal (finite
#              domain ≤ alphabet^k: the q153 "shorts" pattern), or leaves
#              that never scale with the corpus (LocalRelation,
#              OneRowRelation, Range).
#   unbounded — any root-to-leaf path reaching a LogicalRelation (a real
#              table scan) or an OPAQUE LogicalRDD (checkpoint — provable
#              boundedness is lost, so it must be bounded BEFORE the
#              checkpoint) without passing a bounding node. Grouped
#              aggregates/distincts do NOT bound: a per-key rollup's
#              cardinality is the key domain, which grows with the corpus
#              (exactly the q153 m_a/m_b hazard this exists to catch).
#
# This is a TRIPWIRE, not a prover: the bounded rules below are heuristics
# tuned to this repo's reviewed plan idioms, so a new hint site that trips
# them lands in the pinned inventory (tests/test_plan_budget.py) where a
# human writes down WHY its build side is bounded — or removes the hint.

# Filter conditions that signal a deliberate cardinality selection before
# the hint: comparison of an attribute against a LITERAL (key = const,
# id < 8, md5-mod sampling = 0, bare string enums) or an explicit string
# LENGTH bound (finite domain <= alphabet^k).
_BOUNDING_FILTER_RX = re.compile(
    r"(?:length\([^)]*\) <=? \d)"
    r"|(?:(?:=|<=?|>=?) (?:cast\(-?\d|-?\d|'[^']*'|[A-Z][A-Za-z0-9_]*\)))"
)
_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation", "Range"}
# Columns whose DOMAIN is independent of corpus row count (dimension
# attributes, fixed sketch geometry, value-domain buckets) — a groupBy /
# dropDuplicates keyed ONLY by these yields domain-bounded cardinality:
#   source (20 feeds) / lang / event_type (5) / p_brand (25, TPC-H spec)
#   dim (embedding dimensionality) / d, col (sketch depth x width grid)
#   bucket, nt (value-domain histogram cells) / b (fixed replicate/ring
#   index, B<=64) / shard (fixed shard count) / start (q165 walk frontier:
#   one row per start node, starts drawn via limit(16))
_DOMAIN_BOUNDED_COLS = {
    "source", "lang", "event_type", "p_brand", "dim", "d", "col",
    "bucket", "nt", "b", "shard", "start",
}
# Fixed-size TPC-H dimension tables (5 / 25 rows at every SF).
_DIM_TABLES = {"region.parquet", "nation.parquet"}


def _attr_names(seq) -> list[str] | None:
    """Plain attribute names from a Seq[Expression]; None if any member
    is not a simple AttributeReference (computed keys stay unbounded)."""
    names = []
    for i in range(seq.size()):
        e = seq.apply(i)
        if e.getClass().getSimpleName() != "AttributeReference":
            return None
        names.append(e.name())
    return names


def _relation_bounded(n) -> bool:
    """LogicalRelation: fixed dimension tables are bounded; mid-query
    artifacts written outside the testdata lake (batch deltas, manifests)
    are treated as bounded — they are per-run, not corpus-scale."""
    try:
        path = n.relation().location().rootPaths().apply(0).toString()
    except Exception:
        return False
    if "/testdata/" not in path:
        return True
    return os.path.basename(path.rstrip("/")) in _DIM_TABLES


def _subtree_unbounded(node) -> bool:
    stack = [node]
    while stack:
        n = stack.pop()
        nm = n.getClass().getSimpleName()
        if nm == "Aggregate":
            ge = n.groupingExpressions()
            if ge.isEmpty():
                continue
            names = _attr_names(ge)
            if names is not None and set(names) <= _DOMAIN_BOUNDED_COLS:
                continue
        if nm == "Deduplicate":
            try:
                names = _attr_names(n.keys())
            except Exception:
                names = None
            if names is not None and set(names) <= _DOMAIN_BOUNDED_COLS:
                continue
        if nm in ("GlobalLimit", "LocalLimit"):
            continue
        if nm == "Filter" and _BOUNDING_FILTER_RX.search(n.condition().toString()):
            continue
        if nm in _BOUNDED_LEAVES:
            continue
        if nm == "LogicalRelation":
            if _relation_bounded(n):
                continue
            return True
        if nm == "LogicalRDD":
            # opaque checkpoint: boundedness must be established BEFORE
            # the checkpoint; a hint straight over one is unprovable here.
            return True
        cs = n.children()
        for i in range(cs.size()):
            stack.append(cs.apply(i))
    return False


def corpus_broadcast_hints(df) -> int:
    """Number of broadcast-hinted subtrees whose build side derives,
    unbounded, from a corpus-scale scan. Pinned at 0 in
    tests/test_plan_budget.py — a hint that only AQE could have saved is
    a plan bug, not a tuning choice."""
    count = 0
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        n = stack.pop()
        cs = n.children()
        if n.getClass().getSimpleName() == "ResolvedHint":
            if any(_subtree_unbounded(cs.apply(i)) for i in range(cs.size())):
                count += 1
                continue  # don't double-count nested hints inside a flagged one
        for i in range(cs.size()):
            stack.append(cs.apply(i))
    return count


def audit_one(df) -> dict[str, int]:
    text = plan_text(df)
    counts = {key: len(rx.findall(text)) for key, rx in _COUNTED.items()}
    counts["corpus_broadcast_hints"] = corpus_broadcast_hints(df)
    return counts


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
