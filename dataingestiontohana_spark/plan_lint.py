"""Plan linter: the engine's 100 TB anti-pattern gates as a LIBRARY
function — the same checks `tests/test_plan_quality.py` pins for every
declared query, callable on any user DataFrame before it ships.

    from dataingestiontohana_spark.plan_lint import lint_plan
    problems = lint_plan(df)     # [] = clean
    lint_plan(df, strict=True)   # raise on any finding

Checked shapes (each one is a scale-killer, not a style nit):

- CARTESIAN / broadcast-nested-loop products — O(n*m) pair blow-up
  (a 1-row side is tolerated: the literal-attach pattern).
- Unbounded single-partition windows over unreduced input — the whole
  table funnels through ONE task (windows below an Aggregate/Limit are
  sanctioned: they see reduced rows, e.g. operators/ranks.py).
- Row-at-a-time python UDFs (BatchEvalPython) — per-row serde;
  Arrow-batched pandas UDFs (ArrowEvalPython) pass.
- Whole-row scans feeding narrow projections — a parquet ReadSchema
  materially wider than the columns the plan consumes is flagged via
  the scan's column count heuristic (> max(2x, +8) the output width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _nodes(plan):
    stack = [plan]
    while stack:
        n = stack.pop()
        yield n
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def _subtree_is_reduced(window_node) -> bool:
    for n in _nodes(window_node):
        if n is window_node:
            continue
        name = n.nodeName()
        if "Aggregate" in name or "Limit" in name:
            return True
    return False


def _subtree_is_single_row(node) -> bool:
    """True when this plan subtree provably produces AT MOST one row:
    OneRowRelation, an ungrouped (global) Aggregate, a
    row-preserving-or-reducing wrapper (Project/Filter) over such a
    subtree, or a Join of two such subtrees (the 1x1 crossJoin that
    chains scalar attachments). The optimizer routinely interposes
    Filter(isnotnull(...))/Project between a join and the global
    Aggregate feeding it, so a direct-child check misses sanctioned
    literal-attach shapes."""
    name = node.nodeName()
    if "OneRowRelation" in name:
        return True
    if "Aggregate" in name:
        try:
            return node.groupingExpressions().isEmpty()
        except Exception:
            return False
    if name in ("Project", "Filter") or "Join" in name:
        try:
            ch = node.children()
            kids = [ch.apply(i) for i in range(ch.size())]
        except Exception:
            return False
        return bool(kids) and all(_subtree_is_single_row(k) for k in kids)
    return False


def _row_estimate_is_single(node) -> bool:
    """True when one side of a join is a provable single row (the
    sanctioned 1-row crossJoin literal-attach pattern)."""
    try:
        ch = node.children()
        for i in range(ch.size()):
            if _subtree_is_single_row(ch.apply(i)):
                return True
    except Exception:
        pass
    return False


def _scan_widths(executed_plan) -> list[int]:
    """Pruned output width of every file-scan node in the physical plan
    (the column count the scan actually reads after pruning). Walks the
    plan tree rather than parsing ``toString`` — long ReadSchemas are
    truncated with ``...`` in the string form."""
    widths: list[int] = []
    for n in _nodes(executed_plan):
        name = n.nodeName()
        if name.startswith("Scan ") or name.startswith("FileScan"):
            try:
                widths.append(n.output().size())
            except Exception:
                pass
    return widths


def lint_plan(df: DataFrame, strict: bool = False) -> list[str]:
    """Return the scale-killer findings for this DataFrame's plan
    (empty list = clean). ``strict=True`` raises ValueError instead."""
    problems: list[str] = []

    optimized = df._jdf.queryExecution().optimizedPlan()
    for node in _nodes(optimized):
        name = node.nodeName()
        if name == "Window" and node.partitionSpec().isEmpty():
            if not _subtree_is_reduced(node):
                problems.append(
                    "unpartitioned Window over unreduced input: the whole "
                    "table funnels through one task at scale — partition "
                    "the window or reduce (aggregate/limit) first"
                )
        if name == "Join":
            try:
                jt = str(node.joinType())
            except Exception:
                jt = ""
            if "Cross" in jt and not _row_estimate_is_single(node):
                problems.append(
                    "cross join between multi-row inputs: O(n*m) pair "
                    "blow-up — use an equi-key (bucketed/banded) join, or "
                    "broadcast a 1-row aggregate if attaching scalars"
                )

    executed = df._jdf.queryExecution().executedPlan().toString()
    if "CartesianProduct" in executed:
        problems.append(
            "CartesianProduct in the physical plan: every left row "
            "pairs with every right row"
        )
    if "BatchEvalPython" in executed:
        problems.append(
            "row-at-a-time python UDF (BatchEvalPython): per-row serde, "
            "~10-100x slower than an Arrow-batched pandas UDF"
        )

    out_width = len(df.columns)
    width_cap = max(2 * out_width, out_width + 8)
    for scan_width in _scan_widths(df._jdf.queryExecution().executedPlan()):
        if scan_width > width_cap:
            problems.append(
                f"whole-row scan feeding a narrow projection: a parquet "
                f"ReadSchema of {scan_width} columns serves a "
                f"{out_width}-column result (cap {width_cap}) — project "
                f"the needed columns before wide transforms so column "
                f"pruning reaches the scan"
            )

    if strict and problems:
        raise ValueError("plan lint: " + "; ".join(problems))
    return problems
