"""Mechanical plan lint: enforce the 100 TB plan-shape claims (VERDICT r9
"Next round" #1) instead of narrating them.

The registry's scale story rests on two invariants that a sf0.01 oracle can
never falsify (every plan is fast on 500 rows):

1. **No unbounded single-partition window.** ``WindowExec`` with an empty
   partition spec forces a ``SinglePartition`` exchange — ALL input rows on
   one executor. That is fine over bounded metadata (count-of-counts
   histograms, ≤O(salts) offset tables, top-K survivors) and fatal over
   corpus-scale rows. The mechanical proxy for "bounded metadata": every
   unpartitioned window's subtree must contain an aggregation (the ONLY way
   the registry's specs reduce corpus-scale input to metadata before a
   global window; a raw scan feeding an unpartitioned window has no
   aggregate below it and is exactly the regression class this lint exists
   to catch). ``WindowGroupLimitExec`` (rank-pushdown) is held to the same
   rule.
2. **No cartesian product.** ``CartesianProductExec`` shuffles the full
   cross product; every all-pairs shape in the registry must instead be a
   banded/bucketed equi-join or a broadcast nested loop with a provably
   small side. A broadcast nested-loop join is allowed only when the
   broadcast side's subtree contains an aggregate or a limit (bounded build
   side); raw-scan broadcast sides are flagged.

``lint_plan`` walks the PRE-adaptive physical plan (``sparkPlan()``) via
py4j — string-parsing explain output would miss partition specs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

#: physical aggregates that reduce corpus-scale input to bounded metadata
_AGG_NODES = {"HashAggregateExec", "ObjectHashAggregateExec", "SortAggregateExec"}
#: nodes that bound cardinality without aggregating
_LIMIT_NODES = {"GlobalLimitExec", "LocalLimitExec", "CollectLimitExec", "TakeOrderedAndProjectExec"}


@dataclass(frozen=True)
class Violation:
    kind: str  # "unbounded-global-window" | "cartesian" | "unbounded-bnlj-build"
    node: str  # offending node's one-line string form (truncated)

    def __str__(self) -> str:  # pragma: no cover - repr convenience
        return f"{self.kind}: {self.node}"


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def _name(node) -> str:
    return node.getClass().getSimpleName()


#: a literal Range this small is bounded metadata (salt fan-outs, band ids)
_RANGE_BOUND = 65536


def _subtree_is_bounded(node) -> bool:
    """True when the subtree reduces cardinality before reaching any scan:
    contains an aggregate, a limit, or is a small literal Range (salt
    fan-out). (A reused exchange/subquery counts via its own subtree.)"""
    for n in _walk(node):
        name = _name(n)
        if name in _AGG_NODES or name in _LIMIT_NODES:
            return True
        if name == "RangeExec" and int(n.numElements()) <= _RANGE_BOUND:
            return True
    return False


def _one_line(node, width: int = 160) -> str:
    s = node.toString().splitlines()[0]
    return s[:width]


def lint_plan(df: DataFrame) -> list[Violation]:
    """Lint a DataFrame's pre-adaptive physical plan. Empty list = clean."""
    plan = df._jdf.queryExecution().sparkPlan()
    out: list[Violation] = []
    for node in _walk(plan):
        n = _name(node)
        if n in ("WindowExec", "WindowGroupLimitExec"):
            if node.partitionSpec().isEmpty() and not _subtree_is_bounded(node):
                out.append(Violation("unbounded-global-window", _one_line(node)))
        elif n == "CartesianProductExec":
            out.append(Violation("cartesian", _one_line(node)))
        elif n == "BroadcastNestedLoopJoinExec":
            # the broadcast (build) side must be bounded; buildSide() prints
            # BuildLeft/BuildRight
            build_left = "BuildLeft" in node.buildSide().toString()
            kids = _children(node)
            build = kids[0] if build_left else kids[1]
            if not _subtree_is_bounded(build):
                out.append(Violation("unbounded-bnlj-build", _one_line(node)))
    return out


def lint_registry(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[Violation]]:
    """Run every registry spec's fn and lint the returned plan. Returns
    {spec_name: violations} for specs with a non-empty violation list."""
    from hudi_examples_spark.registry import all_specs

    bad: dict[str, list[Violation]] = {}
    for spec in all_specs():
        if names is not None and spec.name not in names:
            continue
        df = spec.fn(spark, sf_dir)
        v = lint_plan(df)
        if v:
            bad[spec.name] = v
    return bad
