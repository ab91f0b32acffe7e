"""Executed-plan metrics: measure what a query actually shuffled.

`PLANS.md` argues from plan SHAPE (broadcast here, one exchange there);
this module turns those claims into MEASURED evidence by walking the
adaptive executed plan after an action and summing SQLMetrics per node.
`tests/test_shuffle_budget.py` locks byte budgets for the queries whose
whole design is "the fact never rides a shuffle".

Scale rationale: at 100 TB the difference between "broadcast star + one
aggregation exchange" and "fact-fact shuffle" is the difference between
kilobytes and the whole table on the wire — a regression that flips a
broadcast into a shuffle is invisible to row-count tests and obvious in
shuffleBytesWritten.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame


def _children(node: Any) -> list[Any]:
    name = node.nodeName()
    out = []
    if name == "AdaptiveSparkPlan":
        # the final (re-optimized) physical plan, only valid post-execution
        out.append(node.executedPlan())
        return out
    ch = node.children()
    for i in range(ch.size()):
        out.append(ch.apply(i))
    if name.endswith("QueryStage"):  # AQE stage wrappers hide their plan
        out.append(node.plan())
    return out


def _walk(node: Any) -> Iterator[Any]:
    yield node
    for c in _children(node):
        yield from _walk(c)


def executed_metrics(df: DataFrame) -> list[tuple[str, dict[str, int]]]:
    """(nodeName, metrics) for every node of the EXECUTED plan.

    Call after an action (collect/count) — adaptive stages only expose
    their final plan and populated metrics post-execution.
    """
    out: list[tuple[str, dict[str, int]]] = []
    for n in _walk(df._jdf.queryExecution().executedPlan()):
        m = n.metrics()
        it = m.iterator()
        vals: dict[str, int] = {}
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        out.append((n.nodeName(), vals))
    return out


def shuffle_bytes_written(df: DataFrame) -> int:
    """Total bytes written to shuffle by the executed plan (0 = no data
    crossed an Exchange; broadcast traffic is NOT counted)."""
    total = 0
    for name, vals in executed_metrics(df):
        if name == "Exchange":
            total += int(vals.get("shuffleBytesWritten", 0))
    return total


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the executed plan."""
    return sum(1 for name, _ in executed_metrics(df) if name == "Exchange")
