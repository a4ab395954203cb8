"""Recursive CTE as an iterative DataFrame fixpoint.

Reference: datafusion/physical-plan/src/recursive_query.rs — DataFusion
executes ``WITH RECURSIVE`` by repeatedly evaluating the recursive term
against a work table until it produces no rows.  Spark has no native
recursion operator, so we drive the same semantics from the Python side:
each iteration is one declarative DataFrame step (Catalyst still optimizes
every join inside it), and the loop is plain driver control flow.

Scale design (this is the part that matters at 100 TB):
  - ``localCheckpoint`` each frontier — without it the logical plan doubles
    per iteration and Catalyst analysis goes quadratic; with it, each
    iteration's plan is flat.
  - the frontier is usually tiny relative to the edge table → Spark's AQE
    converts the per-iteration join into a broadcast join automatically;
    the big edge relation is scanned per iteration but never shuffled.
  - ``isEmpty()`` is the per-iteration termination action (one cheap job
    that stops at the first non-empty partition).
  - ``max_iter`` bounds runaway recursion, mirroring DataFusion's
    recursion depth guard.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_fixpoint(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iter: int = 100,
) -> DataFrame:
    """UNION ALL semantics of ``WITH RECURSIVE cte AS (base UNION ALL
    step(cte-frontier))``: iterate ``step`` on the previous iteration's
    output (the frontier, not the accumulated set) until it is empty."""
    frontier = base.localCheckpoint(eager=True)
    acc = frontier
    for _ in range(max_iter):
        frontier = step(frontier).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        acc = acc.unionAll(frontier)
    else:
        raise RuntimeError(f"recursive_fixpoint: no fixpoint within {max_iter} iterations")
    return acc


def recursive_fixpoint_distinct(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iter: int = 100,
) -> DataFrame:
    """UNION (distinct) semantics — the recursive CTE form that terminates
    on cyclic graphs: each iteration keeps only rows never seen before
    (left anti join against the accumulated set), exactly how DataFusion's
    recursive query dedups its work table under UNION.  Required for graph
    walks (connected components, reachability) where UNION ALL would loop
    forever.

    Scale: the anti join shuffles frontier ∪ acc each round; acc is
    checkpointed so its plan stays flat.  For very deep graphs prefer
    alternating-direction label propagation (fewer rounds)."""
    acc = base.distinct().localCheckpoint(eager=True)
    frontier = acc
    for _ in range(max_iter):
        fresh = (
            step(frontier)
            .distinct()
            .join(acc, on=list(acc.columns), how="left_anti")
            .localCheckpoint(eager=True)
        )
        if fresh.isEmpty():
            break
        acc = acc.unionAll(fresh).localCheckpoint(eager=True)
        frontier = fresh
    else:
        raise RuntimeError(
            f"recursive_fixpoint_distinct: no fixpoint within {max_iter} iterations"
        )
    return acc
