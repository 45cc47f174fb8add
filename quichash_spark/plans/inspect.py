"""Physical-plan inspection helpers (plan-assertion utilities).

The reference has no optimizer to inspect (SURVEY.md §4: all its
optimizations are physical and hard-coded); on Spark the plan IS the
contract — these helpers let tests assert that Catalyst actually did what
the operator author intended (filter pushdown, column pruning, broadcast
choice, whole-stage codegen coverage).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node ('' if none)."""
    plan = explain_str(df)
    for line in plan.splitlines():
        if "PushedFilters" in line:
            return line.strip()
    return ""


def read_schema(df: DataFrame) -> str:
    """The ReadSchema of the scan node (column-pruning check)."""
    plan = explain_str(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (bigger spans = fewer stages).

    Executes the frame: under AQE the ``*(<id>)`` codegen markers only
    exist in the finalized plan, so the pre-execution explain cannot show
    them.
    """
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    ids = {
        line.split("*(", 1)[1].split(")", 1)[0]
        for line in plan.splitlines()
        if "*(" in line
    }
    return len(ids)
