"""Plan inspection helpers: make the physical plan a testable artifact.

At 100 TB the difference between a right and wrong plan is the job — these
helpers let tests assert the properties that matter (filters reached the
scan, columns pruned, small dims broadcast, aggregates partial, top-k
never a full sort) so a refactor that silently regresses the plan fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = plan_string(df, mode)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan is missing {missing}:\n{plan}")
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = plan_string(df, mode)
    present = [n for n in needles if n in plan]
    if present:
        raise AssertionError(f"plan unexpectedly contains {present}:\n{plan}")
    return plan


def scan_read_schema(df: DataFrame, table_hint: str = "") -> list[str]:
    """ReadSchema column lists of the parquet scans in the plan (optionally
    filtered to scans whose location mentions table_hint)."""
    plan = plan_string(df, "formatted")
    out = []
    current_loc_match = True
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("Location:"):
            current_loc_match = table_hint in line if table_hint else True
        if line.startswith("ReadSchema:") and current_loc_match:
            out.append(line.split("ReadSchema:", 1)[1].strip())
    return out
