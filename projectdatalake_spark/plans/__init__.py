"""Plan introspection: assert the physical plan is the one we want.

The engine's performance contract is enforced in tests with these helpers:
filters must reach the parquet scan, dimension joins must broadcast, and hot
paths must stay inside whole-stage codegen (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def is_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def codegen_stages(df: DataFrame) -> int:
    return physical_plan(df).count("WholeStageCodegen")
