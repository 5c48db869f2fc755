"""Physical-plan inspection: the engine's scale-discipline checks.

The reference hand-codes its 'optimizations' (projection/filter at the
deserializer, SURVEY.md §4.1); we rely on Catalyst — these helpers
make that reliance *testable*: every flagship query has a plan test
asserting that filters reach the parquet scan (PushedFilters), scans
read only referenced columns (ReadSchema), small dims broadcast, and
hot paths stay inside WholeStageCodegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # type: ignore[attr-defined]


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[(.*?)\]", plan)


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of every parquet scan's ReadSchema."""
    plan = formatted_plan(df)
    schemas = re.findall(r"ReadSchema: struct<(.*?)>", plan)
    return [[f.split(":")[0].strip() for f in s.split(",") if f.strip()] for s in schemas]


def assert_plan(
    df: DataFrame,
    requires: list[str] | None = None,
    forbids: list[str] | None = None,
) -> str:
    """Assert substrings (e.g. 'BroadcastHashJoin', 'PushedFilters:
    [IsNotNull(l_shipdate)') present/absent in the formatted plan;
    returns the plan for further checks."""
    plan = formatted_plan(df)
    for s in requires or []:
        assert s in plan, f"plan missing {s!r}:\n{plan}"
    for s in forbids or []:
        assert s not in plan, f"plan must not contain {s!r}:\n{plan}"
    return plan
