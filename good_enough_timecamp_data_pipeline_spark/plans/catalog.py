"""Driver-facing query catalog.

Every implemented operator from SURVEY.md §2 is registered here as a named
``(spark, sf_dir) -> DataFrame`` callable; ``ORACLES`` holds the ANSI-SQL
twin DuckDB runs on the same parquet. Column names/aliases must match
exactly between the two sides (the driver sorts columns by name and hashes
values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import reports

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return reports.report_project_budget(spark, sf_dir)


# --- SURVEY §2.5 + §7 M1: flagship recursive-rollup reports ----------------
register(
    "report_task_budget", reports.report_task_budget, reports.oracle_task_budget_sql()
)
register(
    "report_project_budget",
    reports.report_project_budget,
    reports.oracle_project_budget_sql(),
)
