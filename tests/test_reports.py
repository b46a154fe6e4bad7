"""Flagship report properties (SURVEY.md §5: rollup conservation etc.)."""

import pytest
from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.plans import reports, testdata


@pytest.fixture(scope="module")
def project_report(spark, sf_dir):
    return reports.report_project_budget(spark, sf_dir).collect()


def test_project_report_shape(project_report):
    assert len(project_report) == 5  # one row per region root
    for r in project_report:
        assert r.project_id.startswith("r")
        assert r.cumulative_seconds >= 0
        assert r.budgeted_seconds >= 0


def test_rollup_conservation(spark, sf_dir, project_report):
    """Sum of per-project cumulative == total entry durations (every entry's
    customer exists and every customer sits under exactly one region)."""
    total = testdata.entries_df(spark, sf_dir).agg(F.sum("duration")).first()[0]
    assert sum(r.cumulative_seconds for r in project_report) == total


def test_budget_conservation(spark, sf_dir, project_report):
    total = testdata.tasks_df(spark, sf_dir).agg(F.sum("budgeted")).first()[0]
    assert sum(r.budgeted_seconds for r in project_report) == total


def test_task_report_only_budgeted(spark, sf_dir):
    df = reports.report_task_budget(spark, sf_dir)
    assert df.filter(F.col("budgeted_seconds") <= 0).count() == 0
    row = df.first()  # ordered by cumulative desc
    assert row.cumulative_fmt.endswith("m") and "h " in row.cumulative_fmt
