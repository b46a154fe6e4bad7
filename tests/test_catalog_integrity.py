"""Catalog registration guards: the driver contract must stay coherent
as entries accumulate (every oracle has a query, names are sane, and
the contract module imports without touching a SparkSession)."""

import re
import subprocess
import sys


def test_every_oracle_has_a_query_and_names_are_sane():
    from good_enough_timecamp_data_pipeline_spark.plans import catalog

    qs = catalog.queries()
    os_ = catalog.oracle_sql()
    assert set(os_) <= set(qs), sorted(set(os_) - set(qs))
    assert len(qs) >= 170
    for name in qs:
        assert re.fullmatch(r"[a-z][a-z0-9_]*", name), name
    for name, sql in os_.items():
        assert sql.strip(), name
        assert "SELECT" in sql.upper(), name


def test_entry_module_imports_without_spark_session():
    """The driver imports __spark_entry__ before building its session;
    a module-level SparkSession (or any action) would break the gate.
    Run in a clean subprocess so this session's JVM can't mask it."""
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "import __spark_entry__ as e;"
        "assert callable(e.entry) and len(e.queries()) >= 170;"
        "assert len(e.oracle_sql()) >= 140;"
        "from pyspark.sql import SparkSession;"
        "assert SparkSession.getActiveSession() is None, 'import started a session';"
        "print('ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok" in out.stdout
