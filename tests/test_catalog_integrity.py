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


def test_codegen_exceptions_skipped_under_cold_protocol(spark, monkeypatch):
    """The CODEGEN_ON per-query exceptions were measured shape-warmed;
    under the cold protocol (SPARK_GRAFT_SHAPE_WARMUP=0) a one-shot plan
    pays the Janino compile inside its timed run, so apply_query_conf
    must leave the session's codegen tier alone there."""
    from good_enough_timecamp_data_pipeline_spark.plans import catalog

    name = next(n for n, c in catalog.QUERY_CONF.items() if c is catalog.CODEGEN_ON)
    key = "spark.sql.codegen.wholeStage"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        monkeypatch.setenv("SPARK_GRAFT_SHAPE_WARMUP", "0")
        restore = catalog.apply_query_conf(spark, name)
        assert spark.conf.get(key) == "false"  # exception skipped
        restore()
        monkeypatch.setenv("SPARK_GRAFT_SHAPE_WARMUP", "1")
        restore = catalog.apply_query_conf(spark, name)
        assert spark.conf.get(key) == "true"  # warm protocol applies it
        restore()
        assert spark.conf.get(key) == "false"
    finally:
        spark.conf.set(key, prev)


def test_kernel_family_warmups_execute(spark):
    """The synthetic 64-row kernel-family warm-ups must stay runnable —
    a silent failure would push each family's first-execution cost back
    into some entry's timed number."""
    from good_enough_timecamp_data_pipeline_spark.plans import catalog

    catalog._kernel_family_warmups(spark)  # raises on breakage
