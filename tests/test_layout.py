"""Physical-layout tests: partition pruning and bucketed co-located joins.

These pin the two storage-layout levers that matter most at 100 TB:
a date-partitioned table must let Catalyst prune partitions at the scan
(PartitionFilters, not post-scan filters), and same-bucketed tables must
join with no exchange on either side.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.sources import io


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning(spark, tmp_path, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "orders_by_month")
    io.write_table(
        orders, str(tmp_path), "orders_by_month", partition_by=["order_month"]
    )
    back = spark.read.parquet(path)
    q = back.filter(F.col("order_month") == "1995-01").select("o_orderkey")
    plan = plan_of(q)
    # the month predicate must prune at the directory level, not post-scan
    assert re.search(r"PartitionFilters: \[[^\]]*order_month", plan)
    assert q.count() > 0
    n_months = back.select("order_month").distinct().count()
    assert n_months > 12  # the pruning actually skipped something


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    io.write_bucketed(orders, "t_orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    io.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        8,
        sort_col="o_orderkey",
    )
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").count()
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = plan_of(joined)
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        join_section = plan.split("HashAggregate")[-1]
        # the co-located join itself must read buckets directly: the only
        # exchange allowed in the whole plan is the one for the groupBy
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        n = joined.count()
        assert n > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_compact_table_merges_small_files(spark, sf_dir, tmp_path):
    """Many tiny appends → one compaction pass → few right-sized files,
    same rows."""
    import glob

    from good_enough_timecamp_data_pipeline_spark.sources import io

    path = str(tmp_path / "frag")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(24).write.mode("overwrite").parquet(path)
    assert len(glob.glob(f"{path}/part-*")) == 24
    before = orders.count()

    n_files = io.compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    got = glob.glob(f"{path}/part-*")
    assert len(got) == n_files < 24
    assert spark.read.parquet(path).count() == before


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from good_enough_timecamp_data_pipeline_spark.sources import io

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    io.write_table(nation, str(tmp_path), "nation", fmt="orc")
    back = io.read_table(spark, str(tmp_path), "nation", fmt="orc")
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
