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


def test_compact_table_leaves_no_staging_or_backup(spark, sf_dir, tmp_path):
    """The old-aside swap must clean up both transient dirs on success."""
    import glob
    import os

    from good_enough_timecamp_data_pipeline_spark.sources import io

    path = str(tmp_path / "swap")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.repartition(6).write.mode("overwrite").parquet(path)
    io.compact_table(spark, path)
    assert spark.read.parquet(path).count() == nation.count()
    assert not os.path.exists(path + ".__compact__")
    assert not os.path.exists(path + ".__old__")
    assert glob.glob(f"{path}/part-*")


def test_write_duckdb_roundtrip(spark, sf_dir, tmp_path):
    """S10: the one reference-claimed warehouse sink runnable in this
    sandbox (duckdb powers the oracle) — overwrite then append."""
    import duckdb

    from good_enough_timecamp_data_pipeline_spark.sources import io

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    db = str(tmp_path / "wh.duckdb")
    io.write_duckdb(nation, db, "nation", staging_dir=str(tmp_path / "stg1"))
    io.write_duckdb(
        nation.limit(3), db, "nation", staging_dir=str(tmp_path / "stg2"), mode="append"
    )
    con = duckdb.connect(db)
    try:
        n = con.execute('SELECT COUNT(*) FROM "nation"').fetchone()[0]
        cols = {d[0] for d in con.execute('SELECT * FROM "nation" LIMIT 0').description}
    finally:
        con.close()
    assert n == nation.count() + 3
    assert cols == set(nation.columns)


def test_s3a_conf_routing(spark):
    """S9: config-path coverage without a live bucket — creds/endpoint land
    in the hadoop conf, s3:// URLs normalize to s3a://, and an actual s3a
    access dies on the ABSENT CONNECTOR (proving the path dispatches into
    the hadoop FS layer, the last hop this sandbox can check)."""
    import pytest

    from good_enough_timecamp_data_pipeline_spark.sources import io

    assert io.to_s3a_path("s3://bkt/pfx/t") == "s3a://bkt/pfx/t"
    assert io.to_s3a_path("s3n://bkt/x") == "s3a://bkt/x"
    assert io.to_s3a_path("/local/path") == "/local/path"

    io.configure_s3a(
        spark,
        access_key="AKTEST",
        secret_key="sekrit",
        region="eu-central-1",
        endpoint="http://minio.local:9000",
        path_style_access=True,
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AKTEST"
    assert hconf.get("fs.s3a.secret.key") == "sekrit"
    assert hconf.get("fs.s3a.endpoint.region") == "eu-central-1"
    assert hconf.get("fs.s3a.endpoint") == "http://minio.local:9000"
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.committer.name") == "magic"
    # the factory key Hadoop actually reads — must be UNprefixed when set
    # on the raw Hadoop Configuration ('spark.hadoop.' is only stripped by
    # SparkConf routing); a prefixed key silently leaves the rename-based
    # FileOutputCommitter in charge (r4 ADVICE, medium).
    assert (
        hconf.get("mapreduce.outputcommitter.factory.scheme.s3a")
        == "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
    )
    # the SQL-layer commit protocol bindings require spark-hadoop-cloud
    # (absent in sandbox) and must NOT be set blind — a dangling class name
    # would break every later parquet write in the session.
    assert spark.conf.get("spark.sql.sources.commitProtocolClass", None) in (
        None,
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    )

    with pytest.raises(Exception, match="S3AFileSystem|No FileSystem for scheme"):
        spark.read.parquet(io.to_s3a_path("s3://no-such-bucket/t")).count()


def test_schema_evolution_mergeschema_read(spark, sf_dir, tmp_path):
    """Long-lived tables evolve: files written before a column existed must
    read alongside newer files. mergeSchema unions the footers; old files
    surface NULL for the added column. (Default reads take ONE footer —
    cheap but silently drops late columns, which is why the engine's
    readers pin explicit schemas; this test documents the evolution path.)"""
    path = str(tmp_path / "evolving")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.select("n_nationkey", "n_name").write.mode("append").parquet(path)
    from pyspark.sql import functions as F

    nation.select(
        "n_nationkey", "n_name", F.lit("emea").alias("region_code")
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"n_nationkey", "n_name", "region_code"}
    n = nation.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("region_code").isNull()).count() == n


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """A time-sorted layout prunes time filters but reads EVERY file for a
    user filter; the Z-ordered layout bounds both columns per file, so
    either filter skips most files. Measured from the same parquet footer
    min/max statistics a reader uses."""
    from good_enough_timecamp_data_pipeline_spark.operators import layout

    n = 40_000
    df = (
        spark.range(n)
        .withColumn("ts_num", F.col("id"))  # arrival order == time
        .withColumn("user_id", (F.col("id") * 2654435761) % 10_000)  # uncorrelated
        .select("ts_num", "user_id")
    )

    linear = str(tmp_path / "linear")
    (
        df.repartitionByRange(16, F.col("ts_num"))
        .sortWithinPartitions("ts_num")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zpath = str(tmp_path / "zordered")
    layout.write_zordered(df, zpath, "ts_num", "user_id", n_files=16)

    # user-scoped box: 1% of the user range
    u_hit, u_total = layout.files_overlapping(zpath, "user_id", 1000, 1100)
    ul_hit, ul_total = layout.files_overlapping(linear, "user_id", 1000, 1100)
    assert ul_hit == ul_total  # linear layout cannot skip on user_id
    assert u_hit <= u_total // 2, (u_hit, u_total)  # z-order skips most files

    # time-scoped box: z-order still prunes (coarser than pure time sort)
    t_hit, t_total = layout.files_overlapping(zpath, "ts_num", 0, n // 100)
    assert t_hit < t_total, (t_hit, t_total)


def test_range_sorted_layout_disjoint_files(spark, tmp_path):
    """write_range_sorted gives each file a disjoint key range: a narrow
    key filter touches exactly one (or two boundary) files, measured from
    the same footer statistics a reader prunes with."""
    from good_enough_timecamp_data_pipeline_spark.operators import layout

    n = 40_000
    df = (
        spark.range(n)
        .withColumn("user_id", (F.col("id") * 2654435761) % 10_000)
        .select("user_id", F.col("id").alias("payload"))
    )
    path = str(tmp_path / "range_sorted")
    layout.write_range_sorted(df, path, ["user_id"], n_files=16)

    hit, total = layout.files_overlapping(path, "user_id", 1000, 1100)
    assert total == 16
    # 1% of the key range must not touch more than 2 boundary files
    assert hit <= 2, (hit, total)
    # layout preserves data
    assert spark.read.parquet(path).count() == n


def test_write_sqlite_roundtrip(spark, sf_dir, tmp_path):
    """S10 SQLite destination: overwrite + append roundtrip, typed
    columns, timestamps as ISO text, bounded-batch load."""
    import sqlite3

    from good_enough_timecamp_data_pipeline_spark.sources.io import write_sqlite

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    db = str(tmp_path / "wh.db")
    n = write_sqlite(nation, db, "nation", batch_rows=7)
    assert n == nation.count()

    con = sqlite3.connect(db)
    try:
        rows = con.execute(
            "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"
        ).fetchall()
        expect = [
            (r.n_nationkey, r.n_name)
            for r in nation.orderBy("n_nationkey").collect()
        ]
        assert rows == expect
        # append doubles the count
        write_sqlite(nation, db, "nation", mode="append", batch_rows=7)
        assert con.execute("SELECT COUNT(*) FROM nation").fetchone()[0] == 2 * n
        # typed storage: ints are INTEGER, names TEXT
        kinds = {
            r[1]: r[2]
            for r in con.execute("PRAGMA table_info(nation)").fetchall()
        }
        assert kinds["n_nationkey"] == "INTEGER" and kinds["n_name"] == "TEXT"
    finally:
        con.close()

    # timestamps land as ISO text (orders has o_orderdate)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(20)
    write_sqlite(orders, db, "orders")
    con = sqlite3.connect(db)
    try:
        (val,) = con.execute("SELECT o_orderdate FROM orders LIMIT 1").fetchone()
        assert isinstance(val, str) and val[:4].isdigit()
    finally:
        con.close()
