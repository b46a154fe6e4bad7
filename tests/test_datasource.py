"""TimeCamp Python DataSource (spark.read.format("timecamp")).

The extract tier as a native Spark source: partitioned per-date-chunk
fetch on executors, rows coerced to the landed schemas, exact parity
with the existing driver-side builders on the demo workspace.
"""

from __future__ import annotations

import pytest

from good_enough_timecamp_data_pipeline_spark.sources.datasource import (
    TimecampDataSource,
    _chunks,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(TimecampDataSource)
    return spark


def test_date_chunking():
    ch = _chunks("2025-01-01", "2025-02-28", 20)
    assert [(c.from_date, c.to_date) for c in ch] == [
        ("2025-01-01", "2025-01-20"),
        ("2025-01-21", "2025-02-09"),
        ("2025-02-10", "2025-02-28"),
    ]
    one = _chunks("2025-01-05", "2025-01-05", 20)
    assert [(c.from_date, c.to_date) for c in one] == [("2025-01-05", "2025-01-05")]
    with pytest.raises(ValueError):
        _chunks("2025-02-01", "2025-01-01", 20)


def test_entries_source_matches_builder(registered):
    """format('timecamp') entries == ingest.build_entries row-for-row on
    the demo workspace (same coercions, same tags->JSON rule)."""
    from good_enough_timecamp_data_pipeline_spark.sources.client import TimeCampClient
    from good_enough_timecamp_data_pipeline_spark.sources.fixtures import (
        demo_transport,
    )
    from good_enough_timecamp_data_pipeline_spark.sources.ingest import build_entries

    spark = registered
    via_source = (
        spark.read.format("timecamp")
        .option("dataset", "entries")
        .option("from", "2025-01-01")
        .option("to", "2026-02-01")
        .option("mode", "offline-demo")
        .load()
    )
    via_builder = build_entries(
        spark, TimeCampClient(demo_transport()), "2025-01-01", "2026-02-01"
    )
    assert via_source.schema == via_builder.schema
    rows_s = sorted(map(tuple, via_source.collect()))
    rows_b = sorted(map(tuple, via_builder.collect()))
    assert rows_s == rows_b and rows_s


def test_entries_source_is_partitioned(registered):
    """A long window fans out into multiple input partitions — the
    distributed-fetch shape (one REST window per executor task)."""
    df = (
        registered.read.format("timecamp")
        .option("dataset", "entries")
        .option("from", "2025-01-01")
        .option("to", "2025-03-01")
        .option("chunk_days", "20")
        .option("mode", "offline-demo")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3


def test_tasks_and_users_raw_tiers(registered):
    from good_enough_timecamp_data_pipeline_spark.sources.client import TimeCampClient
    from good_enough_timecamp_data_pipeline_spark.sources.fixtures import (
        demo_transport,
    )

    spark = registered
    tasks = (
        spark.read.format("timecamp")
        .option("dataset", "tasks")
        .option("mode", "offline-demo")
        .load()
    )
    raw = TimeCampClient(demo_transport()).get_tasks()
    assert tasks.count() == len(raw)
    got = {r["task_id"]: r for r in tasks.collect()}
    for t in raw:
        row = got[str(t["task_id"])]
        assert row["name"] == str(t["name"])
        assert row["budgeted"] == int(t.get("budgeted") or 0)

    users = (
        spark.read.format("timecamp")
        .option("dataset", "users")
        .option("mode", "offline-demo")
        .load()
    )
    raw_u = TimeCampClient(demo_transport()).get_users()
    assert users.count() == len(raw_u)
    assert {r["user_id"] for r in users.collect()} == {
        str(u["user_id"]) for u in raw_u
    }
    assert dict(users.dtypes)["is_enabled"] == "boolean"


def test_source_feeds_existing_transform_layer(registered):
    """Raw tasks from the source run through the same breadcrumb
    enrichment the pipeline applies — source and transform tiers compose."""
    from pyspark.sql import functions as F

    from good_enough_timecamp_data_pipeline_spark.operators.canonicalize import (
        null_canonical,
    )
    from good_enough_timecamp_data_pipeline_spark.operators.hierarchy import (
        breadcrumbs,
    )

    tasks = (
        registered.read.format("timecamp")
        .option("dataset", "tasks")
        .option("mode", "offline-demo")
        .load()
        .withColumn("parent_id", null_canonical("parent_id"))
    )
    crumbed = breadcrumbs(tasks, "task_id", "parent_id", "name", n_levels=8,
                          prefix="task")
    row = crumbed.filter(F.col("task_id") == "3").head()
    assert row["task_breadcrumb"] == "Acme / Platform / Ingest"


def test_missing_credentials_is_loud(registered):
    with pytest.raises(Exception, match="api_key|offline-demo"):
        (
            registered.read.format("timecamp")
            .option("dataset", "entries")
            .option("from", "2025-01-01")
            .option("to", "2025-01-02")
            .load()
            .collect()
        )


def test_streaming_entries_source_incremental_sync(registered, tmp_path):
    """readStream.format('timecamp'): the bounded backfill drains in
    date-chunk micro-batches to exactly the batch result, and a
    restarted query resumes from the checkpoint offset with no
    re-emission (the reference's cron re-sync as a native streaming
    source)."""
    spark = registered
    out = str(tmp_path / "sync_out")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        q = (
            spark.readStream.format("timecamp")
            .option("dataset", "entries")
            .option("from", "2025-01-01")
            .option("to", "2025-06-30")
            .option("chunk_days", "45")
            .option("mode", "offline-demo")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_stream()
    got = spark.read.parquet(out)
    want = (
        spark.read.format("timecamp")
        .option("dataset", "entries")
        .option("from", "2025-01-01")
        .option("to", "2025-06-30")
        .option("mode", "offline-demo")
        .load()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0

    # restart on the same checkpoint: fully caught up -> nothing re-emitted
    n_before = got.count()
    run_stream()
    assert spark.read.parquet(out).count() == n_before


def test_activities_source_matches_builder(registered):
    """format('timecamp') computer_activities == build_computer_activities
    row-for-row on the demo workspace, fetched through the per-user ×
    date-chunk partition grid."""
    from good_enough_timecamp_data_pipeline_spark.sources.client import TimeCampClient
    from good_enough_timecamp_data_pipeline_spark.sources.fixtures import (
        demo_transport,
    )
    from good_enough_timecamp_data_pipeline_spark.sources.ingest import (
        build_computer_activities,
    )

    spark = registered
    via_source = (
        spark.read.format("timecamp")
        .option("dataset", "computer_activities")
        .option("from", "2026-01-05")
        .option("to", "2026-01-06")
        .option("user_ids", "101,102")
        .option("mode", "offline-demo")
        .load()
    )
    via_builder = build_computer_activities(
        spark,
        TimeCampClient(demo_transport()),
        ["2026-01-05", "2026-01-06"],
        user_ids=[101, 102],
    )
    assert via_source.schema == via_builder.schema
    rows_s = sorted(map(tuple, via_source.collect()), key=str)
    rows_b = sorted(map(tuple, via_builder.collect()), key=str)
    assert rows_s == rows_b and rows_s


def test_activities_partition_grid(registered):
    """The user × ≤dates_per_request grid IS the partitioning: 2 users ×
    25 dates at 20 dates/request → 2 × 2 = 4 input partitions."""
    df = (
        registered.read.format("timecamp")
        .option("dataset", "computer_activities")
        .option("from", "2026-01-01")
        .option("to", "2026-01-25")
        .option("user_ids", "101,102")
        .option("dates_per_request", "20")
        .option("mode", "offline-demo")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    # no user list → one date axis only
    df1 = (
        registered.read.format("timecamp")
        .option("dataset", "computer_activities")
        .option("from", "2026-01-01")
        .option("to", "2026-01-25")
        .option("dates_per_request", "20")
        .option("mode", "offline-demo")
        .load()
    )
    assert df1.rdd.getNumPartitions() == 2


def test_application_names_source_matches_builder(registered):
    """format('timecamp') application_names == build_application_names
    (P2 rename, F4 fallback, J3 category lookup) on the demo workspace."""
    from good_enough_timecamp_data_pipeline_spark.sources.client import TimeCampClient
    from good_enough_timecamp_data_pipeline_spark.sources.fixtures import (
        demo_transport,
    )
    from good_enough_timecamp_data_pipeline_spark.sources.ingest import (
        build_application_names,
        build_computer_activities,
    )

    spark = registered
    client = TimeCampClient(demo_transport())
    acts = build_computer_activities(
        spark, client, ["2026-01-05", "2026-01-06"]
    )
    via_builder = build_application_names(spark, client, acts)
    via_source = (
        spark.read.format("timecamp")
        .option("dataset", "application_names")
        .option("application_ids", "501,502")
        .option("mode", "offline-demo")
        .load()
    )
    # landed schema nullability differs (the builder's coalesce-with-
    # literal columns are provably non-null); names and types must match
    assert [(f.name, f.dataType) for f in via_source.schema.fields] == [
        (f.name, f.dataType) for f in via_builder.schema.fields
    ]
    rows_s = sorted(map(tuple, via_source.collect()), key=str)
    rows_b = sorted(map(tuple, via_builder.collect()), key=str)
    assert rows_s == rows_b and rows_s


def test_streaming_activities_source_incremental_sync(registered, tmp_path):
    """readStream dataset=computer_activities: the bounded backfill
    drains in date-window micro-batches to exactly the batch-reader
    result, and a checkpoint restart re-emits nothing (the reference's
    activities cron re-sync, dlt_fetch_timecamp.py:194-237, as a native
    stream)."""
    spark = registered
    out = str(tmp_path / "act_out")
    ckpt = str(tmp_path / "act_ckpt")

    def run_stream():
        q = (
            spark.readStream.format("timecamp")
            .option("dataset", "computer_activities")
            .option("from", "2026-01-01")
            .option("to", "2026-01-08")
            .option("chunk_days", "4")
            .option("user_ids", "101,102")
            .option("mode", "offline-demo")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    for _ in range(4):  # one micro-batch per start() + drain margin
        run_stream()
    got = spark.read.parquet(out)
    want = (
        spark.read.format("timecamp")
        .option("dataset", "computer_activities")
        .option("from", "2026-01-01")
        .option("to", "2026-01-08")
        .option("user_ids", "101,102")
        .option("mode", "offline-demo")
        .load()
    )
    assert got.schema == want.schema
    got_rows = sorted(map(tuple, got.collect()), key=str)
    want_rows = sorted(map(tuple, want.collect()), key=str)
    assert got_rows == want_rows and got_rows

    # restart on the same checkpoint: caught up -> nothing re-emitted
    n_before = len(got_rows)
    run_stream()
    assert spark.read.parquet(out).count() == n_before


@pytest.mark.slow_e2e
def test_streaming_activities_source_crash_mid_batch(registered, tmp_path):
    """The entries crash-replay contract holds for the activities
    stream: a writer crash after PARTIAL side effects replays the same
    date window (readBetweenOffsets), and an epoch-keyed idempotent
    sink converges to exactly-once."""
    spark = registered
    out = str(tmp_path / "act_crash_out")
    ckpt = str(tmp_path / "act_crash_ckpt")
    crashed = {"done": False}
    seen_epochs: list[int] = []

    def epoch_writer(crash_on: int | None):
        def write(df, epoch_id):
            rows = df.collect()
            seen_epochs.append(epoch_id)
            target = f"{out}/epoch={epoch_id}"
            if crash_on == epoch_id and not crashed["done"]:
                crashed["done"] = True
                df.sparkSession.createDataFrame(
                    rows[: len(rows) // 2], df.schema
                ).write.mode("overwrite").parquet(target)
                raise RuntimeError("injected crash mid-batch")
            df.sparkSession.createDataFrame(rows, df.schema).write.mode(
                "overwrite"
            ).parquet(target)

        return write

    def run_once(crash_on=None) -> bool:
        q = (
            spark.readStream.format("timecamp")
            .option("dataset", "computer_activities")
            .option("from", "2026-01-01")
            .option("to", "2026-01-08")
            .option("chunk_days", "4")
            .option("user_ids", "101,102")
            .option("mode", "offline-demo")
            .load()
            .writeStream.foreachBatch(epoch_writer(crash_on))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        except Exception:
            return False
        finally:
            q.stop()
        return q.exception() is None

    assert run_once()  # epoch 0 (2026-01-01..04, empty window) lands
    # epoch 1 covers 2026-01-05..08 — the window with all demo activity
    # rows; crash it after partial writes
    assert not run_once(crash_on=1), "the injected crash must fail the run"
    assert crashed["done"]
    for _ in range(4):  # recovery + drain
        run_once()

    assert seen_epochs.count(1) >= 2  # the crashed window was replayed
    got = spark.read.option("basePath", out).parquet(out)
    want = (
        spark.read.format("timecamp")
        .option("dataset", "computer_activities")
        .option("from", "2026-01-01")
        .option("to", "2026-01-08")
        .option("user_ids", "101,102")
        .option("mode", "offline-demo")
        .load()
    )
    got_rows = sorted(map(tuple, got.drop("epoch").collect()), key=str)
    want_rows = sorted(map(tuple, want.collect()), key=str)
    assert got_rows == want_rows and len(got_rows) >= 3


@pytest.mark.slow_e2e
def test_streaming_entries_source_crash_mid_batch(registered, tmp_path):
    """Checkpoint resume after a CRASH, not a clean stop: the writer
    dies partway through one micro-batch (offsets WAL already holds the
    batch's window, PARTIAL side effects on disk), the restarted query
    replays exactly that window (readBetweenOffsets recovery path), and
    an epoch-keyed idempotent sink (the documented foreachBatch
    pattern) converges to exactly-once — no duplicated and no lost
    dates. The Python streaming source runs one micro-batch per
    start() (AvailableNow falls back to single-batch), so the sync
    loop below IS the reference's cron shape."""
    spark = registered
    out = str(tmp_path / "crash_out")
    ckpt = str(tmp_path / "crash_ckpt")
    crashed = {"done": False}
    seen_epochs: list[int] = []

    def epoch_writer(crash_on: int | None):
        def write(df, epoch_id):
            rows = df.collect()
            seen_epochs.append(epoch_id)
            target = f"{out}/epoch={epoch_id}"
            if crash_on == epoch_id and not crashed["done"]:
                crashed["done"] = True
                # land PARTIAL side effects (half the rows), then die
                df.sparkSession.createDataFrame(
                    rows[: len(rows) // 2], df.schema
                ).write.mode("overwrite").parquet(target)
                raise RuntimeError("injected crash mid-batch")
            # idempotent by epoch: replay OVERWRITES the partial artifact
            df.sparkSession.createDataFrame(rows, df.schema).write.mode(
                "overwrite"
            ).parquet(target)

        return write

    def run_once(crash_on=None) -> bool:
        """One micro-batch; returns False when the run errored."""
        q = (
            spark.readStream.format("timecamp")
            .option("dataset", "entries")
            .option("from", "2025-01-01")
            .option("to", "2025-07-31")
            .option("chunk_days", "40")
            .option("mode", "offline-demo")
            .load()
            .writeStream.foreachBatch(epoch_writer(crash_on))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        except Exception:
            return False
        finally:
            q.stop()
        return q.exception() is None

    assert run_once()  # epoch 0 lands cleanly (2025-01 chunk)
    assert not run_once(crash_on=1), "the injected crash must fail the run"
    assert crashed["done"]
    for _ in range(8):  # recovery + drain the remaining chunks
        run_once()

    # the crashed epoch was REPLAYED over the same window: epoch 1 ran
    # at least twice, and the final artifact equals the batch result —
    # no duplicated and no lost entries despite the partial write
    assert seen_epochs.count(1) >= 2
    got = spark.read.option("basePath", out).parquet(out)
    want = (
        spark.read.format("timecamp")
        .option("dataset", "entries")
        .option("from", "2025-01-01")
        .option("to", "2025-07-31")
        .option("mode", "offline-demo")
        .load()
    )
    got_rows = sorted(map(tuple, got.drop("epoch").collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows and len(got_rows) >= 3
