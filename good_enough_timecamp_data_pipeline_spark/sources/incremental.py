"""Incremental-refresh patterns (SURVEY §2.1 S12/S13, §2.10).

The reference fakes incrementality with two JSON file caches; both map to
standard Spark batch patterns that actually scale:

- **Immutable-past facts** (activities cache, ``/root/reference/
  dlt_fetch_timecamp.py:194-302``): days older than ``horizon_days`` are
  never refetched; recent days always are. Spark-native: a date-partitioned
  table + *dynamic partition overwrite* — writing only the refreshed date
  partitions replaces exactly those directories and leaves the immutable
  past untouched. The 7-day horizon is the batch twin of a 7-day watermark.

- **Grow-only dimension** (applications cache, ``/root/reference/
  common/api.py:362-425``): fetch only ids we have never seen. Spark-native:
  left-anti join the needed ids against the existing dim, fetch the misses,
  append. No driver-side id set, so it holds at any dim size.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CACHE_HORIZON_DAYS = 7  # reference CACHE_THRESHOLD_DAYS (dlt_fetch_timecamp.py:195)


def split_recent(
    df: DataFrame, date_col: str = "end_date", horizon_days: int = CACHE_HORIZON_DAYS
) -> DataFrame:
    """P11: tag rows as refetchable-recent vs immutable-past."""
    return df.withColumn(
        "_recent", F.col(date_col) >= F.date_sub(F.current_date(), horizon_days)
    )


def overwrite_recent_partitions(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    date_col: str = "end_date",
) -> None:
    """Write refreshed rows into a date-partitioned table, replacing ONLY
    the partitions present in ``new_rows`` (dynamic partition overwrite).

    First write bootstraps the table. ``partitionOverwriteMode=dynamic`` is
    set per-write via option so the session default stays untouched.
    """
    (
        new_rows.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(date_col)
        .parquet(path)
    )


def refresh_activities(
    spark: SparkSession,
    path: str,
    fetch_dates: Callable[[list[str]], DataFrame],
    requested_dates: list[str],
    horizon_days: int = CACHE_HORIZON_DAYS,
) -> DataFrame:
    """S12 end-to-end: serve old dates from the landed table, refetch only
    recent/missing ones, then dynamically overwrite those partitions.

    Returns the full up-to-date table for the requested dates.
    """
    import datetime

    today = datetime.date.today()
    threshold = today - datetime.timedelta(days=horizon_days)

    existing_dates: set[str] = set()
    if _exists(spark, path):
        existing = spark.read.parquet(path)
        existing_dates = {
            str(r[0]) for r in existing.select("end_date").distinct().collect()
        }

    to_fetch = [
        d
        for d in requested_dates
        if datetime.date.fromisoformat(d) >= threshold or d not in existing_dates
    ]
    if to_fetch:
        fresh = fetch_dates(to_fetch)
        if fresh.take(1):
            overwrite_recent_partitions(spark, fresh, path, "end_date")

    table = spark.read.parquet(path)
    return table.filter(F.col("end_date").isin(requested_dates))


def grow_only_dim(
    spark: SparkSession,
    path: str,
    needed_ids: DataFrame,
    fetch_missing: Callable[[list[str]], DataFrame],
    id_col: str = "application_id",
) -> DataFrame:
    """S13: anti-join to find never-seen ids, fetch just those, append.

    ``needed_ids`` is a one-column DataFrame of ids in need; returns the
    full refreshed dimension.

    The missing-id set is computed distributed (anti-join); only the
    never-seen ids are then streamed to the driver in bounded chunks via
    ``toLocalIterator`` — one partition in driver memory at a time, never
    the whole dim — because ``fetch_missing`` is by contract a driver-side
    API call that needs a concrete id list. Steady-state (few or no new
    ids) moves ~nothing.
    """
    if _exists(spark, path):
        existing = spark.read.parquet(path)
        missing = needed_ids.join(existing.select(id_col), id_col, "left_anti")
    else:
        existing = None
        missing = needed_ids

    # chunked driver fetch: each chunk is fetched + appended independently,
    # so driver memory is O(chunk), not O(missing ids)
    chunk_size = 10_000
    chunk: list[str] = []
    for row in missing.select(id_col).distinct().toLocalIterator():
        chunk.append(str(row[0]))
        if len(chunk) >= chunk_size:
            fetch_missing(sorted(chunk)).write.mode("append").parquet(path)
            chunk = []
    if chunk:
        fetch_missing(sorted(chunk)).write.mode("append").parquet(path)
    return spark.read.parquet(path)


def _exists(spark: SparkSession, path: str) -> bool:
    if "://" not in path:
        return os.path.exists(path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    return bool(fs.exists(jvm_path))


def incremental_task_totals(
    closure: DataFrame, entries_delta: DataFrame, state: DataFrame | None = None
) -> DataFrame:
    """Incrementally maintain the flagship report's per-ancestor totals:
    aggregate ONLY the arriving entries batch through the closure
    (O(delta) — the broadcast-closure join + hash-agg shape of
    plans/reports.py), then merge with the persisted state by summing.
    SUM is the merge operator, so corrections arrive as negative-duration
    rows and cancel exactly; history is never rescanned.

    This extends the reference's incremental FETCH patterns (S12/S13
    above — dlt_fetch_timecamp.py:194-217's immutable-past horizon) to
    the QUERY surface: at 100 TB the daily report costs the day's batch,
    not six years of entries. Equality with the full recompute (both
    halves + a retraction round-trip) is pinned in
    tests/test_sources.py::test_incremental_task_totals*.
    """
    delta_agg = (
        entries_delta.join(
            F.broadcast(closure),
            entries_delta["task_id"] == closure["descendant_id"],
        )
        .groupBy("ancestor_id")
        .agg(F.sum("duration").alias("cumulative_seconds"))
    )
    if state is None:
        return delta_agg
    return (
        state.unionByName(delta_agg)
        .groupBy("ancestor_id")
        .agg(F.sum("cumulative_seconds").alias("cumulative_seconds"))
    )
