"""SparkSession builder.

One place to construct a session so every entry point (driver contract,
tests, bench) agrees on the configs that matter for correctness and scale:

- ``spark.sql.session.timeZone=UTC`` — DuckDB oracle comparisons require
  TZ-stable timestamps.
- AQE on (coalesce partitions, skew join) — at 100 TB the static plan is
  never right; AQE re-plans joins/partition counts from runtime stats.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster this is overridden (AQE coalescing makes the exact number
  less critical).
- Arrow enabled — every pandas_udf / createDataFrame(pandas) transfer is
  Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "good_enough_timecamp_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    On a real cluster, ``master`` comes from spark-submit and the builder
    leaves it alone; locally we default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")

    n_shuffle = shuffle_partitions or DEFAULT_CPUS
    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(n_shuffle),
        "spark.sql.adaptive.enabled": os.environ.get("SPARK_GRAFT_AQE", "true"),
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        "spark.ui.enabled": "false",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # testdata events.parquet carries TIMESTAMP(NANOS) which the parquet
        # reader rejects by default; read as long and convert (plans/testdata)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
