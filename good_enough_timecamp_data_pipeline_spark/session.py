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


def tiny_partitions(cpus: int | None = None) -> int:
    """Shuffle-partition count for the sub-2-GiB tier, proportional to
    the core count (cores / 4, floor 2). 8 at the default 32 cores — the
    value every r8-r15 A/B measured optimal there — and scaled down with
    fewer cores so per-task launch overhead stays amortized the same way
    AND the driver's low-core scaling probe actually sees fewer-way
    parallelism (r15 VERDICT item 1: a literal 8 made the 8-vs-32-core
    comparison degenerate to ≈1 everywhere)."""
    return max(2, (cpus if cpus is not None else DEFAULT_CPUS) // 4)


def tuned_conf_for(sf_dir: str) -> dict[str, str]:
    """Runtime-settable session conf sized to the data actually under
    ``sf_dir`` — what spark-submit flags do on a real cluster, derived
    here from the local input size so harnesses (bench, oracle check,
    baseline compare) run the configuration an engineer would ship for
    that scale instead of one fixed local default:

    - **< 2 GiB input** (the local testdata SFs): ``cores / 4`` shuffle
      partitions (8 on the default 32-core session — the r8-r15 measured
      optimum) and AQE off. Sub-GiB shuffles fit one task; with 32
      partitions the per-task launch overhead dominates, and AQE's
      per-stage barrier + re-plan round-trip (~60-80 ms/stage measured
      at sf0.1, see tools/profile_constant.py) buys nothing when the
      static plan is already the right one. Every AQE benefit
      (coalescing, skew splits) targets shuffles orders of magnitude
      bigger than the whole input. The partition count DERIVES from
      ``$SPARK_GRAFT_CPUS`` rather than pinning the literal 8 (r15
      VERDICT item 1): the per-task-overhead argument that sizes 8
      partitions for 32 cores sizes 2 for 8 cores, and a count
      proportional to cores is what makes the driver's low-vs-high-core
      scaling probe measure parallelism instead of reading ≈1 on every
      query (both core counts executing the same 8-task schedule).
    - **2-64 GiB**: 2 partitions/core, AQE on with coalescing — enough
      parallelism to keep cores busy, AQE trims the excess.
    - **>= 64 GiB** (cluster scale): leave the get_spark defaults (AQE
      on, skew-join on); the exact partition count stops mattering
      because AQE re-derives it from runtime map statistics.

    Correctness never depends on these (the driver runs our queries
    under its own session); they only set the speed/overhead trade-off.
    """
    try:
        total = 0
        for entry in os.scandir(sf_dir):
            if entry.is_file():
                total += entry.stat().st_size
            elif entry.is_dir():
                for sub in os.scandir(entry.path):
                    if sub.is_file():
                        total += sub.stat().st_size
    except OSError:
        return {}
    gib = 1024**3
    if total < 2 * gib:
        conf = {
            "spark.sql.shuffle.partitions": str(tiny_partitions()),
            "spark.sql.adaptive.enabled": "false",
        }
        if total < 64 * 1024**2:
            # Whole-stage codegen trades a per-novel-plan Janino compile
            # (~0.1-1 s) for faster per-row execution — a win from the
            # first tens of MB of hot data per query, pure overhead
            # below that. One-shot queries over the tiny local SFs never
            # amortize the compile: measured across a 40-twin sample at
            # sf0.1 (17 MiB), codegen-off ran 27% faster (24.5 s vs
            # 33.6 s). At the synthesized sf1 (167 MiB) the balance
            # flips — per-row interpreted eval over 10× the tokens costs
            # more than the compile (t_ccnet_buckets 8.4 s interpreted
            # vs 4.6 s compiled) — so codegen stays ON from 64 MiB up
            # (the cutoff sits between the two measured points).
            # Expression-level codegen still applies below the cutoff,
            # and entries whose kernels amortize even at sf0.1
            # (measured) opt back in via catalog.QUERY_CONF.
            conf["spark.sql.codegen.wholeStage"] = "false"
        return conf
    if total < 64 * gib:
        return {
            "spark.sql.shuffle.partitions": str(2 * DEFAULT_CPUS),
            "spark.sql.adaptive.enabled": "true",
        }
    return {}


def apply_tuned_conf(spark: SparkSession, sf_dir: str) -> None:
    """Apply ``tuned_conf_for`` to a live session (all keys are
    runtime-settable). Respects an explicit $SPARK_GRAFT_AQE override."""
    conf = tuned_conf_for(sf_dir)
    if os.environ.get("SPARK_GRAFT_AQE"):
        conf.pop("spark.sql.adaptive.enabled", None)
    for k, v in conf.items():
        spark.conf.set(k, v)


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
