"""Unit tests for the distributed global-ordering operator
(operators/order.py): exactness vs a driver-side sort, and the plan shape
that motivates it (no window over the full unpartitioned input)."""

from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.operators.order import (
    global_cumsum,
    global_row_number,
    long_range_bucket,
    md5_prefix_bucket,
)


def _sample(spark, n=5000):
    return (
        spark.range(n)
        .withColumn("v", (F.col("id") * 7 % 13 + 1).cast("long"))
        .withColumn("__k", F.md5(F.col("id").cast("string")))
    )


def test_global_row_number_matches_sorted_order(spark):
    df = _sample(spark)
    got = global_row_number(
        df, F.col("__k"), md5_prefix_bucket(F.col("__k")), out="rn"
    ).collect()
    expect = {
        r["__k"]: i + 1
        for i, r in enumerate(sorted(got, key=lambda r: r["__k"]))
    }
    assert all(r["rn"] == expect[r["__k"]] for r in got)


def test_global_cumsum_matches_sequential_fold(spark):
    df = _sample(spark, 3000)
    got = sorted(
        global_cumsum(
            df, F.col("__k"), F.col("v"), md5_prefix_bucket(F.col("__k")), out="cum"
        ).collect(),
        key=lambda r: r["__k"],
    )
    acc = 0
    for r in got:
        acc += r["v"]
        assert r["cum"] == acc


def test_long_range_bucket_is_monotone(spark):
    df = spark.range(0, 10_000, 3).withColumn("k", F.col("id") * 2 + 5)
    b = long_range_bucket(df, F.col("k"), n_buckets=32)
    rows = df.select("k", b.alias("b")).collect()
    srt = sorted(rows, key=lambda r: r["k"])
    assert all(a["b"] <= c["b"] for a, c in zip(srt, srt[1:]))
    assert len({r["b"] for r in rows}) > 16  # actually spreads out


def test_fact_side_window_is_bucket_partitioned(spark):
    df = _sample(spark)
    out = global_row_number(df, F.col("__k"), md5_prefix_bucket(F.col("__k")))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window over the fact carries a partition spec on the bucket;
    # the only unpartitioned window runs over the <=256-row totals side
    for line in plan.splitlines():
        if "windowspecdefinition(" in line and "__b" not in line.split(
            "windowspecdefinition(", 1
        )[1].split(")", 1)[0]:
            raise AssertionError(f"unpartitioned fact window: {line}")


def test_long_range_bucket_empty_input(spark):
    df = spark.range(0).withColumn("k", F.col("id"))
    b = long_range_bucket(df, F.col("k"))
    assert global_row_number(df, F.col("k"), b).count() == 0


def test_long_range_bucket_non_numeric_key_fails_fast(spark):
    import pytest

    df = spark.range(5).withColumn("k", F.md5(F.col("id").cast("string")))
    with pytest.raises(TypeError, match="numeric key"):
        long_range_bucket(df, F.col("k"))


def test_grand_totals_out_param(spark):
    df = _sample(spark, 2000)
    gt: dict = {}
    global_cumsum(
        df,
        F.col("__k"),
        F.col("v"),
        md5_prefix_bucket(F.col("__k")),
        out="cum",
        grand_totals=gt,
    )
    expect = df.agg(F.sum("v")).collect()[0][0]
    assert gt == {"cum": expect}


def test_grand_totals_double_type(spark):
    df = _sample(spark, 500).withColumn("d", F.col("v") * 0.5)
    gt: dict = {}
    got = global_cumsum(
        df,
        F.col("__k"),
        F.col("d"),
        md5_prefix_bucket(F.col("__k")),
        out="cum",
        grand_totals=gt,
    )
    assert isinstance(gt["cum"], float) and gt["cum"] > 0
    # offsets stay double-typed end to end (createDataFrame coercion)
    assert dict(got.dtypes)["cum"] == "bigint"  # output contract: cast long


def test_pin_with_range_bucket_one_action_and_monotone(spark):
    from good_enough_timecamp_data_pipeline_spark.operators.order import (
        pin_with_range_bucket,
    )

    df = spark.range(0, 5000, 7).withColumn("k", F.col("id") + 100)
    pinned, bucket = pin_with_range_bucket(df, F.col("k"), n_buckets=16)
    try:
        assert pinned.storageLevel.useMemory  # persisted by the helper
        rows = pinned.select("k", bucket.alias("b")).collect()
        srt = sorted(rows, key=lambda r: r["k"])
        assert all(a["b"] <= c["b"] for a, c in zip(srt, srt[1:]))
        assert len({r["b"] for r in rows}) > 8
    finally:
        pinned.unpersist()


def test_pin_with_range_bucket_empty_input(spark):
    from good_enough_timecamp_data_pipeline_spark.operators.order import (
        pin_with_range_bucket,
    )

    df = spark.range(0).withColumn("k", F.col("id"))
    pinned, bucket = pin_with_range_bucket(df, F.col("k"))
    try:
        assert pinned.select(bucket.alias("b")).count() == 0
    finally:
        pinned.unpersist()
