"""Semantic invariants of the round-2 analytics queries (plans/analytics.py).

The DuckDB oracle gate checks value parity; these tests pin the *meaning*:
funnel monotonicity, retention day-0 identity, SCD2 interval contiguity,
NTILE bucket balance, DQ rule accounting — properties that would silently
survive a both-sides-wrong oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.plans import analytics


def test_funnel_monotonic(spark, sf_dir):
    rows = {r["stage"]: r["n_users"] for r in analytics.e_funnel_stages(spark, sf_dir).collect()}
    assert set(rows) == {"1_view", "2_click_after_view", "3_purchase_after_click"}
    assert rows["1_view"] >= rows["2_click_after_view"] >= rows["3_purchase_after_click"]
    assert rows["1_view"] > 0


def test_retention_day0_is_cohort_size(spark, sf_dir):
    ret = analytics.e_retention_cohorts(spark, sf_dir)
    # day 0 per cohort must equal the cohort's size (every user is active
    # on their own first-seen day, by definition)
    day0 = ret.filter(F.col("day_offset") == 0)
    from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table

    events = load_table(spark, sf_dir, "events")
    cohort_sizes = (
        events.groupBy("user_id")
        .agg(F.to_date(F.min("ts")).alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.countDistinct("user_id").alias("n"))
    )
    joined = day0.join(cohort_sizes, "cohort_day")
    assert joined.filter(F.col("n_users") != F.col("n")).count() == 0
    assert ret.filter(F.col("day_offset") < 0).count() == 0


def test_scd2_intervals_contiguous(spark, sf_dir):
    scd = analytics.j_scd2_dim(spark, sf_dir)
    # within a user, valid_from of version k+1 == valid_to of version k,
    # and only the last version is open-ended
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    chk = scd.withColumn("next_from", F.lead("valid_from").over(w))
    # closed versions point exactly at the next version's start
    broken = chk.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    )
    assert broken.count() == 0
    open_ended = chk.filter(F.col("valid_to").isNull())
    assert open_ended.filter(F.col("next_from").isNotNull()).count() == 0
    # no consecutive duplicate attribute values
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    dups = scd.withColumn("prev_type", F.lag("event_type").over(w2)).filter(
        F.col("prev_type") == F.col("event_type")
    )
    assert dups.count() == 0


def test_ntile_buckets_balanced(spark, sf_dir):
    q = analytics.w_ntile_quartiles(spark, sf_dir)
    per = (
        q.groupBy("c_nationkey", "quartile")
        .count()
        .groupBy("c_nationkey")
        .agg(
            (F.max("count") - F.min("count")).alias("spread"),
            F.countDistinct("quartile").alias("n_buckets"),
        )
        .collect()
    )
    for r in per:
        assert r["spread"] <= 1  # NTILE buckets differ by at most one row
        assert r["n_buckets"] <= 4


def test_dq_violations_accounting(spark, sf_dir):
    rows = analytics.d_dq_violations(spark, sf_dir).collect()
    rules = {r["rule"]: r for r in rows}
    assert set(rules) == {"null_key", "price_range", "status_domain", "fk_customer"}
    n_rows = {r["n_rows"] for r in rows}
    assert len(n_rows) == 1  # every rule reports against the same row count
    for r in rows:
        assert 0 <= r["n_violations"] <= r["n_rows"]


def test_rolling_7d_bounds(spark, sf_dir):
    df = analytics.w_rolling_7d(spark, sf_dir)
    # rolling sum always includes the current row, never less
    bad = df.filter(
        (F.col("rolling_cents") < F.col("cents")) | (F.col("rolling_orders") < 1)
    )
    assert bad.count() == 0


def test_scrub_pii_masks_everything(spark, sf_dir):
    df = analytics.t_scrub_pii(spark, sf_dir)
    leaked = df.filter(
        F.col("clean_text").rlike(analytics._EMAIL_RE)
        | F.col("clean_text").contains("http://")
    )
    assert leaked.count() == 0
    assert df.filter((F.col("n_emails") < 1) | (F.col("n_urls") < 1)).count() == 0


def test_topk_tokens_sorted(spark, sf_dir):
    rows = analytics.t_topk_tokens(spark, sf_dir).collect()
    assert len(rows) == 20
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_grouped_list_sorted(spark, sf_dir):
    rows = analytics.x_grouped_list(spark, sf_dir).collect()
    for r in rows:
        parts = r["nations"].split("|")
        assert parts == sorted(parts)
        assert len(parts) == r["n_nations"]


def test_scd2_lookup_total_and_currency(spark, sf_dir):
    """Every probe resolves to exactly one version (intervals partition the
    timeline from the user's first change on), and a probe later than the
    user's last change resolves to the current (NULL valid_to) row."""
    from pyspark.sql import functions as F

    from good_enough_timecamp_data_pipeline_spark.plans import analytics
    from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table

    out = analytics.j_scd2_lookup(spark, sf_dir)
    n_probes = (
        load_table(spark, sf_dir, "events").filter("event_id % 7 = 0").count()
    )
    rows = out.collect()
    assert len(rows) == n_probes  # one version per probe, no fan-out
    assert all(r["version_type"] is not None for r in rows)
    # probes past each user's final event must hit the current version
    ev = load_table(spark, sf_dir, "events")
    last = ev.groupBy("user_id").agg(F.max("ts").alias("mx"))
    tail_hits = (
        out.join(last, "user_id")
        .filter(F.col("probe_ts") > F.col("mx"))
        .filter(F.col("is_current") != 1)
    )
    assert tail_hits.count() == 0


def test_windowed_funnel_tighter_than_ordered(spark, sf_dir):
    """The 1h-window funnel can never convert MORE anchors than views, and
    monotonically shrinks stage over stage."""
    from good_enough_timecamp_data_pipeline_spark.plans import analytics

    rows = {
        r["stage"]: r["n"]
        for r in analytics.e_windowed_funnel(spark, sf_dir).collect()
    }
    assert set(rows) == {"1_views", "2_click_within_1h", "3_purchase_within_1h"}
    assert rows["1_views"] >= rows["2_click_within_1h"] >= rows["3_purchase_within_1h"]
    assert rows["2_click_within_1h"] > 0  # testdata has dense per-user traffic
