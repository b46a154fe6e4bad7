"""Invariant tests for the multi-way-join warehouse queries
(plans/warehouse.py); oracle equality is covered by the driver gate."""

from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.plans import warehouse
from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table


def test_q3_topk_order_and_segment_filter(spark, sf_dir):
    rows = warehouse.q_shipping_priority(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue_cents for r in rows]
    assert revs == sorted(revs, reverse=True)
    # every listed order belongs to the filtered segment and date range
    orders = load_table(spark, sf_dir, "orders")
    keys = [r.l_orderkey for r in rows]
    segs = (
        orders.filter(F.col("o_orderkey").isin(keys))
        .select("o_custkey", "o_orderdate")
        .collect()
    )
    assert all(s.o_custkey % 5 == warehouse.Q3_SEGMENT_MOD for s in segs)
    assert all(str(s.o_orderdate) < warehouse.Q3_CUTOFF for s in segs)


def test_q5_same_nation_revenue_consistency(spark, sf_dir):
    rows = warehouse.q_local_supplier_volume(spark, sf_dir).collect()
    assert rows
    assert all(r.revenue_cents > 0 and r.n_lineitems > 0 for r in rows)
    # nations listed at most once, grouped under their own region
    assert len({r.n_name for r in rows}) == len(rows)


def test_attribution_partitions_purchases(spark, sf_dir):
    rows = warehouse.e_attribution(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r.n_purchases for r in rows) == n_purchases
    # a purchase can never credit another purchase
    assert all(r.touch_type != "purchase" for r in rows)
    # revenue conservation in integer cents
    total = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")))
        .collect()[0][0]
    )
    assert sum(r.revenue_cents for r in rows) == total


def test_markov_rows_partition_and_shares(spark, sf_dir):
    rows = warehouse.e_markov_transitions(spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every event except each user's last contributes exactly one transition
    assert sum(r.n for r in rows) == n_events - n_users
    # per-prev shares sum to ~1e6 (integer-ppm floor loses < n_types ppm)
    from collections import defaultdict

    per_prev = defaultdict(int)
    for r in rows:
        assert 0 <= r.share_ppm <= 1_000_000
        per_prev[r.prev_type] += r.share_ppm
    assert all(1_000_000 - 10 <= s <= 1_000_000 for s in per_prev.values())


def test_gini_bounds_and_reference(spark, sf_dir):
    row = warehouse.a_gini(spark, sf_dir).collect()[0]
    assert 0.0 <= row.gini < 1.0
    # sequential reference on the same integer cents
    import math

    o = load_table(spark, sf_dir, "orders")
    rev = sorted(
        (r.x, r.o_custkey)
        for r in o.groupBy("o_custkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("x"))
        .collect()
    )
    n = len(rev)
    s = sum(x for x, _ in rev)
    rw = sum(i * x for i, (x, _) in enumerate(rev, start=1))
    expect = round((2.0 * float(rw)) / (float(n) * float(s)) - float(n + 1) / n, 6)
    assert row.gini == expect and row.n_customers == n and row.sum_cents == s
