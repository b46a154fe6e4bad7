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


def test_nation_trade_bilateral_reconciles(spark):
    """Hand-built 2-nation workspace: revenue must land in the right
    (supp_nation, cust_nation, year) cell and both directions appear."""
    import good_enough_timecamp_data_pipeline_spark.plans.warehouse as m

    nation = spark.createDataFrame(
        [(1, "NATION_1"), (2, "NATION_2"), (3, "NATION_3")],
        "n_nationkey long, n_name string",
    )
    supp = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "s_suppkey long, s_nationkey long"
    )
    cust = spark.createDataFrame(
        [(20, 1), (21, 2)], "c_custkey long, c_nationkey long"
    )
    orders = spark.createDataFrame(
        [(100, 20), (101, 21)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [
            # (orderkey, suppkey, shipdate, price, discount)
            (100, 11, "1995-06-01", 100.0, 0.1),  # N2 supp -> N1 cust: 9000 cents
            (101, 10, "1995-07-01", 200.0, 0.0),  # N1 supp -> N2 cust: 20000 cents
            (101, 11, "1995-07-02", 50.0, 0.0),   # N2 supp -> N2 cust: same-nation, excluded
            (100, 12, "1995-08-01", 70.0, 0.0),   # N3 supp: outside the pair, excluded
        ],
        "l_orderkey long, l_suppkey long, ship string, l_extendedprice double, l_discount double",
    ).select("l_orderkey", "l_suppkey", F.col("ship").cast("timestamp").alias("l_shipdate"),
             "l_extendedprice", "l_discount")
    tables = {"nation": nation, "supplier": supp, "customer": cust,
              "orders": orders, "lineitem": li}
    orig = m.load_table
    try:
        m.load_table = lambda spark, sf_dir, name: tables[name]
        rows = {(r.supp_nation, r.cust_nation, r.l_year): r for r in
                m.q_nation_trade(spark, "unused").collect()}
    finally:
        m.load_table = orig
    assert set(rows) == {("NATION_2", "NATION_1", 1995), ("NATION_1", "NATION_2", 1995)}
    assert rows[("NATION_2", "NATION_1", 1995)].revenue_cents == 9000
    assert rows[("NATION_1", "NATION_2", 1995)].revenue_cents == 20000


def test_benford_distribution_properties(spark, sf_dir):
    import math

    rows = warehouse.a_benford(spark, sf_dir).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.expected == math.log10(1 + 1 / r.digit)
        assert r.abs_dev == abs(r.share - r.expected)
    # counts reconcile with a direct digit count
    import pandas as pd

    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    import collections

    ref = collections.Counter(
        int(str(int(math.floor(p * 100)))[0]) for p in o.o_totalprice if math.floor(p * 100) > 0
    )
    assert {r.digit: r.n for r in rows} == dict(ref)


def test_gini_driver_tier_matches_distributed(spark, sf_dir, monkeypatch):
    """a_gini's driver tier (customer dim fits the footer cap — the
    default everywhere dims stay dimension-sized) must be value-identical
    to the distributed rank tier (forced by zeroing the cap)."""
    fast = warehouse.a_gini(spark, sf_dir).collect()[0]
    monkeypatch.setattr(warehouse, "_GINI_DRIVER_MAX_ROWS", 0)
    slow = warehouse.a_gini(spark, sf_dir).collect()[0]
    assert tuple(fast) == tuple(slow)
    assert fast["n_customers"] > 0
