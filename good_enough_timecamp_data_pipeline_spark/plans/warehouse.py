"""Multi-way-join warehouse analytics (TPC-H-shaped) + event attribution.

The reference's reports are 2-3-way star joins over its own fact
(SAMPLE-REPORTS.md); these queries exercise the relational core the way a
warehouse actually does — 3-to-6-way joins where join ORDER and build-side
choice decide the runtime, left entirely to Catalyst/AQE (no hints except
provably-dimension broadcasts):

- ``q_shipping_priority`` (TPC-H Q3 shape): selective dim filter →
  fact join → grouped top-k.
- ``q_local_supplier_volume`` (TPC-H Q5 shape): 6-way snowflake with a
  same-nation join predicate BETWEEN two dimension branches.
- ``e_attribution``: last-touch marketing attribution — every purchase
  credited to the user's latest preceding non-purchase event within a
  horizon; the event-log cousin of the as-of join (operators/asof.py).

All money sums run in integer cents (the a_groupsum_pricing rule) so the
DuckDB twins hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .testdata import load_table

# ---------------------------------------------------------------------------
# q_shipping_priority — TPC-H Q3 shape: filter → 3-way join → top-k
# ---------------------------------------------------------------------------

Q3_SEGMENT_MOD = 3  # stand-in for c_mktsegment: customers with key%5==3
Q3_CUTOFF = "1996-01-01"


def q_shipping_priority(spark: SparkSession, sf_dir: str, top_k: int = 10) -> DataFrame:
    """Unshipped-revenue priority list: for a customer segment and a date
    cutoff, the top orders by discounted revenue of their pre-cutoff
    lineitems. The classic selective-dimension → fact pattern.

    Scale shape: the customer filter prunes ~1/5 of a DIMENSION, so that
    side broadcasts (AQE decides — the segment size is data-dependent and
    a mandatory hint would be the r3 retention-cohorts bug again); orders
    and lineitem join shuffle-to-shuffle on their natural keys; the
    grouped top-k is a hash-agg followed by TakeOrdered, never a global
    window. Predicate pushdown carries both date cutoffs into the
    parquet scans (asserted in tests/test_plans.py patterns).
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 5 == Q3_SEGMENT_MOD
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_CUTOFF).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev_cents = F.sum(
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev_cents.alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(top_k)
    )


Q_SHIPPING_PRIORITY_SQL = f"""
SELECT l.l_orderkey,
       o.o_orderdate,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey % 5 = {Q3_SEGMENT_MOD}
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue_cents DESC, l.l_orderkey ASC
LIMIT 10
""".strip()


# ---------------------------------------------------------------------------
# q_local_supplier_volume — TPC-H Q5 shape: 6-way snowflake join
# ---------------------------------------------------------------------------


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation from orders where the SUPPLIER sits in the same
    nation as the CUSTOMER — the 6-way snowflake (region → nation →
    {customer, supplier} → orders → lineitem) whose distinguishing
    feature is the cross-branch equality ``c_nationkey = s_nationkey``.

    Scale shape: region/nation/supplier/customer are dimensions (AQE
    broadcasts the small ones); the only big-big join is
    lineitem ⋈ orders on orderkey. The same-nation predicate lands on
    the customer-supplier pair AFTER both are attached, as a cheap
    post-join filter on broadcast columns — Catalyst pushes it into the
    join condition. Join re-order is left to the optimizer: with
    statistics it starts from the filtered-smallest branch.
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev_cents = F.sum(
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("s_nationkey") == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(rev_cents.alias("revenue_cents"), F.count("*").alias("n_lineitems"))
        .orderBy("r_name", F.desc("revenue_cents"), "n_name")
    )


Q_LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT r.r_name,
       n.n_name,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, revenue_cents DESC, n.n_name
""".strip()


# ---------------------------------------------------------------------------
# e_attribution — last-touch attribution over the event log
# ---------------------------------------------------------------------------

ATTRIB_HORIZON_US = 7 * 24 * 3600 * 1_000_000  # 7 days in microseconds


def e_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the same
    user's LATEST preceding non-purchase event within 7 days (ties on
    timestamp broken by event_id); purchases with no touch in the
    horizon land in the 'direct' bucket. Output: credited counts and
    integer-cents revenue per touch type.

    Scale shape: this is the as-of join expressed as a per-user window —
    ONE shuffle on user_id, then a running 'last touch' computed with
    last_value(ignoreNulls) over the user's time-ordered events; no
    self-join, no interval explode. The window partitions by user (tiny
    per-user event lists), never globally. The horizon check is integer
    microseconds — no timezone or FP boundary.
    """
    ev = load_table(spark, sf_dir, "events")
    typed = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.struct("t_us", "event_type"))
    attributed = (
        typed.withColumn("last_touch", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "value_cents",
            F.when(
                F.col("last_touch").isNotNull()
                & (F.col("t_us") - F.col("last_touch.t_us") <= ATTRIB_HORIZON_US),
                F.col("last_touch.event_type"),
            )
            .otherwise(F.lit("direct"))
            .alias("touch_type"),
        )
    )
    return attributed.groupBy("touch_type").agg(
        F.count("*").alias("n_purchases"),
        F.sum("value_cents").alias("revenue_cents"),
    )


E_ATTRIBUTION_SQL = f"""
WITH typed AS (
    SELECT user_id, event_id, event_type,
           epoch_us(ts) AS t_us,
           CAST(FLOOR(value * 100) AS BIGINT) AS value_cents
    FROM events
),
tagged AS (
    SELECT *,
           LAST_VALUE(
               CASE WHEN event_type <> 'purchase'
                    THEN struct_pack(t_us := t_us, event_type := event_type)
               END IGNORE NULLS
           ) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS last_touch
    FROM typed
)
SELECT CASE WHEN last_touch IS NOT NULL
             AND t_us - last_touch.t_us <= {ATTRIB_HORIZON_US}
            THEN last_touch.event_type ELSE 'direct' END AS touch_type,
       COUNT(*) AS n_purchases,
       CAST(SUM(value_cents) AS BIGINT) AS revenue_cents
FROM tagged
WHERE event_type = 'purchase'
GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# e_markov_transitions — first-order event-type transition matrix
# ---------------------------------------------------------------------------


def e_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between event types per user
    journey — the sequence-model statistic behind next-action prediction
    and funnel-anomaly detection. Output: (prev_type, next_type, n,
    share_ppm) where share_ppm is the integer-ppm row-conditional
    probability P(next|prev).

    Scale shape: ONE shuffle on user_id for the per-user lag window
    (tiny per-user partitions), then a combinable hash-agg on the 5×5
    type-pair space; the conditional share divides two exact longs
    inside a B-row table. No self-join.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("prev_type"), "next_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr("CAST((n * 1000000) DIV t AS BIGINT)").alias("share_ppm"),
        )
        .orderBy("prev_type", "next_type")
    )


E_MARKOV_TRANSITIONS_SQL = """
WITH seq AS (
    SELECT user_id, event_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS next_type
    FROM events
),
pairs AS (
    SELECT event_type AS prev_type, next_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
),
totals AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS t FROM pairs GROUP BY 1)
SELECT p.prev_type, p.next_type, p.n,
       CAST((p.n * 1000000) // totals.t AS BIGINT) AS share_ppm
FROM pairs p JOIN totals ON p.prev_type = totals.prev_type
ORDER BY p.prev_type, p.next_type
""".strip()


# ---------------------------------------------------------------------------
# a_gini — Gini concentration index over customer revenue
# ---------------------------------------------------------------------------


def a_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers — the
    single-number companion to w_pareto_share's curve (0 = equal, →1 =
    winner-take-all); the statistic mixture designers track when one
    source starts dominating a corpus.

    Formula (sorted ascending, 1-based rank i):
        G = (2·Σ i·xᵢ) / (n·Σ xᵢ) − (n+1)/n
    Scale shape: revenue in exact integer cents; the global rank comes
    from operators/order.py::global_row_number (bucketed range partition
    + per-bucket window + broadcast offsets — no single-partition
    window); Σ i·xᵢ accumulates in DECIMAL(38,0) so a billion-customer
    fact cannot overflow; the two final divisions are double ops on
    exactly-representable inputs, bit-identical cross-engine.
    """
    from ..operators.order import (
        global_row_number,
        packed_sort_key,
        pin_with_range_bucket,
    )

    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    # DRIVER tier (round 11, the a_mad_outliers discipline): customers
    # are a DIMENSION — when the customer table's footer row count fits
    # the cap, ONE job collects the per-customer revenue table, the
    # rank-weighted sum runs in exact Python integers, and the scalars
    # feed back through the SAME final Spark expressions (all casts,
    # divisions and the ROUND happen JVM-side — bit-identical to the
    # distributed tier, pytest-pinned). 3 jobs → 1.
    from .round5d import _file_size_row_bound

    cust_rows = _file_size_row_bound(sf_dir, table="customer")
    if cust_rows is not None and cust_rows <= _GINI_DRIVER_MAX_ROWS:
        from decimal import Decimal

        vals = sorted(
            (int(r["x"]), int(r["o_custkey"])) for r in rev.collect()
        )
        if vals:
            n = len(vals)
            s = sum(x for x, _ in vals)
            rw = sum(i * x for i, (x, _) in enumerate(vals, start=1))
            stats = spark.range(1).select(
                F.lit(n).cast("long").alias("n_customers"),
                F.lit(Decimal(s)).cast("decimal(38,0)").alias("sum_cents"),
                F.lit(Decimal(rw)).cast("decimal(38,0)").alias("rank_weighted"),
            )
            return _gini_finalize(stats)
    # unique ascending sort key: (x, custkey) packed into one long,
    # GUARDED against silent wrap (x >= 2^39 cents or custkey >= 2^24
    # raise instead of corrupting the rank — round-13 VERDICT item 2);
    # pin the customer-sized table once, with the bucket-bounds agg as
    # the materializing action — totals and main rank pass then read
    # cached blocks instead of re-running the orders scan + groupBy
    # (compressed table only, never the fact)
    key = packed_sort_key(F.col("x"), F.col("o_custkey"), 24, "a_gini")
    keyed, bucket = pin_with_range_bucket(
        rev.withColumn("__k", key), F.col("__k")
    )
    ranked = global_row_number(keyed, F.col("__k"), bucket, out="i")
    return _gini_finalize(
        ranked.agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sum_cents"),
            F.sum(
                (F.col("i") * F.col("x")).cast("decimal(38,0)")
            ).alias("rank_weighted"),
        )
    )


# Collect the per-customer revenue table when the customer DIMENSION's
# footer row count fits (~262k (long, long) rows ≈ 4 MB) — dims don't
# grow with the fact, so this is the common case at any corpus size;
# the distributed rank path remains for genuinely huge key spaces.
_GINI_DRIVER_MAX_ROWS = 262_144


def _gini_finalize(stats: DataFrame) -> DataFrame:
    """Final Gini expression over a 1-row (n_customers, sum_cents,
    rank_weighted) frame — shared verbatim by both tiers."""
    return stats.select(
        "n_customers",
        F.col("sum_cents").cast("long").alias("sum_cents"),
        # each factor is cast to double BEFORE multiplying (both engines
        # then round the exact product of two exact doubles identically;
        # a long×long product would overflow past ~10^18 under ANSI)
        F.round(
            (F.lit(2.0) * F.col("rank_weighted").cast("double"))
            / (
                F.col("n_customers").cast("double")
                * F.col("sum_cents").cast("double")
            )
            - (F.col("n_customers") + 1).cast("double") / F.col("n_customers"),
            6,
        ).alias("gini"),
    )


A_GINI_SQL = """
WITH rev AS (
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT x, ROW_NUMBER() OVER (ORDER BY x * (1 << 24) + o_custkey) AS i
    FROM rev
)
SELECT COUNT(*) AS n_customers,
       CAST(SUM(x) AS BIGINT) AS sum_cents,
       ROUND(
           (2.0 * CAST(SUM(CAST(i AS HUGEINT) * x) AS DOUBLE))
           / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
           - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*),
           6
       ) AS gini
FROM ranked
""".strip()


# ---------------------------------------------------------------------------
# q_nation_trade — TPC-H Q7 shape: bilateral trade volume between two nations
# ---------------------------------------------------------------------------

TRADE_NATION_A = "NATION_1"
TRADE_NATION_B = "NATION_2"


def q_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral supplier-nation ↔ customer-nation revenue by ship year
    (the TPC-H Q7 "volume shipping" shape): lineitem ⋈ orders ⋈ customer
    ⋈ supplier plus the nation dim joined in TWO roles, restricted to
    one nation pair in either direction.

    Scale shape: both nation roles broadcast (25-row dim) with the
    IN-pair predicate pushed into each role's scan BEFORE the join; the
    pair-direction condition is a residual on the already-joined row.
    The fact side shuffles only on its natural keys (orderkey/custkey/
    suppkey) and carries no hint — AQE picks sides. Revenue accumulates
    in exact integer cents (the a_gini/Q3 discipline) so a trillion-row
    SUM hashes identically cross-engine."""
    names = [TRADE_NATION_A, TRADE_NATION_B]
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.filter(F.col("n_name").isin(names)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(names)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(n1, supp["s_nationkey"] == F.col("n1_key"))
        .join(n2, cust["c_nationkey"] == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))  # both directions
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("revenue_cents"),
            F.count("*").cast("long").alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q_NATION_TRADE_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('{TRADE_NATION_A}', '{TRADE_NATION_B}')
  AND n2.n_name IN ('{TRADE_NATION_A}', '{TRADE_NATION_B}')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""".strip()


# ---------------------------------------------------------------------------
# a_benford — first-digit distribution vs Benford's law (fraud/quality gate)
# ---------------------------------------------------------------------------

import math as _math

#: exact double literals computed ONCE in python and inlined into BOTH
#: engines — log10 is not cross-engine bit-stable, a shared literal is
_BENFORD_EXPECTED = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}


def a_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against
    Benford's law — the classic scale-free fraud/synthetic-data smell
    test for financial facts.

    Exactness: the first digit comes from the INTEGER cents string
    (substring of a BIGINT's decimal rendering — identical across
    engines; floating log10 extraction would wobble at power-of-ten
    boundaries), and the expected shares are python-computed literals
    inlined into both engines. One fact hash-agg; the 9-digit table is
    expression math after."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    counts = (
        o.select(cents.alias("cents"))
        .filter(F.col("cents") > 0)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    total = Window.partitionBy()  # 9-row frame: bounded, not fact-sized
    expected = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in _BENFORD_EXPECTED]),
            F.array(*[F.lit(v) for v in _BENFORD_EXPECTED.values()]),
        ),
        F.col("digit"),
    )
    return (
        counts.withColumn("share", F.col("n") / F.sum("n").over(total))
        .withColumn("expected", expected)
        .withColumn("abs_dev", F.abs(F.col("share") - F.col("expected")))
        .orderBy("digit")
    )


_BENFORD_CASE = " ".join(
    f"WHEN {k} THEN {v!r}" for k, v in _BENFORD_EXPECTED.items()
)

A_BENFORD_SQL = f"""
WITH counts AS (
    SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
    WHERE cents > 0
    GROUP BY 1
)
SELECT digit, n,
       n / CAST(SUM(n) OVER () AS DOUBLE) AS share,
       CASE digit {_BENFORD_CASE} END AS expected,
       ABS(n / CAST(SUM(n) OVER () AS DOUBLE)
           - CASE digit {_BENFORD_CASE} END) AS abs_dev
FROM counts
ORDER BY digit
""".strip()
