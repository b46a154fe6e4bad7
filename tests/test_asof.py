"""As-of join operator semantics (operators/asof.py)."""

from good_enough_timecamp_data_pipeline_spark.operators.asof import asof_join


def test_asof_basic_ties_and_misses(spark):
    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u1", 5, "c"), ("u2", 7, "d")],
        "user string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 10, 100), ("u1", 15, 150), ("u3", 1, 999)],
        "user string, ts long, px long",
    )
    out = {
        r.tag: (r.ts_asof, r.px_asof)
        for r in asof_join(left, right, on="ts", by="user", value_cols=["px"]).collect()
    }
    assert out["a"] == (10, 100)      # equal timestamp matches (inclusive)
    assert out["b"] == (15, 150)      # latest earlier row wins
    assert out["c"] == (None, None)   # nothing earlier → NULLs kept (left join)
    assert out["d"] == (None, None)   # key with no reference rows at all


def test_asof_exactly_once_per_probe(spark):
    # multiple matches must never duplicate probe rows (the range-join trap)
    left = spark.createDataFrame([("k", i, i) for i in range(50)],
                                 "k string, ts long, n long")
    right = spark.createDataFrame([("k", i * 2, i) for i in range(30)],
                                  "k string, ts long, v long")
    out = asof_join(left, right, on="ts", by="k", value_cols=["v"])
    assert out.count() == 50
    rows = {r.n: r.v_asof for r in out.collect()}
    assert rows[9] == 4  # ts=9 → latest right ts=8 → v=4


def test_fuzzy_join_blocked(spark):
    from good_enough_timecamp_data_pipeline_spark.operators.fuzzy import fuzzy_join

    clean = spark.createDataFrame(
        [("red widget",), ("blue bolt",), ("small ring",)], "name string"
    )
    dirty = spark.createDataFrame(
        [("rd widget",),   # dist 1 from 'red widget', same first char
         ("blue boltt",),  # dist 1 from 'blue bolt'
         ("xmall ring",),  # dist 1 but FIRST CHAR differs → blocked away
         ("nothing",)],
        "q string",
    )
    got = {(r.q, r.name, r.edit_dist)
           for r in fuzzy_join(dirty, clean, "q", "name", max_dist=2).collect()}
    assert ("rd widget", "red widget", 1) in got
    assert ("blue boltt", "blue bolt", 1) in got
    # the blocking trade: first-char edits escape the block (documented)
    assert not any(q == "xmall ring" for q, _, _ in got)
    assert not any(q == "nothing" for q, _, _ in got)


def test_asof_forward_direction(spark):
    from good_enough_timecamp_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u1", 50, "c"), ("u2", 7, "d")],
        "user string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 10, 100), ("u1", 15, 150), ("u1", 40, 400)],
        "user string, ts long, px long",
    )
    out = {
        r.tag: (r.ts_asof, r.px_asof)
        for r in asof_join(
            left, right, on="ts", by="user", value_cols=["px"], direction="forward"
        ).collect()
    }
    assert out["a"] == (10, 100)      # equal timestamp still inclusive
    assert out["b"] == (40, 400)      # earliest LATER row wins
    assert out["c"] == (None, None)   # nothing later
    assert out["d"] == (None, None)   # no reference rows for the key


def test_asof_nearest_prefers_closer_and_breaks_ties_backward(spark):
    from good_enough_timecamp_data_pipeline_spark.operators.asof import (
        asof_join_nearest,
    )
    from pyspark.sql import functions as F

    def ts(us):
        return us  # work in raw microseconds via timestamp casts below

    left = spark.createDataFrame(
        [("u1", 100, "mid"), ("u1", 6, "near_b"), ("u1", 1000, "only_b")],
        "user string, us long, tag string",
    ).select("user", F.timestamp_micros(F.col("us")).alias("ts"), "tag")
    right = spark.createDataFrame(
        [("u1", 90, 9), ("u1", 110, 11), ("u1", 4, 4)],
        "user string, us long, px long",
    ).select("user", F.timestamp_micros(F.col("us")).alias("ts"), "px")
    out = {
        r.tag: (r.ts_asof, r.px_asof)
        for r in asof_join_nearest(
            left, right, on="ts", by="user", value_cols=["px"]
        ).collect()
    }
    # mid @100: bwd 90 (d=10) vs fwd 110 (d=10) — exact tie → backward
    assert out["mid"][1] == 9
    # near_b @6: bwd 4 (d=2) beats fwd 90 (d=84)
    assert out["near_b"][1] == 4
    # only_b @1000: nothing forward — backward 110 wins
    assert out["only_b"][1] == 11


def test_asof_nearest_bruteforce_random(spark):
    import random

    from pyspark.sql import functions as F

    from good_enough_timecamp_data_pipeline_spark.operators.asof import (
        asof_join_nearest,
    )

    rng = random.Random(7)
    lrows = [("k%d" % rng.randrange(3), rng.randrange(1000), i) for i in range(60)]
    rrows = {("k%d" % rng.randrange(3), rng.randrange(1000)) for _ in range(40)}
    rrows = [(k, t, t * 7) for k, t in sorted(rrows)]
    left = spark.createDataFrame(lrows, "k string, us long, row_id long").select(
        "k", F.timestamp_micros(F.col("us")).alias("ts"), "row_id", "us"
    )
    right = spark.createDataFrame(rrows, "k string, us long, v long").select(
        "k", F.timestamp_micros(F.col("us")).alias("ts"), "v"
    )
    got = {
        r.row_id: r.v_asof
        for r in asof_join_nearest(left, right, on="ts", by="k", value_cols=["v"]).collect()
    }
    for k, us, row_id in lrows:
        cands = [(t, v) for (kk, t, v) in rrows if kk == k]
        if not cands:
            assert got[row_id] is None
            continue
        best = min(cands, key=lambda tv: (abs(tv[0] - us), tv[0] > us))
        assert got[row_id] == best[1], (row_id, k, us, best)


def test_asof_nearest_null_and_duplicate_left_rows(spark):
    """Regression (round-5 ADVICE): the old implementation recombined the
    backward and forward passes with a null-unsafe join over ALL left
    columns — a left row with a NULL column was silently dropped and
    duplicate left rows cross-multiplied. The single-union rewrite must
    emit every left row exactly once."""
    from pyspark.sql import functions as F

    from good_enough_timecamp_data_pipeline_spark.operators.asof import (
        asof_join_nearest,
    )

    left = spark.createDataFrame(
        [
            ("u1", 100, None),      # NULL payload column
            ("u1", 200, 7),
            ("u1", 200, 7),         # exact duplicate row
            ("u1", 300, None),      # second NULL row
        ],
        "user string, us long, payload int",
    ).select("user", F.timestamp_micros(F.col("us")).alias("ts"), "payload", "us")
    right = spark.createDataFrame(
        [("u1", 90, 9), ("u1", 210, 21)], "user string, us long, px long"
    ).select("user", F.timestamp_micros(F.col("us")).alias("ts"), "px")

    rows = asof_join_nearest(left, right, on="ts", by="user", value_cols=["px"]).collect()
    assert len(rows) == 4  # every probe row exactly once, NULLs included
    by_us = {}
    for r in rows:
        by_us.setdefault(r.us, []).append(r.px_asof)
    assert by_us[100] == [9]        # nearest is 90 (d=10) vs 210 (d=110)
    assert by_us[200] == [21, 21]   # both duplicates survive, no cross-multiply
    assert by_us[300] == [21]       # NULL payload row not dropped
