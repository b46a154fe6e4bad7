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
