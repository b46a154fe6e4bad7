"""Invariant tests for the round-4 extension queries (plans/extensions.py)
and the e_retention_cohorts broadcast-hint removal (round-3 VERDICT §4)."""

from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.plans import analytics, extensions
from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table


def test_retention_has_no_broadcast_hint(spark, sf_dir):
    """first_seen is user-cardinality — it must carry NO explicit broadcast
    hint (AQE may still *choose* broadcast at small scale from runtime
    stats; the point is the plan doesn't force it at any scale)."""
    df = analytics.e_retention_cohorts(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed


def test_sliding_window_counts_every_event_four_times(spark, sf_dir):
    """1 h window / 15 min slide ⇒ every event lands in exactly 4 buckets."""
    out = extensions.e_sliding_window(spark, sf_dir)
    total = out.agg(F.sum("n")).collect()[0][0]
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == 4 * n_events


def test_dau_wau_invariants(spark, sf_dir):
    """WAU ≥ DAU everywhere, and on the first active day WAU == DAU."""
    rows = extensions.e_dau_wau(spark, sf_dir).orderBy("day").collect()
    assert rows
    assert all(r["wau"] >= r["dau"] for r in rows)
    assert rows[0]["wau"] == rows[0]["dau"]


def test_latest_per_key_is_max_ts(spark, sf_dir):
    out = extensions.o_latest_per_key(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert out.count() == ev.select("user_id").distinct().count()
    max_ts = ev.groupBy("user_id").agg(F.max("ts").alias("mx"))
    joined = out.join(max_ts, "user_id").filter(F.col("last_ts") != F.col("mx"))
    assert joined.count() == 0


def test_unpivot_triples_rows(spark, sf_dir):
    n = load_table(spark, sf_dir, "lineitem").count()
    assert extensions.x_unpivot(spark, sf_dir).count() == 3 * n


def test_bigram_cond_p_bounded(spark, sf_dir):
    rows = extensions.t_bigram_lm(spark, sf_dir).collect()
    assert len(rows) == 50
    assert all(0 < r["cond_p"] <= 1 for r in rows)
    assert all(r["cnt"] >= rows[-1]["cnt"] for r in rows)  # sorted desc


def test_embedding_stats_norm_bounds(spark, sf_dir):
    rows = extensions.s_embedding_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["min_norm"] <= r["avg_norm"] <= r["max_norm"]
        assert r["min_norm"] > 0  # no zero vectors in testdata


def test_lm_perplexity_scores_all_tokenizable_docs(spark, sf_dir):
    """Every doc with ≥2 tokens gets a positive finite score; add-one
    smoothing keeps probabilities < 1 so -ln p > 0."""
    import math

    rows = extensions.t_lm_perplexity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert r["avg_neg_logp"] > 0 and math.isfinite(r["avg_neg_logp"])
