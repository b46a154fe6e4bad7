"""Invariant tests for the round-2 scale-pattern queries (plans/advanced.py)
and the connected-components operator (operators/graph.py)."""

from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.operators.graph import (
    cluster_sizes,
    connected_components,
)
from good_enough_timecamp_data_pipeline_spark.plans import advanced
from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table


def test_connected_components_known_graph(spark):
    # chain 1-2-3, clique {10,11,12}, isolated pair {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    sizes = {
        (r["node"], r["cluster_size"])
        for r in cluster_sizes(connected_components(edges)).collect()
    }
    assert (3, 3) in sizes and (21, 2) in sizes


def test_cc_clusters_match_local_union_find(spark, sf_dir):
    out = advanced.d_cc_clusters(spark, sf_dir).collect()
    # every cluster_id is the min doc of its cluster, sizes consistent
    by_cluster: dict[int, list[int]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc"])
    for cid, docs in by_cluster.items():
        assert cid == min(docs)
    for r in out:
        assert r["cluster_size"] == len(by_cluster[r["cluster_id"]])
    # injected near-copies (doc_id % 19 == 0 → +1000000) must co-cluster
    # with their source whenever both have fingerprints
    doc_cluster = {r["doc"]: r["cluster_id"] for r in out}
    paired = [d for d in doc_cluster if d >= 1_000_000 and d - 1_000_000 in doc_cluster]
    assert paired, "expected injected near-dup pairs in the graph"
    assert all(doc_cluster[d] == doc_cluster[d - 1_000_000] for d in paired)


def test_range_join_nearby_superset_of_base(spark, sf_dir):
    rows = advanced.x_range_join(spark, sf_dir).collect()
    assert rows, "expected hot windows"
    # the widened interval contains the window itself
    assert all(r["n_nearby"] >= r["n_base"] for r in rows)
    assert all(r["n_users"] <= r["n_nearby"] for r in rows)


def test_gapfill_invariants(spark, sf_dir):
    out = advanced.e_gapfill(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    # conservation: filled counts sum to the raw event count
    assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # gaps are exactly the zero-count days and carry a forward-filled type
    bad = out.filter(
        (F.col("is_gap") == 1) & (F.col("n_events") != 0)
        | (F.col("is_gap") == 0) & (F.col("n_events") == 0)
    )
    assert bad.count() == 0
    assert out.filter(F.col("locf_type").isNull()).count() == 0  # first day is active
    # per-user span is contiguous: rows == datediff(max,min)+1
    span = out.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("expect"),
    )
    assert span.filter(F.col("n") != F.col("expect")).count() == 0


def test_zscore_outliers_all_above_threshold(spark, sf_dir):
    rows = advanced.a_zscore_outliers(spark, sf_dir).collect()
    assert rows, "exponential-ish value column should have >3σ rows"
    assert all(r["z"] > 3.0 for r in rows)


def test_merge_upsert_partitions(spark, sf_dir):
    out = advanced.j_merge_upsert(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    by_op = {r["op"]: r["n"] for r in out.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert by_op.get("insert", 0) > 0 and by_op.get("update", 0) > 0
    # every base row survives exactly once
    assert sum(by_op.values()) - by_op.get("insert", 0) == customer.count()
    assert out.filter((F.col("op") == "insert") & (F.col("custkey") < 1_000_000)).count() == 0
    assert out.filter(F.col("op") == "insert").filter(F.col("seg") != "NEW").count() == 0


def test_histogram_shape(spark, sf_dir):
    rows = advanced.a_histogram(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    assert len(rows) == 20
    assert sorted(r["bucket"] for r in rows) == list(range(20))
    assert sum(r["n"] for r in rows) == orders.count()
    assert abs(sum(r["pct"] for r in rows) - 1.0) < 1e-9


def test_approx_sketches_error_bounds(spark, sf_dir):
    approx = {r["event_type"]: r for r in advanced.a_approx_sketches(spark, sf_dir).collect()}
    exact = {
        r["event_type"]: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.expr("percentile(value, 0.5)").alias("exact_p50"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, r in approx.items():
        e = exact[k]
        assert abs(r["approx_users"] - e["exact_users"]) <= max(
            3, 0.05 * e["exact_users"]
        )
        assert abs(r["approx_p50"] - e["exact_p50"]) <= max(0.5, 0.05 * e["exact_p50"])


def test_tfidf_topk_shape(spark, sf_dir):
    out = advanced.t_tfidf(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("k"), F.min("rk").alias("mn"), F.max("rk").alias("mx")
    )
    assert per_doc.filter(F.col("k") > 3).count() == 0
    assert per_doc.filter((F.col("mn") != 1)).count() == 0
    assert per_doc.count() == docs.count()
    # rare terms outrank common ones: within a doc, rk order == tfidf desc
    bad = (
        out.alias("a")
        .join(out.alias("b"), (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.rk") < F.col("b.rk")))
        .filter(F.col("a.tfidf") < F.col("b.tfidf"))
    )
    assert bad.count() == 0


def test_snapshot_diff_ops(spark, sf_dir):
    out = advanced.c_snapshot_diff(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    n_del = cust.filter(F.col("k") % 41 == 0).count()
    n_ins = cust.filter(F.col("k") % 29 == 0).count()
    n_upd = cust.filter((F.col("k") % 13 == 0) & (F.col("k") % 41 != 0)).count()
    by_op = {r["op"]: r["n"] for r in out.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert by_op == {"delete": n_del, "insert": n_ins, "update": n_upd}
    assert out.filter((F.col("op") == "update") & (F.col("new_bal") - F.col("old_bal") != 100)).count() == 0


def test_kmeans_lloyd_invariants(spark, sf_dir):
    from good_enough_timecamp_data_pipeline_spark.operators.clustering import kmeans

    vecs = load_table(spark, sf_dir, "embeddings")
    assign, hist = kmeans(vecs, k=4, max_iter=4)
    # inertia never increases, except a possible final fp-noise tick that
    # triggered the convergence break
    body = hist[:-1]
    assert all(b <= a * (1 + 1e-12) for a, b in zip(body, body[1:]))
    assert hist[-1] <= hist[0]
    rows = assign.collect()
    assert len(rows) == vecs.count()
    assert {r["cluster"] for r in rows} <= set(range(4))
    assert all(r["sq_dist"] >= 0 for r in rows)


def test_winnow_fingerprints_detect_overlap(spark, sf_dir):
    """Winnowing guarantee: a doc sharing a long substring with another
    shares at least one selected fingerprint — check via the injected
    near-dup corpus trick on two hand-made docs."""
    from good_enough_timecamp_data_pipeline_spark.plans.advanced import t_winnow

    out = t_winnow(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # every doc with >= 8 tokens has fingerprints; checksum fits bigint
    assert out.count() == docs.filter(
        F.size(F.split(F.trim("text"), r"\s+")) >= 8
    ).count()
    assert out.filter(F.col("n_fp") <= 0).count() == 0


def test_bpe_pieces_at_least_words(spark, sf_dir):
    from good_enough_timecamp_data_pipeline_spark.plans.advanced import t_bpe_tokens

    out = t_bpe_tokens(spark, sf_dir)
    assert out.filter(F.col("n_pieces") < F.col("n_words")).count() == 0
    assert out.filter(
        F.col("n_word_pieces") + F.col("n_punct_pieces") != F.col("n_pieces")
    ).count() == 0


def test_grouping_sets_totals_consistent(spark, sf_dir):
    from good_enough_timecamp_data_pipeline_spark.plans.advanced import a_grouping_sets

    rows = a_grouping_sets(spark, sf_dir).collect()
    grand = [r for r in rows if r["g_status"] == 1 and r["g_prio"] == 1]
    per_status = [r for r in rows if r["g_status"] == 0 and r["g_prio"] == 1]
    leaf = [r for r in rows if r["g_status"] == 0 and r["g_prio"] == 0]
    assert len(grand) == 1
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in per_status)
    assert grand[0]["total_cents"] == sum(r["total_cents"] for r in leaf)


def test_partial_agg_merge_equals_direct(spark, sf_dir):
    from good_enough_timecamp_data_pipeline_spark.plans.advanced import (
        a_partial_agg_merge,
    )

    merged = {
        r["o_custkey"]: (r["n_orders"], r["total_cents"])
        for r in a_partial_agg_merge(spark, sf_dir).collect()
    }
    direct = {
        r["o_custkey"]: (r["n"], r["s"])
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("s"),
        )
        .collect()
    }
    assert merged == direct


def test_connected_components_long_chain_nonconvergence(spark):
    """A chain longer than max_iter hops must FAIL LOUDLY, not return
    silently-split clusters (round-3 VERDICT item 5); warn-mode returns
    the over-segmented labels with a RuntimeWarning; a big-enough cap
    recovers the exact single component."""
    import warnings

    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(chain, max_iter=2)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = connected_components(chain, max_iter=2, on_nonconverged="warn")
        assert labels.count() == 10  # over-segmented but returned
        assert any("no fixpoint" in str(w.message) for w in caught)
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(chain, max_iter=15).collect()
    }
    assert got == {i: 0 for i in range(10)}


def test_connected_components_frees_round_checkpoints(spark):
    """Each round's localCheckpoint blocks must be freed once the next
    round materializes (r4 ADVICE): a 10-round chain run may leave at most
    a constant number of persisted RDDs beyond what existed before —
    the final labels checkpoint — never one per round."""
    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    labels = connected_components(chain, max_iter=15)
    labels.count()
    after = sc._jsc.sc().getPersistentRDDs().size()
    # ~11 rounds run for this chain; without per-round cleanup the delta
    # would be ≥ 10. Allow a small constant for the final checkpoint (+ any
    # cleaner lag), but fail on per-round accumulation.
    assert after - before <= 3, f"leaked checkpoint RDDs: {after - before}"


def test_kmeans_fewer_vectors_than_k(spark):
    """n < k clamps k to n: every vector becomes its own centroid instead
    of an IndexError in the state arrays (round-2 ADVICE carryover)."""
    from good_enough_timecamp_data_pipeline_spark.operators.clustering import kmeans

    vecs = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [5.0, 5.0]), (3, [9.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    assign, hist = kmeans(vecs, k=8, max_iter=3)
    rows = assign.collect()
    assert len(rows) == 3
    assert len({r["cluster"] for r in rows}) == 3
    assert all(abs(r["sq_dist"]) < 1e-12 for r in rows)


def test_kmeans_empty_input_raises(spark):
    import pytest

    from good_enough_timecamp_data_pipeline_spark.operators.clustering import kmeans

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no vectors"):
        kmeans(empty, k=4)


def test_dedup_survivors_policy(spark, sf_dir):
    """Exactly one survivor per cluster; survivor has the cluster's max
    token count; non-clustered docs keep themselves."""
    out = advanced.d_dedup_survivors(spark, sf_dir).collect()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rows in by_cluster.items():
        keepers = [r for r in rows if r["keep"] == 1]
        assert len(keepers) == 1, f"cluster {cid}: {len(keepers)} keepers"
        k = keepers[0]
        assert k["doc"] == k["survivor"]
        mx = max(r["n_toks"] for r in rows)
        assert k["n_toks"] == mx
        assert all(r["survivor"] == k["doc"] for r in rows)
