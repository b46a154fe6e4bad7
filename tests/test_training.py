"""Invariant + plan-shape tests for the training-data curation queries
(plans/training.py) and the two §2.6/§2.8 additions in analytics.py."""

from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.operators import text
from good_enough_timecamp_data_pipeline_spark.plans import analytics, training
from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table


def test_decontam_flags_planted_eval_docs(spark, sf_dir):
    out = {r["doc_id"]: r["eval_gram_hits"] for r in
           training.t_decontam(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    planted = [
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % training._EVAL_MOD == 0)
        .filter(text.token_count(F.col("text")) >= 5)
        .collect()
    ]
    # every long-enough eval doc collides with itself in the train corpus
    for d in planted:
        assert d in out and out[d] >= 1
    assert all(h >= 1 for h in out.values())


def test_decontam_eval_side_is_broadcast(spark, sf_dir):
    plan = training.t_decontam(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_seq_pack_conserves_tokens_and_respects_budget(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(F.sum(text.token_count(F.col("text")))).collect()[0][0]
    bins = training.t_seq_pack(spark, sf_dir).collect()
    assert sum(r["bin_tokens"] for r in bins) == total
    assert all(r["n_docs"] >= 1 for r in bins)
    # bin ids are the dense prefix of cut points: max id bounded by total/budget
    ids = sorted(r["bin_id"] for r in bins)
    assert ids[0] == 0 and ids[-1] <= total // training._PACK_BUDGET


def test_mixture_weights_sqrt_share(spark, sf_dir):
    rows = training.t_mixture_weights(spark, sf_dir).collect()
    total = sum(r["lang_tokens"] for r in rows)
    for r in rows:
        assert abs(r["weight"] ** 2 - r["lang_tokens"] / total) < 1e-12
    # temperature flattening: weight order follows token order
    srt = sorted(rows, key=lambda r: r["lang_tokens"])
    assert all(a["weight"] <= b["weight"] for a, b in zip(srt, srt[1:]))


def test_repetition_fractions_bounded(spark, sf_dir):
    rows = training.t_repetition(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_bigram_frac"] < 1.0
        assert 0.0 < r["top_bigram_frac"] <= 1.0
        assert r["flagged"] == (
            r["dup_bigram_frac"] > 0.2 or r["top_bigram_frac"] > 0.18
        )


def test_repetition_detects_planted_repetition(spark, sf_dir):
    df = spark.createDataFrame(
        [(1, "spam ham " * 50), (2, "a b c d e f g h i j k l m n o p")],
        "doc_id long, text string",
    )
    import good_enough_timecamp_data_pipeline_spark.plans.training as tr
    orig = tr.load_table
    tr.load_table = lambda s, d, n: df  # noqa: E731
    try:
        out = {r["doc_id"]: r for r in tr.t_repetition(spark, "unused").collect()}
    finally:
        tr.load_table = orig
    assert out[1]["flagged"] and not out[2]["flagged"]
    assert out[1]["dup_bigram_frac"] > 0.9


def test_shard_assign_balanced_and_dense(spark, sf_dir):
    rows = training.t_shard_assign(spark, sf_dir).collect()
    n = len(rows)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    full, size = divmod(n, training._SHARD_SIZE)
    for s, poss in by_shard.items():
        expect = training._SHARD_SIZE if s < full else size
        assert sorted(poss) == list(range(expect))
    assert set(by_shard) == set(range(full + (1 if size else 0)))


def test_rank_distribution_bounds(spark, sf_dir):
    rows = analytics.w_rank_distribution(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r["pct_rank"] <= 1.0
        assert 0.0 < r["cume_dist"] <= 1.0


def test_posexplode_positions(spark, sf_dir):
    out = analytics.x_posexplode(spark, sf_dir)
    first = out.filter(F.col("pos") == 0).count()
    keys = out.select("p_partkey").distinct().count()
    assert first == keys  # every exploded part has a word at position 0


def test_quantize_error_bound(spark, sf_dir):
    """Reconstruction error of int8 min/max quantization is bounded by
    one code step (span/255) per vector."""
    out = training.s_quantize_int8(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.array_min(F.col("embedding").cast("array<double>")).alias("lo"),
        F.array_max(F.col("embedding").cast("array<double>")).alias("hi"),
    )
    joined = out.join(emb, "vec_id").withColumn(
        "bound", (F.col("hi") - F.col("lo")) / 255.0 * (1 + 1e-9)
    )
    assert joined.filter(F.col("max_err") > F.col("bound")).count() == 0
    assert out.filter(F.col("code_sum") < 0).count() == 0


def test_chunking_covers_all_tokens_with_overlap(spark, sf_dir):
    chunks = training.t_chunking(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(text.tokenize(F.col("text"))).alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c)
    for doc_id, n in docs.items():
        if n == 0:
            assert doc_id not in by_doc
            continue
        cs = sorted(by_doc[doc_id], key=lambda c: c["chunk_idx"])
        # starts form the stride grid; last chunk reaches the end
        assert [c["chunk_start"] for c in cs] == [
            1 + i * training._STRIDE for i in range(len(cs))
        ]
        last = cs[-1]
        assert last["chunk_start"] + last["n_chunk_toks"] - 1 == n
        for c in cs:
            assert 1 <= c["n_chunk_toks"] <= training._CHUNK


def test_month_batches_six_month_spans(spark, sf_dir):
    rows = analytics.f_month_batches(spark, sf_dir).collect()
    assert sum(r["n_orders"] for r in rows) == load_table(spark, sf_dir, "orders").count()
    for r in rows:
        # every batch spans at most 6 calendar months
        f, l = r["first_order"], r["last_order"]
        months = (l.year - f.year) * 12 + (l.month - f.month)
        assert 0 <= months < 6


def test_shard_assign_tier_parity(spark, sf_dir):
    """r13: the pinned (narrow-projection cache) and rescan tiers of the
    md5 global row_number must assign identical (shard, pos)."""
    pinned = sorted(
        tuple(r) for r in training.t_shard_assign(spark, sf_dir).collect()
    )
    rescan = sorted(
        tuple(r)
        for r in training.t_shard_assign(spark, sf_dir, max_pin_rows=0).collect()
    )
    assert pinned == rescan and pinned
