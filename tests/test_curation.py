"""Invariant tests for the round-5b curation operators (plans/curation.py).

Oracle equality for the four SQL-twinned queries is covered by
tools/oracle_check.py / the driver gate; these pin the semantic invariants
that equality alone would not catch (first-wins ordering, bucket balance,
robustness, prefix property, twin recovery through real pixel decode).
"""

import pytest
from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.operators import multimodal as mm
from good_enough_timecamp_data_pipeline_spark.plans import curation


def test_line_dedup_first_wins_and_counts(spark, sf_dir):
    out = curation.t_line_dedup(spark, sf_dir).cache()
    rows = out.collect()
    assert rows, "non-empty corpus must yield rows"
    # every doc keeps at most what it had
    assert all(r.n_kept <= r.n_lines for r in rows)
    # total kept lines == corpus-wide distinct line count (each distinct
    # line survives exactly once)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != F.lit(""))
    d = docs.select("doc_id", toks.alias("t")).filter(F.size("t") >= 1)
    n_lines = F.ceil(F.size("t") / F.lit(10.0)).cast("int")
    lines = d.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(F.slice(F.col("t"), i * 10 + 1, 10), " "),
            )
        ).alias("line")
    )
    distinct_lines = lines.distinct().count()
    assert sum(r.n_kept for r in rows) == distinct_lines
    # the globally-first doc keeps one copy of each of ITS distinct lines
    first = min(rows, key=lambda r: r.doc_id)
    first_doc_distinct = (
        curation.t_line_dedup(spark, sf_dir)  # plan reuse is fine; tiny data
        .filter(F.col("doc_id") == first.doc_id)
        .collect()[0]
    )
    assert first_doc_distinct.n_kept >= 1
    out.unpersist()


def test_ccnet_buckets_balanced_partition(spark, sf_dir):
    out = curation.t_ccnet_buckets(spark, sf_dir).cache()
    per = (
        out.groupBy("lang", "bucket").count().groupBy("lang")
        .agg(
            F.max("count").alias("mx"),
            F.min("count").alias("mn"),
            F.sum("count").alias("n"),
        )
        .collect()
    )
    assert per, "expected at least one language"
    # NTILE(3): bucket sizes within a language differ by at most 1
    assert all(r.mx - r.mn <= 1 for r in per)
    # every scored doc lands in exactly one bucket
    assert out.count() == out.select("doc_id").distinct().count()
    assert out.filter(~F.col("bucket").isin("head", "middle", "tail")).count() == 0
    out.unpersist()


def test_mad_outliers_bounded_and_robust(spark, sf_dir):
    rows = curation.a_mad_outliers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_outliers < r.n, "MAD gate must never flag a majority"
        assert r.mad >= 0.0


def test_pareto_share_prefix_property(spark, sf_dir):
    rows = (
        curation.w_pareto_share(spark, sf_dir)
        .orderBy(F.desc("rev_cents"), F.asc("o_custkey"))
        .collect()
    )
    assert rows
    # cumulative share is monotone and ends at exactly 1.0
    shares = [r.cum_share for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    assert shares[-1] == pytest.approx(1.0, abs=1e-12)
    # is_top80 is a PREFIX of the revenue-desc order
    flags = [r.is_top80 for r in rows]
    assert flags[0] is True
    first_false = flags.index(False) if False in flags else len(flags)
    assert all(flags[:first_false]) and not any(flags[first_false:])
    # the top80 prefix covers >= 80% of revenue, the prefix minus its
    # last member covers < 80%
    total = sum(r.rev_cents for r in rows)
    top = sum(r.rev_cents for r in rows[:first_false])
    assert top * 10 >= total * 8
    assert (top - rows[first_false - 1].rev_cents) * 10 < total * 8


def test_phash_deterministic_and_twin_recovery(spark, sf_dir):
    # determinism of the stdlib hash itself
    img = mm.synthesize_ppm(42, "some pixel seed")
    assert mm.ppm_average_hash(img) == mm.ppm_average_hash(img)
    # a one-byte nudge is a NEAR duplicate: small hamming, not a new image
    nudged = img[:-1] + bytes([(img[-1] + 7) % 256])
    ham = bin(
        (mm.ppm_average_hash(img) ^ mm.ppm_average_hash(nudged)) & ((1 << 64) - 1)
    ).count("1")
    assert ham <= 3

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    media = mm.attach_synthetic_media(docs)
    twins = mm.perturb_payloads(media, id_shift=1_000_000_000)
    pairs = mm.phash_neardup_pairs(media.unionByName(twins), max_hamming=3).cache()
    n_ppm = media.filter(F.col("meta.mime") == mm.PPM_MIME).count()
    # every (orig, orig+1e9) twin pair whose hash survived the nudge is
    # recovered; banding is pigeonhole-exact so only >3-bit flips can lose
    # a twin — require >= 90% recovery
    twin_hits = pairs.filter(F.col("id_b") - F.col("id_a") == 1_000_000_000).count()
    assert twin_hits >= 0.9 * n_ppm
    # symmetry/ordering contract
    assert pairs.filter(F.col("id_a") >= F.col("id_b")).count() == 0
    pairs.unpersist()


def test_synth_phash_rows_matches_composed_pipeline(spark, sf_dir):
    """r15: the fused synth→perturb→hash pass must emit EXACTLY the
    (doc_id, phash) rows the composed attach ∪ perturb → phash_rows
    pipeline produces (the m_phash_neardup rewrite's equivalence proof)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    media = mm.attach_synthetic_media(docs)
    twins = mm.perturb_payloads(media, id_shift=1_000_000_000)
    composed = {
        (r.doc_id, r.phash)
        for r in mm.phash_rows(media.unionByName(twins)).collect()
    }
    fused = {
        (r.doc_id, r.phash)
        for r in mm.synth_phash_rows(docs, id_shift=1_000_000_000).collect()
    }
    assert fused == composed and len(fused) > 0


def test_triangle_count_invariants(spark, sf_dir):
    full = curation.g_triangle_count(spark, sf_dir, vertex_mod=1).collect()[0]
    sub = curation.g_triangle_count(spark, sf_dir, vertex_mod=4).collect()[0]
    assert full.n_nodes >= sub.n_nodes
    assert full.n_edges >= sub.n_edges
    # induced subgraph can never add triangles
    assert full.n_triangles >= sub.n_triangles
    # loose structural sanity: triangles need edges
    for r in (full, sub):
        assert r.n_triangles >= 0
        if r.n_triangles:
            assert r.n_edges >= 3 and r.n_nodes >= 3


def test_winsorize_clip_fractions(spark, sf_dir):
    rows = curation.a_winsorize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # strictly-below-p05 (resp. above-p95) mass is at most ~5% + the
        # interpolation row
        assert r.n_lo <= 0.05 * r.n + 1
        assert r.n_hi <= 0.05 * r.n + 1
        assert r.p05_micros <= r.p95_micros
        # clamped sum bounded by the clamp range
        assert r.n * r.p05_micros <= r.sum_clamped_micros <= r.n * r.p95_micros


def test_stream_deadletter_exact_partition(spark, sf_dir):
    from good_enough_timecamp_data_pipeline_spark.streaming.windows import (
        streaming_deadletter_split,
        validation_reasons,
    )
    from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table

    rows = {(r.route, r.reason): r.n for r in streaming_deadletter_split(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    # clean copy all valid; corrupted copy: event_id%3==0 → null_ts,
    # ==1 → unknown_type, ==2 → negative_value (value>0 in testdata)
    n_mod = {
        k: ev.filter(F.col("event_id") % 3 == k).count() for k in (0, 1, 2)
    }
    assert rows[("main", "ok")] == n_events
    assert rows[("quarantine", "null_ts")] == n_mod[0]
    assert rows[("quarantine", "unknown_type")] == n_mod[1]
    assert rows[("quarantine", "negative_value")] == n_mod[2]
    # exact partition: every fed row landed exactly once on one route
    # (reasons here are mutually exclusive, so reason-counts == row-counts)
    assert sum(rows.values()) == 2 * n_events
    # batch twin: the same validation projection on the same input
    batch_valid = ev.withColumn("r", validation_reasons()).filter(F.size("r") == 0).count()
    assert batch_valid == n_events


def test_embedding_drift_zero_identity_and_symmetry(spark, sf_dir):
    from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table

    out = {r.label: r for r in curation.s_embedding_drift(spark, sf_dir).collect()}
    assert out
    emb = load_table(spark, sf_dir, "embeddings")
    labels = [r.label for r in emb.select("label").distinct().collect()]
    assert sorted(out) == sorted(labels)
    for r in out.values():
        assert r.dims == 64
        assert r.n_ref + r.n_cur > 0
        assert r.drift_scaled >= 0
        assert r.l1_drift >= 0.0
    # identical cohorts → zero drift: feed a table where odd rows mirror
    # even rows exactly
    even = emb.filter(F.col("vec_id") % 2 == 0)
    mirrored = even.unionByName(
        even.select((F.col("vec_id") + 1).alias("vec_id"), "embedding", "label")
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "embeddings.parquet")
        mirrored.coalesce(1).write.parquet(p)
        zero = curation.s_embedding_drift(spark, d).collect()
        assert zero and all(r.drift_scaled == 0 for r in zero)


def test_skew_report_shares(spark, sf_dir):
    rows = curation.x_skew_report(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    # descending by count, deterministic tie-break
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(0 <= r.share_ppm <= 1_000_000 for r in rows)
    # ppm is exact integer division of the true total
    from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table

    total = load_table(spark, sf_dir, "events").count()
    for r in rows:
        assert r.share_ppm == (r.n * 1_000_000) // total


def test_hll_partial_merge_associative_and_bounded(spark, sf_dir):
    from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table

    merged = {
        (r.week, r.event_type): r.approx_users
        for r in curation.a_hll_partial_merge(spark, sf_dir).collect()
    }
    assert merged
    ev = load_table(spark, sf_dir, "events")
    # associativity: sketching the whole week directly gives the SAME
    # estimate as merging the daily sketches
    direct = {
        (r.week, r.event_type): r.approx_users
        for r in ev.groupBy(
            F.to_date(F.date_trunc("week", F.col("ts"))).alias("week"), "event_type"
        )
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"))
        .collect()
    }
    assert merged.keys() == direct.keys()
    for k in merged:
        assert merged[k] == direct[k], f"merge not associative for {k}"
    # error bound vs exact distinct (HLL default lgK=12 → ~1.6% rse; 5% is lax)
    exact = {
        (r.week, r.event_type): r.n
        for r in ev.groupBy(
            F.to_date(F.date_trunc("week", F.col("ts"))).alias("week"), "event_type"
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for k, est in merged.items():
        assert abs(est - exact[k]) <= max(0.05 * exact[k], 2)


def test_round5b_queries_survive_empty_tables(spark):
    """Empty-input battery for the round-5b batch: every query must plan
    and return empty (or a defined degenerate result) on zero-row tables."""
    import tempfile

    from pyspark.sql import types as T

    events_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    docs_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    emb_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    orders_schema = "o_custkey long, o_totalprice double"
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double"
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame([], events_schema).write.parquet(f"{d}/events.parquet")
        spark.createDataFrame([], docs_schema).write.parquet(f"{d}/documents.parquet")
        spark.createDataFrame([], emb_schema).write.parquet(f"{d}/embeddings.parquet")
        spark.createDataFrame([], orders_schema).write.parquet(f"{d}/orders.parquet")
        spark.createDataFrame([], li_schema).write.parquet(f"{d}/lineitem.parquet")
        for fn in (
            curation.t_ccnet_buckets,
            curation.t_line_dedup,
            curation.a_mad_outliers,
            curation.w_pareto_share,
            curation.a_winsorize,
            curation.x_skew_report,
            curation.a_hll_partial_merge,
            curation.s_embedding_drift,
            curation.g_triangle_count,
        ):
            out = fn(spark, d).collect()
            if fn is curation.g_triangle_count:
                # counts-of-nothing: one row of zeros is the defined result
                assert [tuple(r) for r in out] == [(0, 0, 0)], out
            else:
                assert out == [], fn.__name__


def test_warehouse_queries_survive_empty_tables(spark):
    import tempfile

    from good_enough_timecamp_data_pipeline_spark.plans import warehouse

    schemas = {
        "customer": "c_custkey long, c_name string, c_nationkey long",
        "supplier": "s_suppkey long, s_name string, s_nationkey long",
        "nation": "n_nationkey long, n_name string, n_regionkey long",
        "region": "r_regionkey long, r_name string",
        "orders": "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
        "lineitem": (
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_extendedprice double, l_discount double"
        ),
        "events": (
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ),
    }
    with tempfile.TemporaryDirectory() as d:
        for name, sch in schemas.items():
            spark.createDataFrame([], sch).write.parquet(f"{d}/{name}.parquet")
        assert warehouse.q_shipping_priority(spark, d).collect() == []
        assert warehouse.q_local_supplier_volume(spark, d).collect() == []
        assert warehouse.e_attribution(spark, d).collect() == []


def test_bm25_matches_reference_formula(spark):
    """Constructed corpus checked against a sequential BM25 implementation."""
    import math
    import os
    import tempfile

    corpus = {
        1: "spark table merge spark spark",
        2: "table table table other words here",
        3: "merge of the table",
        4: "nothing relevant at all",
        5: "spark",
    }
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(k, v) for k, v in corpus.items()], "doc_id long, text string"
        ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = {r.doc_id: (r.bm25, r.n_terms_hit) for r in curation.t_bm25_topk(spark, d).collect()}

    toks = {k: v.split() for k, v in corpus.items()}
    lens = {k: len(v) for k, v in toks.items()}
    n_docs = len(toks)
    avgdl = sum(lens.values()) / n_docs
    q = ("spark", "table", "merge")
    df_t = {t: sum(1 for v in toks.values() if t in v) for t in q}
    k1, b = curation.BM25_K1, curation.BM25_B
    expect = {}
    for doc, tl in toks.items():
        s, hits = 0.0, 0
        for t in q:
            tf = tl.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log((n_docs - df_t[t] + 0.5) / (df_t[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * lens[doc] / avgdl))
        if hits:
            expect[doc] = (round(s, 4), hits)
    assert got == expect
    # the all-terms doc must outrank the single-term docs
    assert got[1][0] == max(v[0] for v in got.values())


def test_label_propagation_density_vs_reachability(spark):
    from good_enough_timecamp_data_pipeline_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    # two triangles joined by ONE bridge edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "src long, dst long",
    )
    lpa = {r.node: r.community for r in label_propagation(edges, max_iter=6).collect()}
    # density grouping: the bridge does NOT merge the triangles
    assert lpa[1] == lpa[2] == lpa[3]
    assert lpa[10] == lpa[11] == lpa[12]
    assert lpa[1] != lpa[10]
    # reachability grouping DOES merge them — the documented contrast
    cc = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert len(set(cc.values())) == 1
    # deterministic across runs
    again = {r.node: r.community for r in label_propagation(edges, max_iter=6).collect()}
    assert again == lpa


def test_product_quantization_compresses_and_reconstructs(spark, sf_dir):
    import math

    from good_enough_timecamp_data_pipeline_spark.operators.clustering import (
        product_quantize,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes, book = product_quantize(emb, n_subspaces=8, n_centroids=8, n_iter=3)
    n = emb.count()
    assert codes.count() == n
    rows = codes.collect()
    assert all(len(r.code) == 8 and all(0 <= c < 8 for c in r.code) for r in rows)
    # reconstruction beats the trivial all-zeros quantizer: decoded MSE
    # must be below the corpus second moment
    cb = {(r.subspace, r.centroid_id): r.centroid for r in book.collect()}
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    width = len(next(iter(vecs.values()))) // 8
    sq_err = 0.0
    sq_norm = 0.0
    for r in rows:
        v = vecs[r.vec_id]
        for s, cid in enumerate(r.code):
            cent = cb[(s, cid)]
            for p in range(width):
                x = float(v[s * width + p])
                sq_err += (x - cent[p]) ** 2
                sq_norm += x * x
    # near-random 64-dim testdata gives modest (but real) gain at 3
    # bits/subspace — require the quantizer to capture at least ~25% of
    # the corpus energy (measured ≈ 0.68 ratio; 0.9 guards regressions
    # to a degenerate single-codeword book)
    assert sq_err < 0.9 * sq_norm, (sq_err, sq_norm)


def test_g_communities_and_pq_catalog_entries_run(spark, sf_dir):
    sizes = curation.g_communities(spark, sf_dir).collect()
    assert sizes and all(r.size >= 1 and r.n_communities >= 1 for r in sizes)
    usage = curation.s_pq_codes(spark, sf_dir).collect()
    assert len(usage) == 4
    assert all(1 <= r.codewords_used <= 16 for r in usage)


def test_pq_encode_matches_train_time_assignment(spark, sf_dir):
    """pq_encode against an existing codebook must reproduce the
    nearest-centroid assignment product_quantize itself computed for the
    training vectors (same codebook ⇒ same codes)."""
    from good_enough_timecamp_data_pipeline_spark.operators.clustering import (
        pq_encode,
        product_quantize,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    codes, book = product_quantize(emb, n_subspaces=4, n_centroids=8, n_iter=2)
    re_encoded = pq_encode(emb, book)
    train = {r.vec_id: list(r.code) for r in codes.collect()}
    probe = {r.vec_id: list(r.code) for r in re_encoded.collect()}
    assert probe == train


def test_mad_outliers_bucketed_tier_matches_classic(spark, sf_dir, monkeypatch):
    """The cost-switch's THREE tiers must be value-identical: classic
    grouped-median (the sf0.01 default), driver-histogram quantiles
    (forced via max_single_reducer_rows=0), and the distributed cumsum
    tier (additionally forcing the driver-histogram cap to 0)."""
    classic = {
        r.event_type: (r.n, r.n_outliers, r.med, r.mad)
        for r in curation.a_mad_outliers(spark, sf_dir).collect()
    }
    driver_tier = {
        r.event_type: (r.n, r.n_outliers, r.med, r.mad)
        for r in curation.a_mad_outliers(
            spark, sf_dir, max_single_reducer_rows=0
        ).collect()
    }
    monkeypatch.setattr(curation, "_DRIVER_HISTOGRAM_MAX_ROWS", 0)
    cumsum_tier = {
        r.event_type: (r.n, r.n_outliers, r.med, r.mad)
        for r in curation.a_mad_outliers(
            spark, sf_dir, max_single_reducer_rows=0
        ).collect()
    }
    assert classic == driver_tier == cumsum_tier and classic


def test_mad_outliers_bucketed_tier_empty_input(spark, tmp_path):
    events_schema = (
        "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    d = str(tmp_path)
    spark.createDataFrame([], events_schema).write.parquet(f"{d}/events.parquet")
    out = curation.a_mad_outliers(spark, d, max_single_reducer_rows=-1).collect()
    assert out == []


def test_line_dedup_packed_key_guard_raises_out_of_domain(spark):
    """Round-12 ADVICE: a pos past 2^POS_BITS (doc over ~10.5M tokens)
    must fail loudly, never bleed into doc_id bits and silently corrupt
    winner selection. In-domain rows still pack exactly."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from good_enough_timecamp_data_pipeline_spark.plans.curation import (
        POS_BITS,
        _packed_winner_key,
    )

    ok = spark.createDataFrame(
        [(3, 7), (5, (1 << POS_BITS) - 1)], "doc_id long, pos int"
    )
    got = sorted(r.packed for r in ok.select(_packed_winner_key().alias("packed")).collect())
    assert got == sorted([(3 << POS_BITS) | 7, (5 << POS_BITS) | ((1 << POS_BITS) - 1)])

    bad = spark.createDataFrame([(3, 1 << POS_BITS)], "doc_id long, pos int")
    with pytest.raises((SparkRuntimeException, Py4JJavaError, Exception)) as ei:
        bad.select(_packed_winner_key().alias("packed")).collect()
    assert "packable domain" in str(ei.value)

    big_doc = spark.createDataFrame(
        [(1 << (63 - POS_BITS), 0)], "doc_id long, pos int"
    )
    with pytest.raises(Exception) as ei2:
        big_doc.select(_packed_winner_key().alias("packed")).collect()
    assert "packable domain" in str(ei2.value)


def test_pareto_share_tier_parity(spark, sf_dir):
    """r13 cost switch: the single-window tier (customer footer count
    under the cap) and the bucketed global-cumsum tier must produce
    IDENTICAL rows — shares, cum_cents, and the is_top80 boundary."""
    small = sorted(
        tuple(r) for r in curation.w_pareto_share(spark, sf_dir).collect()
    )
    big = sorted(
        tuple(r)
        for r in curation.w_pareto_share(
            spark, sf_dir, max_single_window_rows=0
        ).collect()
    )
    assert small == big and small


def test_packed_sort_key_guard_in_domain_and_violations(spark):
    """Round-13 VERDICT item 2: the shared (hi, lo) long packing used by
    w_pareto_share and a_gini must pack exactly in-domain (including
    negative hi — the descending-revenue case), preserve null-in/null-out,
    and raise loudly in BOTH violation directions instead of wrapping."""
    from good_enough_timecamp_data_pipeline_spark.operators.order import (
        packed_sort_key,
    )

    bits = 24
    ok = spark.createDataFrame(
        [
            (-5, 7),
            (0, 0),
            ((1 << 39) - 1, (1 << 24) - 1),
            (-(1 << 39), 3),
            (None, 3),
        ],
        "hi long, lo long",
    )
    got = [
        r.k
        for r in ok.select(
            packed_sort_key(F.col("hi"), F.col("lo"), bits, "t").alias("k")
        ).collect()
    ]
    assert got == [
        -5 * (1 << 24) + 7,
        0,
        ((1 << 39) - 1) * (1 << 24) + (1 << 24) - 1,
        -(1 << 39) * (1 << 24) + 3,
        None,
    ]
    # packing preserves the (hi, lo) lexicographic order across signs
    vals = [g for g in got if g is not None]
    rows = [(h, l) for h, l in [(-5, 7), (0, 0), ((1 << 39) - 1, (1 << 24) - 1), (-(1 << 39), 3)]]
    assert sorted(range(4), key=lambda i: vals[i]) == sorted(
        range(4), key=lambda i: rows[i]
    )

    for hi, lo in [
        (1 << 39, 0),        # hi too large
        (-(1 << 39) - 1, 0), # hi too negative
        (0, 1 << 24),        # lo overflows its field
        (0, -1),             # lo negative
    ]:
        bad = spark.createDataFrame([(hi, lo)], "hi long, lo long")
        with pytest.raises(Exception) as ei:
            bad.select(
                packed_sort_key(F.col("hi"), F.col("lo"), bits, "t").alias("k")
            ).collect()
        assert "packable domain" in str(ei.value)


def test_pareto_and_gini_guard_wired_to_domain_violation(spark, tmp_path):
    """The guard must actually fire through the full w_pareto_share and
    a_gini plans when a custkey exceeds its 2^24 bit field."""
    from good_enough_timecamp_data_pipeline_spark.plans import warehouse

    d = str(tmp_path)
    spark.createDataFrame(
        [(1, 1 << 24, 10.0), (2, 3, 20.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.parquet(f"{d}/orders.parquet")
    with pytest.raises(Exception) as ei:
        curation.w_pareto_share(spark, d).collect()
    assert "packable domain" in str(ei.value)
    with pytest.raises(Exception) as ei2:
        warehouse.a_gini(spark, d).collect()
    assert "packable domain" in str(ei2.value)
