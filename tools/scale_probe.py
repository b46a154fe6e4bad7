"""Empirical scaling probe: how the heavy operators behave as data grows.

Scales the *fact* side 1×..8× while dimensions stay fixed (the 100 TB
shape: facts grow, dims don't), then times each probe and prints the
scaling ratio table recorded in ARCHITECTURE.md. Scaled copies get
shifted keys; document text for the dedup probe is synthesized from
hashes so copies are dissimilar (otherwise output pairs — not runtime —
would grow quadratically and poison the measurement).

Usage::  python tools/scale_probe.py [base_sf_dir] [factors...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.operators import dedup, similarity
from good_enough_timecamp_data_pipeline_spark.operators.graph import connected_components, pagerank
from good_enough_timecamp_data_pipeline_spark.plans import advanced, curation, reports
from good_enough_timecamp_data_pipeline_spark.session import get_spark

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
# Parse FACTORS lazily under __main__ (end of file), not at import time:
# importers like tools/sf10_compare.py carry their OWN flags in sys.argv
# (e.g. --attempts), which crashed this int() on import (r15).
FACTORS = [1, 2, 4, 8]


def scaled_dir(spark, factor: int, base: str | None = None) -> str:
    """Synthesize a fact-scaled copy of ``base`` (default the CLI BASE):
    dims symlinked unchanged, facts unioned with shifted keys, document
    text synthesized dissimilar per copy. Also used by
    tools/sf1_compare.py to produce the sf1 measurement point."""
    base = base or BASE
    out = tempfile.mkdtemp(prefix=f"scale_{factor}x_")
    # dims: unchanged (copy refs)
    for t in ("region", "nation", "customer", "part", "supplier", "embeddings"):
        os.symlink(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    # events: scaled fact (same timestamps/types, shifted ids — window
    # counts grow with the factor, the hot-window dimension does not)
    events = spark.read.parquet(f"{base}/events.parquet")
    ev_scaled = events
    for k in range(1, factor):
        ev_scaled = ev_scaled.unionByName(
            events.withColumn("event_id", F.col("event_id") + F.lit(k * 100_000_000))
        )
    ev_scaled.write.mode("overwrite").parquet(f"{out}/events.parquet")
    # facts: union with shifted keys
    orders = spark.read.parquet(f"{base}/orders.parquet")
    scaled = orders
    for k in range(1, factor):
        scaled = scaled.unionByName(
            orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * 100_000_000))
        )
    scaled.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    # documents: synthesize dissimilar 50-token docs per copy
    docs = spark.read.parquet(f"{base}/documents.parquet")
    parts = [docs]
    for k in range(1, factor):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(50)),
                        lambda i: F.substring(
                            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"_{k}_"), i.cast("string"))),
                            1,
                            8,
                        ),
                    ),
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out_docs = parts[0]
    for p in parts[1:]:
        out_docs = out_docs.unionByName(p)
    out_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    # lineitem: scaled with ALL keys shifted per copy → the co-purchase
    # graph gains DISJOINT copies (edges, wedges and triangles all scale
    # linearly) — measures the triangle join machinery, not graph
    # densification
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    li_scaled = li
    for k in range(1, factor):
        li_scaled = li_scaled.unionByName(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 100_000_000))
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(k * 100_000_000))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(k * 100_000_000))
        )
    li_scaled.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    return out


def probe(spark, sf_dir: str) -> dict[str, float]:
    res = {}
    t0 = time.time()
    reports.report_task_budget(spark, sf_dir).write.format("noop").mode("overwrite").save()
    res["report_task_budget"] = time.time() - t0
    spark.catalog.clearCache()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    t0 = time.time()
    dedup.minhash_lsh_pairs(docs, n=5, num_hashes=64, bands=32, threshold=0.5).write.format(
        "noop"
    ).mode("overwrite").save()
    res["minhash_lsh"] = time.time() - t0
    spark.catalog.clearCache()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    corpus = emb
    # embeddings scale with the document factor: reuse the shifted union
    factor = max(1, spark.read.parquet(f"{sf_dir}/documents.parquet").count() // 5000)
    for k in range(1, factor):
        corpus = corpus.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10_000_000))
        )
    t0 = time.time()
    similarity.brute_force_topk(corpus, queries, k=10).write.format("noop").mode(
        "overwrite"
    ).save()
    res["cosine_topk"] = time.time() - t0
    spark.catalog.clearCache()

    # range join: fact grows, hot-window dim fixed — ideal is linear scan
    t0 = time.time()
    advanced.x_range_join(spark, sf_dir).write.format("noop").mode("overwrite").save()
    res["range_join"] = time.time() - t0
    spark.catalog.clearCache()

    # incremental dedup: FIXED 200-doc arriving batch vs the SCALED corpus,
    # probing a PREBUILT index (built untimed, read back from parquet) —
    # the production claim is per-batch cost ~O(batch) given the index;
    # the residual growth is the columnar scan of index shingles/buckets
    idx_dir = tempfile.mkdtemp(prefix="lsh_index_")
    docs_all = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    sh_idx, b_idx = dedup.build_lsh_index(docs_all, n=5, num_hashes=64, bands=32)
    sh_idx.write.mode("overwrite").parquet(f"{idx_dir}/shingles")
    b_idx.write.mode("overwrite").parquet(f"{idx_dir}/buckets")
    batch = docs_all.filter(F.col("doc_id") % 25 == 0).filter(
        F.col("doc_id") < 5000
    ).select(
        (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq zz vv ww yy")).alias("text"),
    )
    index = (
        spark.read.parquet(f"{idx_dir}/shingles"),
        spark.read.parquet(f"{idx_dir}/buckets"),
    )
    t0 = time.time()
    dedup.incremental_lsh_pairs(
        batch, index=index, n=5, num_hashes=64, bands=32, threshold=0.5
    ).write.format("noop").mode("overwrite").save()
    res["incremental_dedup_probe"] = time.time() - t0
    spark.catalog.clearCache()
    shutil.rmtree(idx_dir, ignore_errors=True)

    # verify-stage isolation (the join the r5 de-broadcast changed):
    # dup-heavy corpus — 30% of docs get a near-dup twin — so the
    # candidate-id set grows WITH the corpus (O(dup_rate × corpus)), the
    # exact shape where a forced broadcast of candidate ids OOMs at
    # 100 TB. Shingles and candidates are materialized to parquet
    # UNTIMED; the timing covers only dedup.verify_candidate_pairs
    # (candidate-id union/distinct + hint-free semi-join + intersection
    # join + jaccard filter). Ideal curve: linear in corpus.
    vdir = tempfile.mkdtemp(prefix="lsh_verify_")
    docs_v = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    twins = docs_v.filter(F.col("doc_id") % 10 < 3).select(
        (F.col("doc_id") + F.lit(500_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    sh_v = dedup.shingle_rows(docs_v.unionByName(twins), n=5)
    sh_v.write.mode("overwrite").parquet(f"{vdir}/sh")
    sh_v = spark.read.parquet(f"{vdir}/sh")
    dedup.band_bucket_candidates(
        dedup.minhash_band_buckets(sh_v, num_hashes=64, bands=32)
    ).write.mode("overwrite").parquet(f"{vdir}/cand")
    cand_v = spark.read.parquet(f"{vdir}/cand")
    t0 = time.time()
    dedup.verify_candidate_pairs(sh_v, cand_v, threshold=0.5).write.format("noop").mode(
        "overwrite"
    ).save()
    res["lsh_verify_stage"] = time.time() - t0
    spark.catalog.clearCache()
    shutil.rmtree(vdir, ignore_errors=True)

    # connected components: decade-star edges from the scaled orders fact
    # (components of <=10 nodes, diameter 2 — the dedup-graph shape);
    # edge count scales with the factor, rounds stay constant
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    edges = orders.select(
        F.col("o_orderkey").alias("src"),
        (F.col("o_orderkey") - (F.col("o_orderkey") % 10)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    t0 = time.time()
    connected_components(edges).write.format("noop").mode("overwrite").save()
    res["cc_components"] = time.time() - t0
    spark.catalog.clearCache()

    # pagerank: same scaled edge set, FIXED 8 rounds — per-round work is
    # one keyed shuffle over the edges, so ideal is linear in the factor
    # (with heavy fixed per-round scheduling overhead at this scale)
    t0 = time.time()
    pagerank(edges, num_iter=8).write.format("noop").mode("overwrite").save()
    res["pagerank"] = time.time() - t0
    spark.catalog.clearCache()

    # C4 line dedup: corpus doubles → lines double, distinct lines double
    # (scaled doc copies are dissimilar by construction); ideal is linear
    # in the one line-keyed shuffle + survivor reassembly
    t0 = time.time()
    curation.t_line_dedup(spark, sf_dir).write.format("noop").mode("overwrite").save()
    res["line_dedup"] = time.time() - t0
    spark.catalog.clearCache()

    # triangle counting: scaled lineitem carries DISJOINT graph copies
    # (keys shifted per copy), so edges/wedges/triangles all grow with
    # the factor; ideal is linear in the two equi-joins
    t0 = time.time()
    curation.g_triangle_count(spark, sf_dir).write.format("noop").mode("overwrite").save()
    res["triangle_count"] = time.time() - t0
    spark.catalog.clearCache()

    # k-core peeling: disjoint scaled graph copies keep degrees (and so
    # the peeling DEPTH) constant while edges grow with the factor;
    # ideal is linear in the per-round degree agg + semi-joins
    from good_enough_timecamp_data_pipeline_spark.plans import round5e, round5f

    t0 = time.time()
    round5e.g_kcore(spark, sf_dir).write.format("noop").mode("overwrite").save()
    res["kcore"] = time.time() - t0
    spark.catalog.clearCache()

    # n-gram novelty: scaled docs are dissimilar by construction, so
    # shingle rows AND distinct shingles both grow with the factor;
    # ideal is linear in the first-seen hash-agg + join-back
    t0 = time.time()
    round5f.t_ngram_novelty(spark, sf_dir).write.format("noop").mode("overwrite").save()
    res["ngram_novelty"] = time.time() - t0
    spark.catalog.clearCache()
    return res


def main() -> None:
    spark = get_spark("scale_probe")
    # warm
    probe(spark, BASE)
    rows = []
    for f in FACTORS:
        d = scaled_dir(spark, f) if f > 1 else BASE
        r = probe(spark, d)
        rows.append((f, r))
        print(f"{f}x: " + ", ".join(f"{k}={v:.2f}s" for k, v in r.items()), flush=True)
        if f > 1:
            shutil.rmtree(d)
    base = rows[0][1]
    print("\nscaling ratios (time_f / time_1x; ideal == factor):")
    for f, r in rows[1:]:
        print(f"  {f}x: " + ", ".join(f"{k}={v / base[k]:.2f}" for k, v in r.items()))


if __name__ == "__main__":
    FACTORS = [int(a) for a in sys.argv[2:]] or FACTORS
    main()
