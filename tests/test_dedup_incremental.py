

def test_lsh_index_artifact_reuse(spark, sf_dir, tmp_path):
    """Round-5 VERDICT item 8: the second build call must READ the parquet
    artifact, not rebuild it — asserted via artifact file mtimes and the
    probe plan scanning the artifact path."""
    import glob
    import os

    from good_enough_timecamp_data_pipeline_spark.operators import dedup
    from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = str(tmp_path / "lsh_cache")
    idx1 = dedup.build_lsh_index_cached(
        spark, docs, cache_key="fixture", cache_root=root
    )
    files = sorted(glob.glob(os.path.join(root, "*", "*", "part-*")))
    assert files, "first call must land the artifact"
    mtimes = [os.stat(f).st_mtime_ns for f in files]

    idx2 = dedup.build_lsh_index_cached(
        spark, docs, cache_key="fixture", cache_root=root
    )
    assert [os.stat(f).st_mtime_ns for f in files] == mtimes  # no rebuild
    # the returned index scans the artifact, not the corpus text pipeline
    for part in idx2:
        ins = part.inputFiles()
        assert ins and all(root in f for f in ins)
    # and the probe actually works against the re-read index
    assert dedup.incremental_lsh_pairs(docs.limit(5), index=idx2, threshold=0.5).count() >= 0
    # identical index contents either way
    assert idx1[1].count() == idx2[1].count()


def test_containment_index_artifact_reuse(spark, sf_dir, tmp_path):
    """Round-10 ADVICE item 1: the containment measure gets the same
    write-once artifact discipline as the LSH index — second build call
    READS the parquet artifact; the artifact is threshold-free (one
    landing serves every threshold); probe results match the
    in-session index exactly."""
    import glob
    import os

    import pytest
    from pyspark.sql import functions as F

    from good_enough_timecamp_data_pipeline_spark.operators import dedup
    from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.limit(8).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    root = str(tmp_path / "cont_cache")
    idx1 = dedup.build_containment_index_cached(
        spark, docs, cache_key="fixture", cache_root=root, threshold=0.9
    )
    files = sorted(glob.glob(os.path.join(root, "*", "*", "part-*")))
    assert files, "first call must land the artifact"
    mtimes = [os.stat(f).st_mtime_ns for f in files]

    # a DIFFERENT threshold reuses the same artifact (prefix derives at
    # read time from the stored rank column)
    idx2 = dedup.build_containment_index_cached(
        spark, docs, cache_key="fixture", cache_root=root, threshold=0.7
    )
    assert [os.stat(f).st_mtime_ns for f in files] == mtimes  # no rebuild
    for part in idx2:
        ins = part.inputFiles()
        assert ins and all(root in f for f in ins)

    # probe parity: cached index vs in-session build, exact same pairs
    fresh = dedup.build_containment_index(corpus_df=docs, threshold=0.9)
    got = sorted(
        (r.id_new, r.dup_of, r.n_inter)
        for r in dedup.incremental_containment_pairs(
            batch, index=idx1, threshold=0.9
        ).collect()
    )
    want = sorted(
        (r.id_new, r.dup_of, r.n_inter)
        for r in dedup.incremental_containment_pairs(
            batch, index=fresh, threshold=0.9
        ).collect()
    )
    assert got == want and got  # the identical-text batch must collide

    # key reuse across generations is an error when a fresh build is expected
    with pytest.raises(FileExistsError):
        dedup.build_containment_index_cached(
            spark, docs, cache_key="fixture", cache_root=root, expect_fresh=True
        )


def test_artifact_cache_housekeeping(spark, sf_dir, tmp_path):
    """Round-11 ADVICE item 4: entering an artifact root (a) sweeps
    orphaned *.tmp.<pid> build dirs older than an hour, (b) evicts the
    oldest generation-keyed artifacts past SPARK_GRAFT_ARTIFACT_KEEP
    (LRU: reads refresh mtime), and (c) never touches a FRESH tmp dir
    (a live concurrent builder)."""
    import os
    import time

    from good_enough_timecamp_data_pipeline_spark.operators import dedup
    from good_enough_timecamp_data_pipeline_spark.plans.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    root = str(tmp_path / "cache")
    os.makedirs(root)
    stale_tmp = os.path.join(root, "deadbeef.tmp.12345")
    fresh_tmp = os.path.join(root, "cafebabe.tmp.67890")
    os.makedirs(stale_tmp)
    os.makedirs(fresh_tmp)
    old = time.time() - 7200
    os.utime(stale_tmp, (old, old))

    os.environ["SPARK_GRAFT_ARTIFACT_KEEP"] = "2"
    try:
        for gen in ("g1", "g2", "g3"):
            dedup.build_lsh_index_cached(
                spark, docs, cache_key=gen, cache_root=root
            )
            time.sleep(0.05)  # distinct mtimes for LRU ordering
    finally:
        del os.environ["SPARK_GRAFT_ARTIFACT_KEEP"]

    assert not os.path.isdir(stale_tmp), "stale tmp orphan must be swept"
    assert os.path.isdir(fresh_tmp), "fresh tmp dir (live builder) kept"
    kept = [n for n in os.listdir(root) if ".tmp." not in n]
    assert len(kept) == 2, f"keep-latest-2 eviction, got {kept}"

    # r13 (round-12 ADVICE): READS never evict — a concurrent process
    # mid-scan on an older key must not lose its files to our read, even
    # under a keep budget the current population already exceeds.
    os.environ["SPARK_GRAFT_ARTIFACT_KEEP"] = "1"
    try:
        dedup.build_lsh_index_cached(spark, docs, cache_key="g3", cache_root=root)
    finally:
        del os.environ["SPARK_GRAFT_ARTIFACT_KEEP"]
    still = [n for n in os.listdir(root) if ".tmp." not in n]
    assert len(still) == 2, f"read path must not evict, got {still}"
