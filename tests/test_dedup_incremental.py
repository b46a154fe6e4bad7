

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
