"""Multimodal plumbing + streaming surface tests."""

import pytest
from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.operators import multimodal
from good_enough_timecamp_data_pipeline_spark.plans.relational import e_tumbling_window
from good_enough_timecamp_data_pipeline_spark.streaming.windows import (
    streaming_tumbling_counts,
)


def test_attach_binary_payload(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    row = multimodal.attach_binary_payload(df, mime="text/plain").first()
    assert bytes(row.payload) == b"hello"
    assert row.meta.n_bytes == 5 and row.meta.mime == "text/plain"


def test_extract_features_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "doc_id long, text string"
    )
    media = multimodal.attach_binary_payload(df)
    a = {r.doc_id: r for r in multimodal.extract_features(media).collect()}
    b = {r.doc_id: r for r in multimodal.extract_features(media).collect()}
    assert a[1].feat == b[1].feat  # deterministic stub
    assert len(a[1].feat) == 8
    assert a[1].n_bytes == 11
    assert a[2].n_bytes == 0  # empty payload doesn't crash the batch path


def test_decode_image_is_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_streaming_matches_batch(spark, sf_dir):
    batch = {
        (r.window_start, r.event_type): (r.n, r.value_cents)
        for r in e_tumbling_window(spark, sf_dir).collect()
    }
    stream = {
        (r.window_start, r.event_type): (r.n, r.value_cents)
        for r in streaming_tumbling_counts(spark, sf_dir).collect()
    }
    assert stream == batch
