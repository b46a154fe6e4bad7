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


def test_streaming_sliding_covers_tumbling(spark, sf_dir):
    from good_enough_timecamp_data_pipeline_spark.streaming.windows import (
        streaming_sliding_counts,
    )

    slide = streaming_sliding_counts(spark, sf_dir).collect()
    # every event lands in exactly window/slide = 4 overlapping windows
    total_batch = sum(
        r.n for r in e_tumbling_window(spark, sf_dir).collect()
    )
    assert sum(r.n for r in slide) == 4 * total_batch


def test_stateful_sessionize_matches_batch_invariant(spark, sf_dir):
    """Closed-session emission must equal the window-function answer minus
    the still-open tail session of each user."""
    from good_enough_timecamp_data_pipeline_spark.plans.relational import e_sessionize
    from good_enough_timecamp_data_pipeline_spark.streaming.stateful import (
        streaming_sessionize,
    )

    batch = e_sessionize(spark, sf_dir).collect()
    expected_closed = sum(r.n_sessions for r in batch) - len(batch)  # minus tails
    emitted = streaming_sessionize(spark, sf_dir).collect()
    assert len(emitted) == expected_closed
    assert all(r.session_end_us >= r.session_start_us for r in emitted)
    assert all(r.n_events >= 1 for r in emitted)
