"""Tests for column-masking policies and lineage reads (egress hygiene)."""

import pytest
from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.operators.governance import (
    apply_masking_policy,
)
from good_enough_timecamp_data_pipeline_spark.sources.io import read_with_lineage


def test_masking_treatments(spark):
    df = spark.createDataFrame(
        [(1, "alice@example.com", "4111111111111111", 42.5)],
        "user_id long, email string, card string, score double",
    )
    out = apply_masking_policy(
        df,
        {"user_id": "hash", "email": "redact", "card": "last4", "score": "null"},
    ).collect()[0]
    import hashlib

    assert out.user_id == hashlib.sha256(b"1").hexdigest()
    assert out.email == "***"
    assert out.card == "*" * 12 + "1111"
    assert out.score is None
    # schema: hashed/redacted become strings, nulled keeps its type
    schema = dict(
        apply_masking_policy(
            df, {"user_id": "hash", "email": "redact", "card": "last4", "score": "null"}
        ).dtypes
    )
    assert schema == {
        "user_id": "string",
        "email": "string",
        "card": "string",
        "score": "double",
    }


def test_masking_strict_fails_closed(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    with pytest.raises(ValueError, match="must cover every column"):
        apply_masking_policy(df, {"a": "hash"})
    with pytest.raises(ValueError, match="absent columns"):
        apply_masking_policy(df, {"a": "hash", "zz": "keep"}, strict=False)
    # short strings: last4 keeps what exists, masks nothing negative
    row = apply_masking_policy(df, {"a": "keep", "b": "last4"}).collect()[0]
    assert row.b == "x"
    # non-strict passthrough
    row = apply_masking_policy(df, {"a": "hash"}, strict=False).collect()[0]
    assert row.b == "x"


def test_read_with_lineage(spark, sf_dir):
    df = read_with_lineage(spark, f"{sf_dir}/nation.parquet")
    rows = df.limit(3).collect()
    assert rows
    for r in rows:
        assert r._source_file.endswith(".parquet")
        assert r._source_bytes > 0
        assert r._source_mtime is not None
    # lineage must not perturb the data read
    plain = spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    assert df.count() == plain
