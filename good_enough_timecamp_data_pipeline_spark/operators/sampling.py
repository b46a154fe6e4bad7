"""Deterministic hash-based sampling & dataset splits (north-star tier).

Training pipelines need splits that are (a) reproducible across runs and
engines, (b) stable under insertion/deletion of OTHER rows, (c) computable
without any global state — which rules out ``rand()`` and row-number
partitioning. The standard answer: bucket each row by a hash of its id and
cut the bucket space by the split weights. md5 keeps it engine-portable
(DuckDB: ``CAST('0x'||substr(md5(id),1,8) AS BIGINT)`` ≡ Spark:
``conv(substr(md5(id),1,8),16,10)`` — oracle-verified).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(id_col: Column | str, n_buckets: int = N_BUCKETS) -> Column:
    """Stable bucket in [0, n_buckets) from the md5 of the row id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h32 = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return h32 % n_buckets


def hash_split(
    df: DataFrame, id_col: str, splits: dict[str, float], out_col: str = "split"
) -> DataFrame:
    """Assign every row to a named split by cumulative bucket thresholds.

    ``splits`` weights must sum to 1 (validated); boundaries are exact
    integer bucket counts so both engines cut identically.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col)
    expr = None
    acc = 0
    names = list(splits)
    for name in names[:-1]:
        acc += int(round(splits[name] * N_BUCKETS))
        cond = bucket < acc
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def deterministic_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Reproducible ~fraction sample, stable under unrelated inserts."""
    return df.filter(hash_bucket(id_col) < int(round(fraction * N_BUCKETS)))
