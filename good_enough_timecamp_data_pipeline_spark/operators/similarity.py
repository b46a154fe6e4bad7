"""Embedding similarity search (SURVEY §2.11 north-star).

- `cosine` / `dot` build on ``zip_with`` + a *sequential left fold*
  (``F.aggregate``) so the float summation order is fixed — that's what
  lets DuckDB's ``list_reduce`` fold reproduce the result bit-for-bit for
  the oracle.
- `brute_force_topk`: baseline exact ANN — query set × corpus cross join
  with the corpus norms precomputed, per-query top-k via window. At scale
  the corpus side stays partitioned, the (small) query set broadcasts, and
  per-query ranking is a single shuffle on query_id.
- `lsh_topk`: the scale path — sign-random-projection (SimHash-for-
  vectors) buckets; only vectors sharing a bucket are compared. The
  hyperplanes are pseudo-random but fully deterministic (seeded hash of
  (plane, dim)), so results are reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(vec: Column | str) -> Column:
    return F.transform(_c(vec), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for every row of ``queries``.

    Output: (query_id, neighbor_id, score, rank), self-matches excluded,
    ties broken by neighbor id (fully deterministic).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_cvec")
    ).withColumn("_cnorm", norm("_cvec"))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qvec")
    ).withColumn("_qnorm", norm("_qvec"))

    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", dot("_qvec", "_cvec") / (F.col("_qnorm") * F.col("_cnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _plane_component(plane: int, dim_index: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    h = F.xxhash64(F.lit(plane), dim_index)
    return (h % 2001).cast("double") / 1000.5  # symmetric-ish around 0


def srp_bucket(vec: Column | str, n_planes: int = 16) -> Column:
    """Sign-random-projection bucket id: one bit per hyperplane."""
    v = as_double(vec)
    idx = F.sequence(F.lit(0), F.size(v) - 1)
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(v, idx, lambda x, i: x * _plane_component(p, i)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2 ** p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within SRP buckets.

    With ``n_planes`` bits the corpus splits into 2^n buckets → compare
    cost drops ~2^n-fold; recall loss is the ANN trade-off (raise recall
    by multi-probing or fewer planes). Same output schema as brute force.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("_cvec"),
    ).withColumn("_cnorm", norm("_cvec")).withColumn(
        "_bucket", srp_bucket("_cvec", n_planes)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qvec")
    ).withColumn("_qnorm", norm("_qvec")).withColumn(
        "_bucket", srp_bucket("_qvec", n_planes)
    )
    scored = (
        F.broadcast(q)
        .join(c, "_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", dot("_qvec", "_cvec") / (F.col("_qnorm") * F.col("_cnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def neardup_pairs_blocked(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-dup pairs within equality blocks (id_a < id_b).

    Blocking on a cheap equality key (label, minhash band, SRP bucket)
    turns the all-pairs O(n²) into sum of per-block squares — the standard
    scale move; callers pick the blocking column.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        as_double(vec_col).alias("vec"),
    ).withColumn("nrm", norm("vec"))
    return (
        v.alias("a")
        .join(
            v.alias("b"),
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn(
            "score",
            dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.nrm") * F.col("b.nrm")),
        )
        .filter(F.col("score") >= threshold)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), F.col("score")
        )
    )
