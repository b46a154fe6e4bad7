"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The iterative-algorithm tier of the similarity stack (SURVEY §2.11): IVF
ANN (`operators/similarity.py::ivf_topk`) *assigns* to fixed centroids;
this *learns* the centroids — the standard preprocessing step for IVF
index builds, diversity-aware sampling, and cluster-balanced training
mixes.

Physical design — everything stays in whole-stage codegen:

- The corpus is exploded ONCE into (vec_id, dim, x) cells and persisted;
  every iteration reuses that cache (the explode does not depend on the
  centroids). Cells are the join-friendly layout: k·d centroid cells
  broadcast against them turns the distance computation into a plain
  sum-of-squares grid aggregation.
- Per iteration, ONE Spark action: cells ⋈ centroid-cells → per
  (vec, cluster) squared-L2 agg → per-vec arg-min (min over (dist,
  cluster) structs — fully tie-broken) → re-join to cells → (cluster,
  dim) grid agg of (Σx, n, Σsq_dist). The collected k·d grid yields the
  new means AND the inertia (Σ sq_dist appears once per dim → divide by
  d) — convergence costs no extra job.
- Centroid state (k·d doubles) lives on the driver, as in every engine's
  k-means; it returns to the executors as a broadcast literal table.

Two designs measured and rejected at sf0.1 (2000×64): per-row
zip_with/aggregate HOF folds against literal centroid arrays run
interpreted and get re-evaluated per projection reference (CollapseProject
duplicates them) — 33 s; a DataFrame-centroid crossJoin variant scheduled
~4 actions per iteration — 11.7 s. This layout: ~1 s per iteration.

Floating-point means are order-sensitive, so the operator is rows-only
(no DuckDB oracle); tests assert the Lloyd invariants instead: inertia
monotonically non-increasing, every vector on its nearest centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _centroid_cells(spark: SparkSession, centroids: list[list[float]]) -> DataFrame:
    rows = [(j, d, x) for j, c in enumerate(centroids) for d, x in enumerate(c)]
    return spark.createDataFrame(rows, "cluster int, dim int, c double")


def _best_per_vec(expl: DataFrame, cells: DataFrame) -> DataFrame:
    """(vec_id, b{sq, cluster}) — nearest centroid per vector."""
    sq = (
        expl.join(F.broadcast(cells), "dim")
        .groupBy("vec_id", "cluster")
        .agg(
            F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("sq")
        )
    )
    return sq.groupBy("vec_id").agg(F.min(F.struct("sq", "cluster")).alias("b"))


def kmeans(
    vecs: DataFrame,
    k: int = 8,
    max_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """Lloyd iterations; returns (assignments, inertia_history).

    assignments: (vec_id, cluster, sq_dist), lazily computed against the
    final centroids. Initial centroids are the first k vectors by id —
    deterministic and cheap; k-means++ would be a k-round
    weighted-sampling prologue over the same machinery.
    """
    spark = vecs.sparkSession
    data = vecs.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    expl = data.select("vec_id", F.posexplode("v").alias("dim", "x")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    centroids: list[list[float]] = [
        list(r["v"]) for r in data.orderBy("vec_id").limit(k).collect()
    ]
    d = len(centroids[0])

    inertia_history: list[float] = []
    for _ in range(max_iter):
        cells = _centroid_cells(spark, centroids)
        best = _best_per_vec(expl, cells)
        grid = (
            expl.join(best, "vec_id")
            .groupBy(F.col("b.cluster").alias("cluster"), "dim")
            .agg(
                F.sum("x").alias("sx"),
                F.count("*").alias("n"),
                F.sum("b.sq").alias("sd"),
            )
            .collect()
        )
        inertia = sum(r["sd"] for r in grid) / d
        if inertia_history and inertia >= inertia_history[-1]:
            inertia_history.append(inertia)
            break  # converged (or fp-noise oscillation) — stop moving
        inertia_history.append(inertia)
        new_centroids = [list(c) for c in centroids]  # empty clusters keep theirs
        for r in grid:
            new_centroids[r["cluster"]][r["dim"]] = r["sx"] / r["n"]
        centroids = new_centroids

    assign = _best_per_vec(expl, _centroid_cells(spark, centroids)).select(
        "vec_id",
        F.col("b.cluster").alias("cluster"),
        F.col("b.sq").alias("sq_dist"),
    )
    return assign, inertia_history
