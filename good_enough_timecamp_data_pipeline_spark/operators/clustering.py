"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The iterative-algorithm tier of the similarity stack (SURVEY §2.11): IVF
ANN (`operators/similarity.py::ivf_topk`) *assigns* to fixed centroids;
this *learns* the centroids — the standard preprocessing step for IVF
index builds, diversity-aware sampling, and cluster-balanced training
mixes.

Physical design — the textbook distributed Lloyd layout:

- Centroid state (k·d doubles) lives on the driver and ships to executors
  as a Spark broadcast each round, as in every engine's k-means.
- Per iteration, ONE narrow action: an Arrow-batched ``mapInPandas`` pass
  computes, per input partition, the numpy-vectorized nearest-centroid
  assignment and the per-cluster partial sums (Σx per dim, count,
  Σ sq_dist). Each partition emits k tiny rows; the driver reduces
  (#partitions × k) rows into new means + inertia. No shuffle at all —
  the reduction over partials is the collect of a few KB.
- The assignment DataFrame returned to callers is the same numpy map
  against the final centroids — embarrassingly parallel at any scale.

This is the documented exception to the "built-ins first" rule
(SURVEY §2.9): the distance kernel is dense linear algebra over every
(vector, centroid) pair. Three pure-DataFrame designs were measured —
per-row HOF folds (interpreted, re-evaluated per reference: 33 s at
sf0.1), a centroid crossJoin (~4 actions/iter: 11.7 s), and an exploded
(vec_id, dim, x) cell join grid (~2 s/iter, the previous shipped form).
The Arrow/numpy kernel does the same flops vectorized in C with zero
shuffle, and is the layout every large-scale implementation (MLlib
included) uses.

Floating-point means are order-sensitive, so the operator is rows-only
(no DuckDB oracle); tests assert the Lloyd invariants instead: inertia
monotonically non-increasing, every vector on its nearest centroid.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _nearest(X: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(assignment, sq_dist) per row; argmin takes the LOWEST cluster id on
    exact ties — same tie-break as a min over (dist, cluster) structs."""
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(X)), a]


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
    id_type = dict(vecs.dtypes)[id_col]
    data = vecs.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    init = [list(r["v"]) for r in data.orderBy("vec_id").limit(k).collect()]
    if not init:
        data.unpersist()
        raise ValueError("kmeans: input has no vectors")
    # fewer vectors than requested clusters: every vector is its own
    # centroid (k silently clamps — the later np.zeros(k) state arrays
    # must match the true centroid count or assignment indexes past them)
    k = min(k, len(init))
    centroids = np.array(init)

    inertia_history: list[float] = []
    for _ in range(max_iter):
        bc = spark.sparkContext.broadcast(centroids)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C = bc.value
            S = np.zeros_like(C)
            cnt = np.zeros(len(C), dtype=np.int64)
            sd = np.zeros(len(C))
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["v"].to_numpy())
                a, sq = _nearest(X, C)
                for j in range(len(C)):
                    m = a == j
                    if m.any():
                        S[j] += X[m].sum(axis=0)
                        cnt[j] += int(m.sum())
                        sd[j] += float(sq[m].sum())
            yield pd.DataFrame(
                {
                    "cluster": np.arange(len(C), dtype=np.int32),
                    "sx": [S[j].tolist() for j in range(len(C))],
                    "n": cnt,
                    "sd": sd,
                }
            )

        grid = data.mapInPandas(
            partials, "cluster int, sx array<double>, n bigint, sd double"
        ).collect()  # (#partitions × k) tiny rows

        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for r in grid:
            sums[r["cluster"]] += np.asarray(r["sx"])
            counts[r["cluster"]] += r["n"]
            inertia += r["sd"]
        if inertia_history and inertia >= inertia_history[-1]:
            inertia_history.append(inertia)
            break  # converged (or fp-noise oscillation) — stop moving
        inertia_history.append(inertia)
        moved = counts > 0  # empty clusters keep their centroid
        centroids = centroids.copy()
        centroids[moved] = sums[moved] / counts[moved, None]

    bc_final = spark.sparkContext.broadcast(centroids)

    def assign_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc_final.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["v"].to_numpy())
            a, sq = _nearest(X, C)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cluster": a.astype(np.int32), "sq_dist": sq}
            )

    assign = data.mapInPandas(
        assign_fn, f"vec_id {id_type}, cluster int, sq_dist double"
    )
    return assign, inertia_history


def product_quantize(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_subspaces: int = 8,
    n_centroids: int = 16,
    n_iter: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Product quantization (PQ) of an embedding column: split each
    D-dim vector into ``n_subspaces`` contiguous sub-vectors, k-means
    each subspace independently (``n_centroids`` codewords), and encode
    every vector as its per-subspace nearest-codeword ids — D floats
    become ``n_subspaces`` bytes (Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011).

    THE storage/recall trade for vector search at 100 TB: a 64-dim
    float32 corpus compresses 32× (256 B → 8 B/vector) and ANN distance
    becomes a table lookup per subspace. Returns ``(codes, codebook)``:
    codes = (id, code array<int>), codebook = (subspace, centroid_id,
    centroid array<double>).

    Scale shape: subspace slicing is a codegen projection; each
    subspace's k-means is the module's distributed Lloyd loop
    (mapInPandas partial sums, (partitions×k)-bounded driver traffic);
    encoding is one broadcast of the (n_subspaces×n_centroids) codebook
    + an expression-level argmin — no shuffle at all on the encode pass.
    """
    from pyspark.sql import functions as F

    d = emb.select(id_col, vec_col)
    dim = len(d.select(vec_col).first()[0])
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces} subspaces")
    width = dim // n_subspaces

    books = []
    for s in range(n_subspaces):
        sub = d.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), s * width + 1, width).alias("embedding"),
        )
        assign, _ = kmeans(sub, k=n_centroids, max_iter=n_iter)
        # codewords = per-cluster dimension means of the final assignment
        # (one combinable hash-agg; n_centroids × width scalars collected)
        cent_rows = (
            assign.join(sub, "vec_id")
            .select("cluster", F.posexplode("embedding").alias("p", "x"))
            .groupBy("cluster", "p")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in cent_rows:
            by_cid.setdefault(r.cluster, {})[r.p] = r.m
        # renumber codewords densely (an empty cluster would leave a gap,
        # and code ids are POSITIONS in the per-subspace codeword list)
        for new_cid, cid in enumerate(sorted(by_cid)):
            dims = by_cid[cid]
            books.append((s, new_cid, [dims[p] for p in range(width)]))
    spark = emb.sparkSession
    codebook = spark.createDataFrame(
        books, "subspace int, centroid_id int, centroid array<double>"
    )

    # encode: broadcast codebook as a literal expression table — argmin of
    # squared distance per subspace, all inside codegen
    by_sub: dict[int, list[list[float]]] = {}
    for s, cid, c in books:
        by_sub.setdefault(s, []).append(c)

    def code_expr(s: int):
        sub = F.slice(F.col(vec_col), s * width + 1, width)
        dists = F.array(*[
            F.aggregate(
                F.zip_with(
                    sub,
                    F.array(*[F.lit(x) for x in cent]),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for cent in by_sub[s]
        ])
        return F.array_position(dists, F.array_min(dists)).cast("int") - 1

    codes = d.select(
        F.col(id_col),
        F.array(*[code_expr(s) for s in range(n_subspaces)]).alias("code"),
    )
    return codes, codebook
