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
from pyspark.storagelevel import StorageLevel

from .order import global_row_number, md5_prefix_bucket


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


# Unresolved-Column cache for the fixed-name expression trees
# brute_force_topk builds per call: the nested zip_with+aggregate HOF
# lambdas cost ~100 Py4J round-trips each (~0.2 s of pure driver time per
# plan build, paid by every catalog/bench invocation). Columns are
# plan-free expression trees, safe to reuse across DataFrames and
# sessions within one JVM (same pattern as dedup._SIG_COLS).
_EXPR_CACHE: dict[str, Column] = {}


def _cached_expr(key: str, build) -> Column:
    col = _EXPR_CACHE.get(key)
    if col is None:
        col = build()
        _EXPR_CACHE[key] = col
    return col


def _query_side_fits_broadcast(q: DataFrame, max_rows: int) -> bool:
    """Size guard for the "small query set" broadcast contract.

    Batch-ANN at scale often makes the query set the corpus itself — a
    forced ``F.broadcast`` there OOMs the executors. Probe with
    ``limit(max_rows + 1).count()`` and only keep the broadcast hint
    under the cap; above it the caller falls back to a shuffled plan,
    which is slower but bounded. The limit early-exits scans (CollectLimit
    stops pulling partitions past max_rows+1 rows), though a query side
    whose lineage ends in a shuffle still executes that upstream work —
    callers persist ``q`` FIRST so the probe's work is reused by the real
    join rather than paid twice. This is an eager job at plan-construction
    time — the price of choosing the join strategy from the actual size."""
    return q.limit(max_rows + 1).count() <= max_rows


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_queries: int = 1_000_000,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for every row of ``queries``.

    Output: (query_id, neighbor_id, score, rank), self-matches excluded,
    ties broken by neighbor id (fully deterministic).

    The query side broadcasts only while it holds ≤ ``max_broadcast_queries``
    rows; a bigger query set switches to a partitioned cartesian product —
    exact all-pairs is inherently O(|q|·|c|), so the honest large-|q| plan
    shuffles both sides instead of OOMing on a forced broadcast.

    ``broadcast_queries`` short-circuits the size probe when the CALLER
    already knows the bound — ``True`` broadcasts outright, ``False``
    forces the shuffled plan, ``None`` (default) probes. The probe is an
    eager ``limit(n+1).count()`` job at plan-construction time plus a
    persist of the query side (so the probe's execution is reused by the
    real join); for a small query set those two cost MORE than the whole
    query (measured ~1.0 s of a 1.1 s warm total at sf0.1's 20×2,000
    workload), so callers with a known-bounded query set — e.g. "queries
    are a fixed 1% sample" — should pass ``broadcast_queries=True``.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_cvec")
    ).withColumn("_cnorm", _cached_expr("_cnorm", lambda: norm("_cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qvec")
    ).withColumn("_qnorm", _cached_expr("_qnorm", lambda: norm("_qvec")))
    if broadcast_queries is None:
        # pinned so the size probe's execution is reused by the join
        # instead of re-running the query side's lineage twice
        q = q.persist(StorageLevel.MEMORY_AND_DISK)
        broadcast_queries = _query_side_fits_broadcast(q, max_broadcast_queries)
    if broadcast_queries:
        q = F.broadcast(q)

    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            _cached_expr(
                "_qc_score",
                lambda: dot("_qvec", "_cvec")
                / (F.col("_qnorm") * F.col("_cnorm")),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def srp_bucket_rows(
    df: DataFrame,
    id_out: str,
    n_planes: int,
    n_tables: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(id, _t, _b) sign-random-projection bucket rows for every vector —
    one bucket id per hash table, one bit per hyperplane.

    ONE Arrow pass per partition: the batch's vectors stack into a matrix
    and a single GEMM against the (n_tables·n_planes × dim) hyperplane
    matrix produces every table's sign bits at once. The previous
    implementation unrolled n_tables·n_planes interpreted ``F.aggregate``
    folds per vector (32 full array traversals at the 8×4 default) — the
    r4 bench's one hot spot; the GEMM is the same pattern
    `neardup_pairs_blocked` already uses for candidate generation.

    Hyperplanes are ``RandomState(seed)`` Gaussians — the textbook SRP
    family (collision prob 1-θ/π per plane) — regenerated identically in
    every task from the fixed seed, so buckets are reproducible run-to-run
    and identical between the corpus and query sides.
    """
    import numpy as np
    import pandas as pd

    src = df.select(F.col(id_col).alias(id_out), as_double(vec_col).alias("_v"))
    id_type = dict(src.dtypes)[id_out]

    def bucketize(batches):
        planes = None
        weights = None
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = np.stack(pdf["_v"].to_numpy()).astype(np.float64, copy=False)
            if planes is None:
                rng = np.random.RandomState(seed)
                planes = rng.standard_normal((n_tables * n_planes, vecs.shape[1]))
                weights = (1 << np.arange(n_planes, dtype=np.int64))
            signs = (vecs @ planes.T) >= 0.0
            buckets = signs.reshape(len(vecs), n_tables, n_planes).astype(np.int64) @ weights
            yield pd.DataFrame(
                {
                    id_out: np.repeat(pdf[id_out].to_numpy(), n_tables),
                    "_t": np.tile(np.arange(n_tables, dtype=np.int32), len(vecs)),
                    "_b": buckets.reshape(-1),
                }
            )

    return src.mapInPandas(bucketize, schema=f"{id_out} {id_type}, _t int, _b long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_queries: int = 1_000_000,
) -> DataFrame:
    """Approximate top-k: compare only vectors sharing an SRP bucket in at
    least one of ``n_tables`` independent hash tables (OR-amplification).

    A single neighbor at angle θ collides in one table with prob
    (1-θ/π)^planes; with L tables the recall amplifies to 1-(1-r)^L while
    compare cost stays ~L·n/2^planes per query. Both knobs are the
    recall/cost dial; candidates are deduped before scoring so each pair
    is scored once. Same output schema as brute force.

    Query-side broadcasts are size-guarded (see `brute_force_topk`): above
    ``max_broadcast_queries`` rows both the bucket join and the score join
    run shuffled — batch-ANN where the query set IS the corpus stays
    bounded instead of OOMing on a forced broadcast.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("_cvec"),
    ).withColumn("_cnorm", norm("_cvec"))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qvec")
        )
        .withColumn("_qnorm", norm("_qvec"))
        # pinned: consumed by the size probe and the score join
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    c_tb = srp_bucket_rows(corpus, "neighbor_id", n_planes, n_tables, id_col, vec_col)
    q_tb = srp_bucket_rows(queries, "query_id", n_planes, n_tables, id_col, vec_col)

    q_fits = _query_side_fits_broadcast(q, max_broadcast_queries)
    candidates = (
        (F.broadcast(q_tb) if q_fits else q_tb)
        .join(c_tb, ["_t", "_b"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        candidates.join(F.broadcast(q) if q_fits else q, "query_id")
        .join(c, "neighbor_id")
        .withColumn("score", dot("_qvec", "_cvec") / (F.col("_qnorm") * F.col("_cnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index, DataFrame-native.

    Structure of the classic IVF-Flat, Spark-first:

    1. **Train**: centroids = a deterministic sample of the corpus (every
       ``n``-th vector by id rank — seeded k-means would also fit here; the
       sample keeps the whole operator closed-form and reproducible).
       Centroids are tiny → broadcast.
    2. **Assign**: every corpus vector joins the broadcast centroids and
       keeps its nearest (one narrow shuffle on the list id if the index
       is persisted; none here since assignment is a map).
    3. **Probe**: each query scores the centroids, takes its ``n_probe``
       nearest lists, and scans only those lists — compare cost drops
       ~n_lists/n_probe-fold vs brute force; recall < 1 is the ANN trade.

    Same output schema as `brute_force_topk` (query_id, neighbor_id,
    score, rank).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_cvec")
    ).withColumn("_cnorm", norm("_cvec"))

    # 1. deterministic "training": every n-th vector by md5(id) order —
    # an id-type-agnostic, uniformly-shuffled total order, so the stride
    # sample is effectively a seeded uniform sample (better list balance
    # than raw-id order when ids correlate with insert time, and string
    # ids work unchanged). Corpus count comes from a hash-agg (not a
    # count-window) and the rank from the distributed two-level row_number
    # (operators/order.py) bucketed by md5 prefix — no single-partition
    # WindowExec over the corpus, so training scales like assign/probe do.
    n_corpus = c.groupBy().count().collect()[0][0]
    stride = F.lit(max(n_corpus // n_lists, 1))
    c_keyed = c.withColumn("_ok", F.md5(F.col("neighbor_id").cast("string")))
    centroids = (
        global_row_number(
            c_keyed, F.col("_ok"), md5_prefix_bucket(F.col("_ok")), out="_rk1"
        )
        .withColumn("_rk", F.col("_rk1") - 1)
        .withColumn("_stride", stride)
        .filter((F.col("_rk") % F.col("_stride") == 0))
        .withColumn("_list", (F.col("_rk") / F.col("_stride")).cast("long"))
        .filter(F.col("_list") < n_lists)
        .select("_list", F.col("_cvec").alias("_centroid"), F.col("_cnorm").alias("_ctr_norm"))
    )

    # 2. assign each corpus vector to its nearest centroid
    sim_to_ctr = dot("_cvec", "_centroid") / (F.col("_cnorm") * F.col("_ctr_norm"))
    w_assign = Window.partitionBy("neighbor_id").orderBy(
        F.desc("_ctr_sim"), F.asc("_list")
    )
    assigned = (
        c.crossJoin(F.broadcast(centroids))
        .withColumn("_ctr_sim", sim_to_ctr)
        .withColumn("_rn", F.row_number().over(w_assign))
        .filter(F.col("_rn") == 1)
        .select("neighbor_id", "_cvec", "_cnorm", "_list")
    )

    # 3. queries probe their n_probe nearest lists
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qvec")
    ).withColumn("_qnorm", norm("_qvec"))
    q_sim = dot("_qvec", "_centroid") / (F.col("_qnorm") * F.col("_ctr_norm"))
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("_q_sim"), F.asc("_list"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_q_sim", q_sim)
        .withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "_qvec", "_qnorm", "_list")
    )

    scored = (
        F.broadcast(probes)
        .join(assigned, "_list")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", dot("_qvec", "_cvec") / (F.col("_qnorm") * F.col("_cnorm")))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def neardup_pairs_blocked(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_tiles: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs within equality blocks (id_a < id_b).

    Blocking on a cheap equality key (label, minhash band, SRP bucket)
    turns the all-pairs O(n²) into sum of per-block squares — the standard
    scale move; callers pick the blocking column.

    Two phases, so the O(b²) work is vectorized and the exact arithmetic
    only runs on survivors:

    1. **Candidate pass** (tiled GEMM): each block's vectors hash into
       ``n_tiles`` tiles; every tile pair (t1 <= t2) is one
       ``applyInPandas`` group that computes the normalized cross-Gram
       matrix with one numpy matmul and keeps pairs scoring >=
       ``threshold - 1e-6``. Parallelism = blocks × T(T+1)/2 (a single
       hot block can't serialize the stage), and the all-pairs arithmetic
       runs at BLAS speed instead of one interpreted fold per pair.
    2. **Exact refine**: candidates join their vectors back and the score
       is recomputed as the sequential fold (bit-identical to the DuckDB
       ``list_dot_product`` oracle); the exact threshold is applied there.
       GEMM-vs-fold float drift is ~1e-15 relative, so the 1e-6 margin
       cannot drop a true pair.
    """
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        as_double(vec_col).alias("vec"),
    )
    tiled = v.withColumn("tile", F.pmod(F.xxhash64(F.col("id")), F.lit(n_tiles)))
    # each row joins every (t1<=t2) tile-pair group it belongs to: one copy
    # per partner tile p, grouped by the unordered pair {tile, p}
    rows = (
        tiled.withColumn(
            "p", F.explode(F.sequence(F.lit(0), F.lit(n_tiles - 1)))
        )
        .withColumn("t1", F.least("tile", "p"))
        .withColumn("t2", F.greatest("tile", "p"))
    )

    margin = threshold - 1e-6

    def gen_candidates(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        t1, t2 = pdf["t1"].iat[0], pdf["t2"].iat[0]
        a = pdf[pdf["tile"] == t1]
        b = pdf[pdf["tile"] == t2] if t1 != t2 else a
        if a.empty or b.empty:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ma = np.stack(a["vec"].to_numpy())
        mb = ma if t1 == t2 else np.stack(b["vec"].to_numpy())
        na = np.linalg.norm(ma, axis=1)
        nb = na if t1 == t2 else np.linalg.norm(mb, axis=1)
        s = (ma @ mb.T) / (na[:, None] * nb[None, :])
        ia, ib = np.nonzero(s >= margin)
        ids_a = a["id"].to_numpy()[ia]
        ids_b = b["id"].to_numpy()[ib]
        lo, hi = np.minimum(ids_a, ids_b), np.maximum(ids_a, ids_b)
        out = pd.DataFrame({"id_a": lo[lo < hi], "id_b": hi[lo < hi]})
        # same-tile groups see each unordered pair twice ((i,j) and (j,i))
        return out.drop_duplicates()

    cand = rows.groupBy("blk", "t1", "t2").applyInPandas(
        gen_candidates, schema=f"id_a {id_type}, id_b {id_type}"
    )

    nv = v.withColumn("nrm", norm("vec"))
    va = nv.select(
        F.col("id").alias("id_a"), F.col("vec").alias("_va"), F.col("nrm").alias("_na")
    )
    vb = nv.select(
        F.col("id").alias("id_b"), F.col("vec").alias("_vb"), F.col("nrm").alias("_nb")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("score", dot("_va", "_vb") / (F.col("_na") * F.col("_nb")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )
