"""Multi-dimensional data layout: Z-order clustering for file skipping.

At 100 TB the scan is the query: parquet readers prune whole files and row
groups from footer min/max statistics, but those statistics only help along
the physical sort order. A table laid out by time prunes time filters and
NOTHING else — every file spans the full user range, so a user-scoped query
reads all of it. Z-ordering (bit-interleaving the dimensions into one sort
key — the Morton curve) bounds EVERY interleaved dimension's min/max within
each file, so filters on any of them skip files. This is what table formats
expose as ``OPTIMIZE ... ZORDER BY``; vanilla Spark has the pieces
(repartitionByRange + sortWithinPartitions), this module assembles them.

Cost model: one range shuffle on the z-key at write time buys file skipping
on d dimensions forever after. The curve trades per-dimension pruning
precision (~1/d of the key's bits each) for covering all of them — for a
single-dimension workload, plain sort on that column beats it; see the
layout test, which measures both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out_scan(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-repartition a file-scan-rooted NARROW pipeline across the
    machine when the source has too few files to parallelize the fused
    compute.

    Spark fuses narrow expressions (tokenize, per-token hashing, HOF
    folds) into the scan stage, so a one-file input runs them on ONE
    core no matter the cluster size — the local testdata ships each
    table as a single parquet file, and the CPU-heavy text pipelines
    were measured 2-3× slower than the same plan fanned out. Hash
    partitioning on a key skips the full-row sort a round-robin
    repartition pays (spark.sql.execution.sortBeforeRepartition), and
    the file-count guard makes this a no-op on real many-file inputs
    where the scan fans out by itself. Counting FILES, not RDD
    partitions: the `.rdd` probe forces plan analysis + RDD translation
    (~1.3 s of driver time per fresh plan).

    Use ONLY on pipelines consumed once (or pinned by the caller): the
    exchange re-runs per derived lineage, which is why a blanket
    post-scan repartition measured a net LOSS on iterative operators
    (see the round-5 note in plans/testdata.py)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_src = len(df.inputFiles()) or 1
    except Exception:
        n_src = 1
    if n_src * 2 <= target:
        return df.repartition(target, F.col(key_col))
    return df


def min_max_scale(df: DataFrame, col: Column, bits: int = 16) -> Column:
    """Scale a numeric column to an integer rank in [0, 2^bits) using the
    observed min/max (one exact hash-agg, collected as two scalars —
    bounded driver traffic). Uniform-ish data gives uniform-ish ranks;
    skew only costs pruning precision, never correctness."""
    row = df.select(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        return F.lit(0).cast("long")
    span = max(float(hi) - float(lo), 1e-12)
    top = (1 << bits) - 1
    return F.least(
        F.lit(top).cast("long"),
        ((col.cast("double") - F.lit(float(lo))) / F.lit(span) * top).cast("long"),
    )


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of two pre-scaled integer ranks (x gets the even
    bit positions, y the odd). Pure JVM expression tree — 2·bits shift/and
    terms, fully inside whole-stage codegen; no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(
                F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered along the
    Morton curve of (col_x, col_y): range-partition on the z-key (files =
    contiguous curve segments) and sort within each file (row groups
    cluster too). The z-key is dropped before writing — it is layout, not
    data; re-derive it to re-cluster after heavy appends."""
    zx = min_max_scale(df, F.col(col_x), bits)
    zy = min_max_scale(df, F.col(col_y), bits)
    keyed = df.withColumn("__z", zorder_key(zx, zy, bits))
    (
        keyed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_overlapping(path: str, column: str, lo, hi) -> tuple[int, int]:
    """(n_overlapping, n_total) parquet files whose footer min/max for
    ``column`` intersects [lo, hi] — exactly the skipping decision a reader
    makes, measured from the same statistics."""
    import glob
    import os

    import pyarrow.parquet as pq

    total = 0
    hit = 0
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        total += 1
        md = pq.read_metadata(f)
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == column
            )
            st = col.statistics
            if st is None or not st.has_min_max:
                fmin = lo  # no stats: reader cannot skip
                fmax = hi
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            hit += 1
    return hit, total


def write_range_sorted(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16
) -> None:
    """Single-order layout: range-partition on ``cols`` then sort within
    each file — maximal footer min/max pruning along ONE sort order (each
    file owns a disjoint key range). The right layout when the workload
    filters on one dimension; Z-order (above) when it filters on several.
    RangePartitioner samples the key distribution, so near-equal file
    sizes hold even under key skew."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )
