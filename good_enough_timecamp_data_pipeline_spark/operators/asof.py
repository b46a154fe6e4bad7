"""As-of (nearest-previous) join — an operator Spark lacks natively.

Not in the reference (SURVEY §2.3 notes its absence) but first-class in the
north-star surface: joining a fact stream to the most recent earlier row of
a reference stream (prices, sensor states, session context) is the core
temporal-enrichment primitive of a training-data pipeline, and DuckDB ships
it natively (``ASOF JOIN``) which gives us an exact oracle.

Spark-first realization — the union/carry-forward pattern:

1. tag both inputs and union them (left probe rows + right reference rows);
2. one window per key ordered by (ts, tag) carries the latest reference
   values forward (``last(..., ignorenulls=True)`` over an unbounded-
   preceding frame) — tag order makes an equal-timestamp reference row
   visible to the probe row (inclusive match, same as ASOF's ``>=``);
3. keep probe rows.

Cost at scale: ONE shuffle of both inputs on the key (hash partition), a
per-partition sort — identical shape to a sort-merge join, with no
range-condition explosion risk: each probe row emits exactly once. The
right side is pre-aggregated to one row per (key, ts) so ties are
deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "key",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for every left row, the nearest right row within
    the same ``by`` group — ``direction="backward"`` (default) matches
    the latest right row with ``right[on] <= left[on]``;
    ``direction="forward"`` the earliest right row with
    ``right[on] >= left[on]`` (the same carry window run over the
    reversed order — identical single-shuffle cost). For
    nearest-either-side semantics see :func:`asof_join_nearest`.

    Right must be unique per (by, on) — pre-aggregate if not. Output =
    left columns + ``{on}{suffix}`` (matched right timestamp, NULL when no
    match in the chosen direction) + each value col as ``{col}{suffix}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by_cols) | {on}
    ]
    unioned = _union_tagged(left, right, on, by_cols, value_cols)
    # equal-timestamp reference rows must be visible to the probe row in
    # EITHER direction (inclusive match) — _probe asc puts the reference
    # first at ties under both orderings
    on_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(on_order, F.col("_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_probe"),
        F.last("_r_on", ignorenulls=True).over(w).alias(f"{on}{suffix}"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_probe") == 1).drop("_probe")


def _union_tagged(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Tag-and-union the probe and reference sides for the carry-forward
    window: left rows with ``_probe=1`` and NULL reference slots, right
    rows reshaped onto the left schema with their (on, value) payload in
    ``_r_*`` slots."""
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_probe"),
        F.lit(None).cast(right.schema[on].dataType).alias("_r_on"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    rhs = right.select(
        *[F.col(c) for c in by_cols],
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in set(by_cols) | {on}],
        F.lit(0).alias("_probe"),
        F.col(on).alias("_r_on"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).select(*lhs.columns)  # align column order
    return lhs.unionByName(rhs)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "key",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Nearest-either-side as-of join: the right row minimizing
    ``|right[on] − left[on]|`` within the group; exact ties in distance
    resolve BACKWARD (the earlier row — reproducible, and the convention
    that never reads the future when distances are equal).

    Both directions are computed as two carry-forward windows over ONE
    tagged union (one keyed shuffle, two per-partition sorts) and picked
    per row — no recombine join, so left rows with NULLs or duplicate
    left rows pass through exactly once (earlier versions re-joined the
    two passes on all left columns, which dropped NULL-bearing rows under
    null-unsafe equality and cross-multiplied duplicates). Timestamp
    distances compare in integer microseconds, so the tie rule is exact."""
    by_cols = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by_cols) | {on}
    ]
    unioned = _union_tagged(left, right, on, by_cols, value_cols)
    w_bwd = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).desc(), F.col("_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_probe"),
        F.last("_r_on", ignorenulls=True).over(w_bwd).alias(f"{on}_bwd"),
        F.last("_r_on", ignorenulls=True).over(w_fwd).alias(f"{on}_fwd"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w_bwd).alias(f"{c}_bwd")
            for c in value_cols
        ],
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w_fwd).alias(f"{c}_fwd")
            for c in value_cols
        ],
    ).filter(F.col("_probe") == 1)
    d_b = F.abs(F.unix_micros(F.col(f"{on}_bwd")) - F.unix_micros(F.col(on)))
    d_f = F.abs(F.unix_micros(F.col(f"{on}_fwd")) - F.unix_micros(F.col(on)))
    use_bwd = F.col(f"{on}_bwd").isNotNull() & (
        F.col(f"{on}_fwd").isNull() | (d_b <= d_f)
    )
    return carried.select(
        *[F.col(c) for c in left.columns],
        F.when(use_bwd, F.col(f"{on}_bwd")).otherwise(F.col(f"{on}_fwd")).alias(
            f"{on}{suffix}"
        ),
        *[
            F.when(use_bwd, F.col(f"{c}_bwd")).otherwise(F.col(f"{c}_fwd")).alias(
                f"{c}{suffix}"
            )
            for c in value_cols
        ],
    )
