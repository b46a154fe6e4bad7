"""Column-level masking policies (data governance for shared outputs).

The reference hands raw exports to downstream warehouses
(`/root/reference/docs/fetch-data-to-database.md`); a multi-tenant 100 TB
lake additionally needs POLICY-DRIVEN masking at the egress boundary —
the same table served with different column treatments per audience,
without bespoke per-consumer queries.

A policy is a plain dict ``{column: treatment}``; treatments compose into
ONE codegen'd projection (no UDFs, no extra pass):

- ``"hash"``    → sha2-256 hex of the value (stable join key, irreversible)
- ``"redact"``  → constant ``"***"`` (type becomes string)
- ``"last4"``   → only the last 4 characters survive, rest ``*``
- ``"null"``    → typed NULL (column kept, content dropped)
- ``"keep"``    → untouched (explicit allow — lets a policy be a full
  column inventory, with unlisted columns REJECTED in strict mode)

`t_scrub_pii` (plans/analytics.py) is the content-level cousin (regex
scrubbing INSIDE free text); this module governs whole columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TREATMENTS = ("hash", "redact", "last4", "null", "keep")


def _apply(col: Column, treatment: str, dtype: str) -> Column:
    if treatment == "keep":
        return col
    if treatment == "hash":
        return F.sha2(col.cast("string"), 256)
    if treatment == "redact":
        return F.lit("***")
    if treatment == "last4":
        s = col.cast("string")
        return F.concat(
            F.repeat(F.lit("*"), F.greatest(F.length(s) - 4, F.lit(0))),
            F.substring(s, -4, 4),
        )
    if treatment == "null":
        return F.lit(None).cast(dtype)
    raise ValueError(f"unknown treatment {treatment!r}; pick one of {TREATMENTS}")


def apply_masking_policy(
    df: DataFrame, policy: dict[str, str], strict: bool = True
) -> DataFrame:
    """Apply a ``{column: treatment}`` policy as one projection.

    ``strict=True`` (default) demands the policy cover EVERY column —
    the fail-closed posture for egress: a column added upstream without
    a policy decision must break the export, not silently leak. With
    ``strict=False`` unlisted columns pass through (exploratory use).
    """
    unknown = set(policy) - set(df.columns)
    if unknown:
        raise ValueError(f"policy names absent columns: {sorted(unknown)}")
    if strict:
        uncovered = set(df.columns) - set(policy)
        if uncovered:
            raise ValueError(
                "strict policy must cover every column; missing "
                f"{sorted(uncovered)} (add 'keep' entries to allow)"
            )
    dtypes = dict(df.dtypes)
    return df.select(
        *[
            _apply(F.col(c), policy.get(c, "keep"), dtypes[c]).alias(c)
            for c in df.columns
        ]
    )
