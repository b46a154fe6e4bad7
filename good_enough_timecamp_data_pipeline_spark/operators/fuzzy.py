"""Fuzzy (edit-distance) join with blocking — entity-resolution primitive.

Not in the reference (its joins are exact equi-joins, SURVEY §2.3) but a
first-class data-cleaning operator for the north-star surface: matching
dirty strings (typo'd application names, OCR'd titles) against a clean
dimension.

Scale shape: a naive fuzzy join is a cartesian product × an O(len²)
distance — never viable. Blocking first (cheap equality keys both engines
compute identically: first char + length band) turns it into an equi-join
whose candidate set is a tiny superset of the true matches; the exact
Levenshtein filter then runs only on candidates. Recall bound is explicit:
an edit at position 1 or a length change > the band escapes the block —
the standard blocking trade, widened by adding more blocking keys
(prefixes of soundex/metaphone, q-gram keys) exactly like LSH bands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_key(col: Column | str) -> Column:
    """Default blocking key: (first char, length) — used with a band join
    on length so single-char edits stay in reach."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, 1)


def fuzzy_join(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_col: str,
    clean_col: str,
    max_dist: int = 2,
    how: str = "inner",
) -> DataFrame:
    """All (dirty, clean, distance) pairs with Levenshtein ≤ ``max_dist``,
    blocked on first character + length band.

    ``clean`` is expected to be dimension-sized (it broadcasts); output
    columns: every ``dirty`` column + ``{clean_col}`` + ``edit_dist``.
    """
    d = dirty.withColumn("_bk", block_key(dirty_col)).withColumn(
        "_len", F.length(dirty_col)
    )
    c = (
        clean.select(F.col(clean_col)).distinct()
        .withColumn("_bk_c", block_key(clean_col))
        .withColumn("_len_c", F.length(clean_col))
    )
    cand = d.join(
        F.broadcast(c),
        (F.col("_bk") == F.col("_bk_c"))
        & (F.abs(F.col("_len") - F.col("_len_c")) <= max_dist),
        how,
    )
    out = cand.withColumn(
        "edit_dist", F.levenshtein(F.col(dirty_col), F.col(clean_col))
    ).filter(F.col("edit_dist") <= max_dist)
    return out.drop("_bk", "_len", "_bk_c", "_len_c")
