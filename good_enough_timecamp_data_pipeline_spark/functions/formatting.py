"""Presentation-layer scalar functions (SURVEY.md §2.8 F1-F5, F14).

These mirror the reference's two DuckDB macros and per-row Python helpers:

- ``format_duration`` — "Xh YYm" (``/root/reference/SAMPLE-REPORTS.md:26-30``)
- ``format_hours`` — '%.4f' decimal hours
  (``/root/reference/SAMPLE-PROJECT-BUDGET-REPORT.md:27-28``)
- signed variant — ``/root/reference/SAMPLE-REPORTS.md:104-108``
- ``string_fallback`` — first non-blank of a chain
  (``/root/reference/dlt_fetch_timecamp.py:136-148``)
- ``path_join`` — ``" / ".join(path)``
  (``/root/reference/dlt_fetch_timecamp.py:396-397,559-561``)

Exactly like DuckDB macros, each helper is compile-time expansion: a plain
Python function returning a Column expression, fully Catalyst-optimizable
and whole-stage-codegen'd — never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def format_duration(seconds: Column | str) -> Column:
    """Integer seconds → "Xh YYm" (minutes zero-padded to 2).

    ``pmod`` (not ``%``) so negative inputs never produce negative minute
    fields; callers wanting the signed form use `format_duration_signed`.
    """
    s = _c(seconds)
    hours = F.floor(s / 3600).cast("long")
    minutes = F.floor(F.pmod(s, 3600) / 60).cast("long")
    return F.concat(
        hours.cast("string"),
        F.lit("h "),
        F.lpad(minutes.cast("string"), 2, "0"),
        F.lit("m"),
    )


def format_duration_signed(seconds: Column | str) -> Column:
    """CASE WHEN s<0 THEN '-' || format_duration(ABS(s)) ELSE format_duration(s)."""
    s = _c(seconds)
    return F.when(s < 0, F.concat(F.lit("-"), format_duration(F.abs(s)))).otherwise(
        format_duration(s)
    )


def format_hours(seconds: Column | str) -> Column:
    """Seconds → '%.4f' decimal-hours string."""
    return F.format_string("%.4f", _c(seconds) / 3600.0)


def string_fallback(*cols: Column | str) -> Column:
    """First argument that is non-null and non-blank after trim; '' if none."""
    stripped = [F.nullif(F.trim(_c(c)), F.lit("")) for c in cols]
    return F.coalesce(*stripped, F.lit(""))


def path_join(arr: Column | str, sep: str = " / ") -> Column:
    return F.concat_ws(sep, _c(arr))
