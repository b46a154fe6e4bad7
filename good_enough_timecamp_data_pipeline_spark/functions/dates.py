"""Date helpers (SURVEY.md §2.8 F8-F11).

Reference parity:
- multi-format parse + 'yesterday' keyword (``/root/reference/common/utils.py:28-51``)
- inclusive date-range expansion (``/root/reference/dlt_fetch_timecamp.py:151-162``)
- day-clamped month add → built-in ``F.add_months`` has identical semantics
  (``/root/reference/dlt_fetch_timecamp.py:165-171``)
- 6-month batch key (``/root/reference/dlt_fetch_timecamp.py:174-191``)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: the formats the reference tries, in order (common/utils.py:43)
DATE_FORMATS = ("yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy", "dd-MM-yyyy", "MM-dd-yyyy")


def parse_date_multi(col: Column | str) -> Column:
    """Try each known format in order; 'yesterday' keyword supported.

    ``try_to_date`` returns NULL instead of raising on mismatch, so the
    chain composes with coalesce. Note the reference's ordering makes
    ambiguous dates (01/02/2024) parse day-first — preserved here.
    """
    c = _c(col)
    attempts = [F.try_to_date(c, f) for f in DATE_FORMATS]
    return F.when(
        F.lower(F.trim(c)) == "yesterday", F.date_sub(F.current_date(), 1)
    ).otherwise(F.coalesce(*attempts))


def date_range(start: Column | str, end: Column | str) -> Column:
    """Inclusive array of days in [start, end]; explode() for one row per day."""
    return F.sequence(_c(start), _c(end), F.expr("interval 1 day"))


def month_batch_key(d: Column | str, origin: Column | str, months: int = 6) -> Column:
    """Which ``months``-wide batch (0-based) a date falls into, counted from
    ``origin`` — the relational form of the reference's 6-month fetch windows."""
    return F.floor(F.months_between(_c(d), _c(origin)) / months).cast("long")
