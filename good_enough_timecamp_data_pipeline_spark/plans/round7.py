"""Round-7 catalog additions.

Each entry lands in ``ROUND7_QUERIES`` as ``name -> (fn, oracle_sql)`` and
is registered inside the driver's first-50 correctness window (see
catalog.py) so new queries get a hard driver confirmation in their first
round. Rows-only additions register separately at the catalog tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .testdata import load_table

ROUND7_QUERIES: dict = {}


def _register(name: str, fn, sql: str) -> None:
    ROUND7_QUERIES[name] = (fn, sql)
