"""Cross-entry shared materialized intermediates.

Several catalog entries are *views over the same expensive derived
table*: the bigram count table feeds the perplexity, CCNet-bucket and
bigram-LM entries; the DSIR (doc, source, bucket) count table feeds both
DSIR entries; the near-dup shingle table and its exact pair set feed the
whole lexical dedup family; the connected-components labels feed cluster
assembly AND survivor selection. A production catalog materializes each
of these ONCE and lets every consumer read the result (a shared
materialized view); re-deriving them per query multiplies the single
most expensive pass of the pipeline by its consumer count.

``shared_checkpoint`` is that materialization point: an eagerly
``localCheckpoint``-ed DataFrame memoized per (session, sf_dir, tag).
Checkpoint blocks — unlike ``persist`` — survive
``spark.catalog.clearCache()`` (which the bench/driver harnesses call
between entries), and the ContextCleaner frees them when the memo entry
(and with it the DataFrame) is dropped or the session dies. The first
consumer in a session pays the build; correctness never depends on the
cache (every builder is deterministic, and the DuckDB oracle re-derives
the same table from scratch inside each twin's SQL).

On a real cluster the same tags land as parquet/Delta tables in object
storage (the ``build_lsh_index_cached`` pattern, operators/dedup.py) —
session-local checkpoints are the single-process analog.
"""

from __future__ import annotations

import threading
import time
import weakref
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.Lock()
_CACHE: dict = {}
# (sf_dir, tag) -> seconds of the LAST build (bench/baseline harnesses
# report these per tag so no first consumer's per-query number silently
# carries a corpus-wide artifact build — round-8 VERDICT item 3)
_BUILD_SEC: dict[tuple[str, str], float] = {}


def shared_checkpoint(
    spark: SparkSession, sf_dir: str, tag: str, builder: Callable[[], DataFrame]
) -> DataFrame:
    """Memoized eager localCheckpoint of ``builder()`` keyed by
    (session, sf_dir, tag). Same weakref discipline as
    ``testdata.session_memo``: a hit whose session object is gone or was
    replaced (id() recycling after GC) is discarded, never returned."""
    key = (id(spark), sf_dir, tag)
    with _LOCK:
        hit = _CACHE.get(key)
        if hit is not None:
            ref, df = hit
            if ref() is spark:
                return df
            del _CACHE[key]
    # build outside the lock: a concurrent duplicate build is benign
    # (both results are identical; last writer wins), holding the lock
    # through a Spark job is not.
    t0 = time.time()
    df = builder().localCheckpoint(eager=True)
    sec = round(time.time() - t0, 3)
    with _LOCK:
        _CACHE[key] = (weakref.ref(spark), df)
        _BUILD_SEC[(sf_dir, tag)] = sec
    return df


def build_times(sf_dir: str | None = None) -> dict[str, float]:
    """Per-tag build seconds recorded by ``shared_checkpoint`` (for the
    given ``sf_dir``, or all). Harnesses publish this next to per-query
    timings so a shared artifact's one-time cost is visible instead of
    silently attributed to whichever entry built it first."""
    with _LOCK:
        return {
            tag: sec
            for (d, tag), sec in _BUILD_SEC.items()
            if sf_dir is None or d == sf_dir
        }


def invalidate(spark: SparkSession | None = None) -> None:
    """Drop memo entries (all, or one session's) — test hook."""
    with _LOCK:
        if spark is None:
            _CACHE.clear()
        else:
            for key in [k for k in _CACHE if k[0] == id(spark)]:
                del _CACHE[key]
