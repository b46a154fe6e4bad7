"""A/B the pagerank loop-scalar modes (r15 VERDICT item 7).

Two quantities, because the literal-vs-broadcast question is really a
compile-cache question:

- ``steady``: one session, sf0.001 shape warm-up + shared prewarm, then
  N interleaved timings of the g_pagerank entry per mode (noop sink,
  QUERY_CONF applied) — the bench steady-state number.
- ``first``: a FRESH process per run (JVM + codegen caches cold), warm-up
  included, ONE timing — what the first execution of the entry costs in
  a bench session, i.e. whether the literal-free loop lets the sf0.001
  warm-up pre-compile the sf0.1 loop classes.

Usage::
  python tools/pagerank_ab.py steady [sf_dir] [repeats]
  python tools/pagerank_ab.py first <literal|broadcast> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.operators.graph import pagerank
from good_enough_timecamp_data_pipeline_spark.plans import catalog, round5
from good_enough_timecamp_data_pipeline_spark.session import apply_tuned_conf, get_spark


def entry(spark, sf_dir: str, mode: str):
    edges = round5.part_supplier_edges(spark, sf_dir)
    return (
        pagerank(edges, num_iter=8, loop_scalar=mode)
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(50)
    )


def timed(spark, sf_dir: str, mode: str) -> float:
    restore = catalog.apply_query_conf(spark, "g_pagerank")
    spark.sparkContext.setJobGroup(f"pagerank_ab:{mode}", mode)
    t0 = time.time()
    try:
        entry(spark, sf_dir, mode).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)
    finally:
        spark.sparkContext.setJobGroup("", "")
        restore()
        spark.catalog.clearCache()


def setup(sf_dir: str):
    spark = get_spark("pagerank_ab")
    apply_tuned_conf(spark, sf_dir)
    try:
        catalog.warmup(spark, sf_dir)
    except Exception as e:
        print(f"warm-up failed: {e}", file=sys.stderr)
    try:
        catalog.prewarm_shared(spark, sf_dir)
    except Exception as e:
        print(f"shared prewarm failed: {e}", file=sys.stderr)
    return spark


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "steady"
    if what == "first":
        arg = sys.argv[2]  # literal | broadcast | literal+warm | broadcast+warm
        mode, _, warm = arg.partition("+")
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        spark = setup(sf_dir)
        if warm == "warm":
            # simulate SHAPE_WARMUP membership: run the entry once at the
            # warm-up SF so loop-body classes compile before the timing
            warm_dir = os.environ.get(
                "SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001"
            )
            entry(spark, warm_dir, mode).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
        t = timed(spark, sf_dir, mode)
        print(json.dumps({"first_run": {arg: t}, "load_1m": os.getloadavg()[0]}))
        return
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = setup(sf_dir)
    out = {"literal": [], "broadcast": []}
    for _ in range(repeats):
        for mode in ("literal", "broadcast"):
            out[mode].append(timed(spark, sf_dir, mode))
    print(
        json.dumps(
            {
                "steady": out,
                "min": {m: min(v) for m, v in out.items()},
                "load_1m": os.getloadavg()[0],
            }
        )
    )


if __name__ == "__main__":
    main()
