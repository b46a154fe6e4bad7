"""Benchmark harness — driver contract.

Runs every catalog query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is materialized through the ``noop`` sink so the full plan
(including formatting columns) executes without collect() driver transfer.
A first warm-up run of the flagship amortizes JVM/codegen startup out of
the per-query numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from good_enough_timecamp_data_pipeline_spark.plans import catalog
from good_enough_timecamp_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark("bench")
    # warm-up: JVM + codegen + parquet footer reads
    catalog.flagship(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, fn in catalog.queries().items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        # operators pin reused intermediates (shingles, LSH buckets);
        # drop them so later queries aren't timed under cache pressure
        spark.catalog.clearCache()

    # The 93-entry per-query map overflowed the driver's tail buffer in r2
    # (BENCH_r02.json parsed:null), so print the detail map on its OWN line
    # first and keep the final line — the one the driver parses — compact.
    print(json.dumps({"metric": "per_query_runtime", "unit": "sec", "queries": timings}))
    sys.stdout.flush()
    # Final (parsed) line stays small: headline queries only — the two
    # flagship reports plus the five slowest of this run.
    headline = {
        k: timings[k]
        for k in ("report_task_budget", "report_project_budget")
        if k in timings
    }
    for k in sorted(timings, key=timings.get, reverse=True)[:5]:
        headline.setdefault(k, timings[k])
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": headline,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
