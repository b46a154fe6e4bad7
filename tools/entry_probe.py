"""Per-entry min-of-N probe under the exact bench protocol.

Reproduces bench.py's measurement conditions for a SUBSET of catalog
entries — same session, tuned conf, shape warm-up, shared-artifact
prewarm, per-entry QUERY_CONF, noop sink, clearCache between timings —
so a probed number is comparable to the committed bench_detail.json.
Used for quiet-window adjudications (mover vs ambient) and for A/Bs
that need several same-session repeats without paying a full 183-entry
bench per data point.

Usage::  python tools/entry_probe.py [sf_dir] name[,name,...] [repeats]

Prints one JSON line: {name: {"times": [...], "min": .., "median": ..}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from good_enough_timecamp_data_pipeline_spark.plans import catalog
from good_enough_timecamp_data_pipeline_spark.session import apply_tuned_conf, get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else []
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    queries = catalog.queries()
    unknown = [n for n in names if n not in queries]
    if unknown or not names:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark("entry_probe")
    apply_tuned_conf(spark, sf_dir)
    try:
        catalog.warmup(spark, sf_dir)
    except Exception as e:
        print(f"warm-up failed: {e}", file=sys.stderr)
    try:
        from good_enough_timecamp_data_pipeline_spark.plans import northstar

        northstar.prewarm_lsh_index(spark, sf_dir)
    except Exception as e:
        print(f"lsh prewarm failed: {e}", file=sys.stderr)
    try:
        catalog.prewarm_shared(spark, sf_dir)
    except Exception as e:
        print(f"shared prewarm failed: {e}", file=sys.stderr)

    out: dict[str, dict] = {}
    loads: list[float] = []
    for rep in range(repeats):
        loads.append(os.getloadavg()[0])
        for name in names:
            restore = catalog.apply_query_conf(spark, name)
            spark.sparkContext.setJobGroup(f"probe:{name}:{rep}", name)
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                out.setdefault(name, {"times": []})["times"].append(
                    round(time.time() - t0, 3)
                )
            except Exception as e:
                out.setdefault(name, {"times": []}).setdefault("errors", []).append(
                    repr(e)[:300]
                )
            finally:
                spark.sparkContext.setJobGroup("", "")
                restore()
                spark.catalog.clearCache()
    for name, rec in out.items():
        if rec["times"]:
            rec["min"] = min(rec["times"])
            rec["median"] = round(statistics.median(rec["times"]), 3)
    print(json.dumps({"sf_dir": sf_dir, "load_1m": loads, "entries": out}))


if __name__ == "__main__":
    main()
