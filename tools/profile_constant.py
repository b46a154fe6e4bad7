"""Where does the ~0.6 s/query bench constant go? (round-7 perf audit)

Times, for a sample of cheap catalog queries at sf0.1:
  - plan-build seconds (Python/Py4J expression construction)
  - execution seconds (noop write)
under the session configs named on the CLI, plus a floor measurement
(trivial spark.range noop write) per config. Prints one JSON line per
config so configs can be compared across runs.

Usage: python tools/profile_constant.py [config_name ...]
Configs: base | sp8 | sp8_noaqe | advisory | noaqe
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from good_enough_timecamp_data_pipeline_spark.plans import catalog, testdata
from good_enough_timecamp_data_pipeline_spark.session import get_spark

SAMPLE = [
    "f_dates",
    "f_string_ids",
    "a_groupsum_pricing",
    "j_broadcast_lookup",
    "o_set_ops",
    "w_running_rank",
    "x_topk_per_group",
    "a_grouping_sets",
    "t_topk_tokens",
    "e_funnel_stages",
    "t_quality",
    "a_histogram",
    "j_semi",
    "f_json_props",
    "x_pivot",
    "a_percentiles",
    "p_filter_pushdown",
    "t_decontam",
    "report_task_budget",
    "report_project_budget",
]

_DEFAULTS: dict | None = None


def _session_defaults(spark, keys) -> dict:
    """Capture (once, at first call — before any config mutates them)
    the session's own values for every key the configs touch."""
    global _DEFAULTS
    if _DEFAULTS is None:
        snap = {}
        for k in keys:
            try:
                snap[k] = spark.conf.get(k)
            except Exception:
                snap[k] = None
        _DEFAULTS = snap
    return _DEFAULTS


CONFIGS = {
    "base": {},
    "sp8": {"spark.sql.shuffle.partitions": "8"},
    "sp8_noaqe": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.enabled": "false",
    },
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "advisory": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32m",
    },
}


def run_config(name: str, conf: dict[str, str], sf_dir: str) -> dict:
    # getOrCreate shares ONE session across configs in an invocation, so
    # reset every key ANY config touches to its session default before
    # applying this config — otherwise 'base' measured after 'sp8_noaqe'
    # still runs with 8 partitions / AQE off and the comparison is
    # contaminated (round-7 ADVICE item 3).
    spark = get_spark(f"profile_{name}")
    all_keys = {k for c in CONFIGS.values() for k in c}
    defaults = _session_defaults(spark, all_keys)
    for k, v in defaults.items():
        try:
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        except Exception:
            pass
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception as e:
            print(f"conf {k} not runtime-settable: {e}", file=sys.stderr)
    # cold caches per config run would skew plan-build timing comparisons;
    # testdata caches are keyed by session id which persists, so warm them
    testdata.register_views(spark, sf_dir)
    # floor: job-launch overhead for a trivial plan
    t0 = time.time()
    spark.range(1000).write.format("noop").mode("overwrite").save()
    floor = time.time() - t0
    qs = catalog.queries()
    build_s, exec_s, per = {}, {}, {}
    # two passes; report the second (pass 1 warms JVM/codegen/footers so
    # config comparisons aren't dominated by startup)
    for _pass in (1, 2):
        build_s, exec_s, per = {}, {}, {}
        for qname in SAMPLE:
            fn = qs[qname]
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            build_s[qname] = round(t1 - t0, 3)
            exec_s[qname] = round(t2 - t1, 3)
            per[qname] = round(t2 - t0, 3)
            spark.catalog.clearCache()
    total = sum(per.values())
    out = {
        "config": name,
        "conf": conf,
        "floor_noop_sec": round(floor, 3),
        "total_sec": round(total, 3),
        "avg_sec": round(total / len(SAMPLE), 3),
        "build_total": round(sum(build_s.values()), 3),
        "exec_total": round(sum(exec_s.values()), 3),
        "per_query": per,
        "build": build_s,
    }
    print(json.dumps(out))
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ["base"]
    for n in names:
        run_config(n, CONFIGS[n], sf_dir)


if __name__ == "__main__":
    main()
