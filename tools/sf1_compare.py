"""One measured scale point ABOVE sf0.1: synthesize sf1 (10× facts,
fixed dims — the 100 TB shape) and run the full Spark-vs-DuckDB twin
comparison on it, writing ``BASELINE_COMPARE_SF1.json``.

The whole ≤2×-bar argument says Spark's per-query scheduling/plan
constant amortizes as data grows; this run turns that from prediction
into measurement — compare ``total_ratio`` here against the sf0.1 one
in ``BASELINE_COMPARE.json`` (round-7 VERDICT, next-round item 3).

Usage::  python tools/sf1_compare.py [base_sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from good_enough_timecamp_data_pipeline_spark.session import get_spark
    from tools.scale_probe import scaled_dir

    spark = get_spark("sf1_synth")
    sf1 = scaled_dir(spark, 10, base=base)
    print(f"sf1 synthesized at {sf1}", flush=True)
    spark.stop()  # the comparison run builds its own tuned session

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["SPARK_GRAFT_BASELINE_OUT"] = os.path.join(repo, "BASELINE_COMPARE_SF1.json")
    return subprocess.call(
        [sys.executable, os.path.join(repo, "tools", "duckdb_baseline.py"), sf1],
        env=env,
    )


if __name__ == "__main__":
    raise SystemExit(main())
