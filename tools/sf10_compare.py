"""Second measured scale point: sf10 (100× the sf0.1 facts, fixed
dims) over the HEAVY TAIL — the ~16 worst Spark/DuckDB per-query ratios
from ``BASELINE_COMPARE_SF1.json``, i.e. the twins where Spark's fixed
per-query constant (driver planning + task scheduling, sub-2 s absolute)
still dominated at sf1 while DuckDB sat in the milliseconds.

The builder's growth model (ARCHITECTURE.md sf1 section: Spark ~1.96×
per data decade vs DuckDB ~3.5×) predicts the MEDIAN tail ratio crosses
near sf10; this run measures it (round-8 VERDICT item 4). Not the full
catalog — the non-tail twins already crossed at sf1 (total ratio 0.12×).

Usage::  python tools/sf10_compare.py [base_sf_dir]

Writes ``BASELINE_COMPARE_SF10.json`` via tools/duckdb_baseline.py.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Worst sf1 per-query ratios (BASELINE_COMPARE_SF1.json, descending) that
# are oracle twins; s_cosine_* operate on the embeddings DIM (fixed by
# design in the 100 TB shape — facts grow, dims don't), so they measure
# pure constant-domination and are labeled as such in the artifact note.
TAIL = [
    "h_closure_pairs",
    "a_ks_test",
    "s_cosine_neardup",
    "a_gini",
    "j_assembly_left_defaults",
    "j_fuzzy_match",
    "s_cosine_topk",
    "t_shard_assign",
    "w_pareto_share",
    "x_lateral_topn",
    "e_ewma_anomaly",
    "x_grouped_list",
    "f_variant_shred",
    "e_dau_wau",
    "a_mad_outliers",
    "h_breadcrumb_levels",
]


# Fact-bound representatives (round-9 VERDICT item 7): the queries whose
# cost is carried by the SCALED tables (documents/events — the tables a
# 100 TB bill is made of), measured at sf10 to pin the growth model's
# second decade. The TAIL above is the complementary dim-/constant-bound
# set from the r9 probe.
FACT_BOUND = [
    "t_corpus_prep",
    "d_ngram_jaccard",
    "t_cooccurrence_lift",
    "t_line_dedup",
    "e_interval_coverage",
    "e_peak_concurrency",
    "t_dsir_weights",
    "t_token_kl_drift",
    "t_quality_gate",
    "a_mad_outliers",
]


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    fact_bound = "--fact-bound" in argv
    if fact_bound:
        argv.remove("--fact-bound")
    sf10 = None
    if "--reuse-dir" in argv:  # skip synthesis (e.g. the fact-bound pass
        i = argv.index("--reuse-dir")  # right after the tail pass)
        sf10 = argv[i + 1]
        del argv[i : i + 2]
    base = argv[0] if argv else "/root/testdata/sf0.1"
    if sf10 is None:
        from good_enough_timecamp_data_pipeline_spark.session import get_spark
        from tools.scale_probe import scaled_dir

        spark = get_spark("sf10_synth")
        sf10 = scaled_dir(spark, 100, base=base)
        print(f"sf10 synthesized at {sf10}", flush=True)
        spark.stop()  # the comparison run builds its own tuned session

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifact = os.path.join(repo, "BASELINE_COMPARE_SF10.json")
    env = dict(os.environ)
    out = artifact
    if fact_bound:
        out = os.path.join(repo, "BASELINE_COMPARE_SF10_FACTBOUND.tmp.json")
    env["SPARK_GRAFT_BASELINE_OUT"] = out
    rc = subprocess.call(
        [sys.executable, os.path.join(repo, "tools", "duckdb_baseline.py"), sf10]
        + (FACT_BOUND if fact_bound else TAIL),
        env=env,
    )
    if rc != 0 or not fact_bound:
        return rc
    # merge the fact-bound rows into the canonical artifact, keeping the
    # tail run's totals/provenance intact
    import json

    new = json.load(open(out))
    merged = json.load(open(artifact)) if os.path.exists(artifact) else {
        "queries": {}
    }
    merged.setdefault("queries", {}).update(new["queries"])
    merged["fact_bound_run"] = {
        k: v for k, v in new.items() if k != "queries"
    }
    merged["fact_bound_queries"] = FACT_BOUND
    with open(artifact, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    os.remove(out)
    print(f"merged {len(new['queries'])} fact-bound rows into {artifact}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
