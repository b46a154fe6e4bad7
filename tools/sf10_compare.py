"""Second measured scale point: sf10 (100× the sf0.1 facts, fixed
dims) over the HEAVY TAIL — the ~16 worst Spark/DuckDB per-query ratios
from ``BASELINE_COMPARE_SF1.json`` — plus the FACT-BOUND representatives
(the queries whose cost is carried by the scaled documents/events
tables, i.e. the tables a 100 TB bill is made of).

PAIRED PROTOCOL (round-13 VERDICT item 1 — the sf0.1 discipline of
tools/baseline_pair.py extended here). The r13 experience: DuckDB's
w_pareto_share denominator measured 0.67 → 0.55 → 0.28 → 0.62 → 0.23 s
across same-day generations of the SAME query on the SAME data as the
OS page cache warmed — the committed ratio was a denominator lottery
while Spark's absolutes moved −58%. So this tool pins the cache state
instead of sampling it:

- FRESH synth dir per run: the data is written immediately before the
  compare, so the page cache deterministically holds the whole dir
  (maximally warm — consistent with BASELINE.md's warm-canonical
  policy) for BOTH engines; no cold/warm lottery across generations.
- ONE session: tools/duckdb_baseline.py interleaves Spark and DuckDB
  per query in one process over that shared cache state.
- QUIET-GATED: tools/quiet.py::wait_for_quiet blocks before the synth
  and before every compare attempt.
- START-STAMP PROMOTION, end stamps disclosed: the sf0.1 bench judges
  attempts by the worse of start/end (a mid-run co-tenant burst slips a
  start-only check), but at sf10 the end stamp is SELF-CONFOUNDED — a
  32-thread local run at full duty reads loadavg ~15-20 by its own work
  (the r13 artifact ended at 12.6 on a quiet-start day), so a
  worse-of criterion would mark every attempt loud forever and carry no
  tenancy signal. Attempts therefore retry on a loud START and the
  quietest start is promoted; both stamps of every attempt are
  disclosed in the artifact for the reader.

Usage::  python tools/sf10_compare.py [base_sf_dir] [--attempts N]
                                      [--reuse-dir DIR]

Writes ``BASELINE_COMPARE_SF10.json`` via tools/duckdb_baseline.py.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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


def _load_quiet():
    spec = importlib.util.spec_from_file_location(
        "spark_graft_tools_quiet", os.path.join(REPO, "tools", "quiet.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    argv = list(sys.argv[1:])
    attempts_max = 3
    if "--attempts" in argv:
        i = argv.index("--attempts")
        attempts_max = int(argv[i + 1])
        del argv[i : i + 2]
    sf10 = None
    fresh_synth = True
    if "--reuse-dir" in argv:  # diagnostics only — NOT the paired protocol
        i = argv.index("--reuse-dir")
        sf10 = argv[i + 1]
        fresh_synth = False
        del argv[i : i + 2]
    base = argv[0] if argv else "/root/testdata/sf0.1"

    quiet = _load_quiet()
    env_base = dict(os.environ)
    # sf10 needs driver headroom (a 16g driver GCLocker-thrashed under
    # the shared sf10 builds); respect an explicit override
    env_base.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")
    # the synth dir has no sf0.001 sibling, which silently disabled the
    # shape warm-up at sf10 (r14 VERDICT item 4: every entry paid its
    # first-plan compile in-run); point warmup() at the canonical
    # smallest SF next to the BASE dir instead
    warmup_dir = os.path.join(os.path.dirname(os.path.normpath(base)), "sf0.001")
    if os.path.isdir(warmup_dir):
        env_base.setdefault("SPARK_GRAFT_WARMUP_SF_DIR", warmup_dir)

    if sf10 is None:
        from good_enough_timecamp_data_pipeline_spark.session import get_spark
        from tools.scale_probe import scaled_dir

        quiet.wait_for_quiet(what="sf10 synthesis")
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")
        spark = get_spark("sf10_synth")
        sf10 = scaled_dir(spark, 100, base=base)
        print(f"sf10 synthesized at {sf10}", flush=True)
        spark.stop()  # the comparison run builds its own tuned session

    # one invocation = one session for the whole query set: the tail and
    # fact-bound passes used to be two processes whose DuckDB sides saw
    # different cache states
    queries = TAIL + [q for q in FACT_BOUND if q not in TAIL]
    artifact = os.path.join(REPO, "BASELINE_COMPARE_SF10.json")

    attempts: list[dict] = []
    best: tuple[float, str] | None = None
    for attempt in range(1, attempts_max + 1):
        quiet.wait_for_quiet(what=f"sf10 paired compare (attempt {attempt})")
        out = artifact + f".attempt{attempt}"
        env = dict(env_base)
        env["SPARK_GRAFT_BASELINE_OUT"] = out
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "tools", "duckdb_baseline.py"), sf10]
            + queries,
            env=env,
        )
        if rc != 0:
            print(f"attempt {attempt} failed rc={rc}", file=sys.stderr)
            continue
        try:
            d = json.load(open(out))
            start_1m = float((d.get("loadavg_start") or ["inf"])[0])
        except (OSError, ValueError):
            continue
        attempts.append(
            {
                "start_loadavg_1m": start_1m,
                "loadavg_start": d.get("loadavg_start"),
                "loadavg_end": d.get("loadavg_end"),
                "spark_total_s": d.get("spark_total_s"),
                "duckdb_total_s": d.get("duckdb_total_s"),
                "total_ratio": d.get("total_ratio"),
            }
        )
        if best is None or start_1m < best[0]:
            best = (start_1m, out)
        if start_1m <= quiet.quiet_max():
            break
        print(
            f"attempt {attempt} started loud (loadavg "
            f"{start_1m:.2f} > {quiet.quiet_max():.1f})"
            + ("; retrying" if attempt < attempts_max else " — out of attempts"),
            file=sys.stderr,
        )
    if best is None:
        print("no sf10 compare attempt produced an artifact", file=sys.stderr)
        return 1

    promoted = json.load(open(best[1]))
    promoted["fact_bound_queries"] = FACT_BOUND
    # per-group summaries: the union total is dominated by the fact-bound
    # rows' huge DuckDB denominators (d_ngram_jaccard ran 310 s in r13),
    # so the tail's constant-domination story needs its own subtotal
    for label, names in (("tail", TAIL), ("fact_bound", FACT_BOUND)):
        rows = {k: v for k, v in promoted.get("queries", {}).items() if k in names}
        sp = sum(v["spark_s"] for v in rows.values())
        du = sum(v["duckdb_s"] for v in rows.values())
        promoted[f"{label}_spark_total_s"] = round(sp, 2)
        promoted[f"{label}_duckdb_total_s"] = round(du, 2)
        promoted[f"{label}_total_ratio"] = round(sp / du, 2) if du else None
    promoted["paired_protocol"] = {
        "fresh_synth_dir": fresh_synth,
        "one_session": True,
        "page_cache_state": (
            "warm by construction — the synth dir was written immediately "
            "before the compare, so both engines read a fully cached dir; "
            "later attempts share that same state (no cold/warm lottery "
            "across generations)"
        ),
        "quiet_gate_max": quiet.quiet_max(),
        "promotion": (
            "min over attempts of START loadavg_1m — the end stamp is "
            "self-confounded at sf10 (the run's own 32-thread compute "
            "reads ~15-20 regardless of tenancy) and is disclosed, not "
            "judged"
        ),
        "attempts": attempts,
    }
    with open(artifact, "w") as f:
        json.dump(promoted, f, indent=1, sort_keys=True)
    import glob

    for path in glob.glob(artifact + ".attempt*"):
        os.remove(path)
    if best[0] > quiet.quiet_max():
        print(
            f"WARN: promoted a LOUD sf10 pair (best START loadavg_1m "
            f"{best[0]:.2f}); stamps disclosed in the artifact",
            file=sys.stderr,
        )
    print(
        f"promoted attempt with start_loadavg_1m={best[0]:.2f} -> {artifact}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
