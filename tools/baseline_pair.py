"""Run the warm and cold baseline protocols BACK-TO-BACK so their DuckDB
denominators share one page-cache state (round-11 VERDICT item 1b: the
cold ratio moved 2.08→2.20 across rounds while cold Spark *improved*,
because DuckDB's denominator warmed with the host's page cache between
measurement days — a bar that depends on the competitor's cache state is
unsettled).

Order: warm first (writes ``BASELINE_COMPARE.json``), then cold in a
fresh process with ``SPARK_GRAFT_SHAPE_WARMUP=0`` (writes
``BASELINE_COMPARE_COLD.json``). The cold run reads the just-written warm
artifact and embeds ``cold_ratio_paired`` = cold Spark total / warm
DuckDB total. Policy (BASELINE.md): the WARM artifact is the canonical
bar number; the cold artifact is a published diagnostic whose paired
ratio is the round-over-round trend metric.

Usage::  python tools/baseline_pair.py [sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # quiet-load gate (round-12 VERDICT item 6): canonical artifacts must
    # come from a quiet window — BLOCK for one instead of warn-and-run
    # (degrades to a stderr-warned loud run after the timeout so an
    # always-busy box can't hang the harness; the artifact stamps show it)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_graft_tools_quiet", os.path.join(REPO, "tools", "quiet.py")
    )
    quiet = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(quiet)
    quiet.wait_for_quiet(what="the canonical warm+cold baseline pair")
    baseline = os.path.join(REPO, "tools", "duckdb_baseline.py")

    print("== warm (shape-warmed) protocol -> BASELINE_COMPARE.json", flush=True)
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_SHAPE_WARMUP", None)
    env["SPARK_GRAFT_BASELINE_OUT"] = os.path.join(REPO, "BASELINE_COMPARE.json")
    rc = subprocess.call([sys.executable, baseline, sf_dir], env=env)
    if rc != 0:
        return rc

    print("== cold protocol -> BASELINE_COMPARE_COLD.json", flush=True)
    env = dict(os.environ)
    env["SPARK_GRAFT_SHAPE_WARMUP"] = "0"
    env["SPARK_GRAFT_BASELINE_OUT"] = os.path.join(
        REPO, "BASELINE_COMPARE_COLD.json"
    )
    return subprocess.call([sys.executable, baseline, sf_dir], env=env)


if __name__ == "__main__":
    raise SystemExit(main())
