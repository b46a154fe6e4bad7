"""Round-start + round-close ritual, automated (round-8 VERDICT item 5;
round-9 item 2 split it into two halves).

Four rounds in a row ended with the DRIVER's bench/correctness artifacts
untracked — structurally inevitable at round END, because the driver
writes them after the closing commit. So the ritual is now two calls::

    python tools/round_close.py --start     # FIRST thing in a round:
                                            # commit round N-1's driver
                                            # artifacts (BENCH_r{N-1},
                                            # CORRECTNESS_r{N-1},
                                            # VERDICT.md, ADVICE.md)
    python tools/round_close.py [N] [--no-bench]   # at round end

Close-mode steps:

1. (default) re-run ``bench.py`` at $SPARK_GRAFT_SF_DIR so
   ``bench_detail.json`` reflects the round's final code.
2. Cross-check the canonical bench-vs-DuckDB numbers: the committed
   ``BASELINE_COMPARE*.json`` ratios are printed next to every place
   COVERAGE.md / PLANS.md cites a ratio, so stale doc numbers are
   caught BEFORE the judge does (warn-only — docs are prose).
3. ``git add`` every round artifact (BENCH_r*/CORRECTNESS_r* included,
   whichever round number they carry) and commit.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Max acceptable in-run burst excess (Σ max(0, run − reprobe) over the
# movers re-probes, in seconds) for a bench attempt to be accepted
# without retry/WARN. One named constant (round-14 ADVICE: the literal
# 2.0 was duplicated in the early-break and the WARN gate and could
# silently drift). Overridable for experiments via env.
BURST_EXCESS_MAX_S = float(os.environ.get("SPARK_GRAFT_BURST_EXCESS_MAX_S", "2.0"))

ARTIFACTS = [
    "bench_detail.json",
    "BASELINE_COMPARE.json",
    "BASELINE_COMPARE_COLD.json",
    "BASELINE_COMPARE_SF1.json",
    "BASELINE_COMPARE_SF10.json",
    "COVERAGE.md",
    "PLANS.md",
    "ARCHITECTURE.md",
]


def attempt_rank(det: dict, quiet_threshold: float) -> tuple:
    """Rank key for a bench attempt, smaller = better: (ran loud?,
    in-run burst excess, worse-of-start/end stamp).

    The stamps alone can invert the pick (r14: a mid-run co-tenant
    burst decays out of the 1m loadavg before the end stamp — the
    burst-hit attempt read the calmer stamps). The artifact's own
    movers re-probes are a direct in-run tenancy measurement, so the
    excess Σ max(0, run − reprobe) breaks ties among stamp-quiet
    attempts. Raises KeyError on an artifact without stamps."""
    worst_load = max(
        det["conditions_start"]["loadavg_1m"],
        det.get("conditions_end", {}).get("loadavg_1m", 0.0),
    )
    burst_excess = sum(
        max(0.0, v.get("run", 0.0) - v["reprobe"])
        for v in (det.get("movers_vs_committed") or {}).values()
        if isinstance(v, dict) and "reprobe" in v
    )
    return (worst_load > quiet_threshold, burst_excess, worst_load)


COUNTS_BEGIN = "<!-- GENERATED-COUNTS:BEGIN (round_close rewrites this block; do not hand-edit) -->"
COUNTS_END = "<!-- GENERATED-COUNTS:END -->"


def refresh_generated_counts() -> None:
    """Rewrite COVERAGE.md's generated-counts block from live sources
    (round-14 VERDICT item 6: the hand-written test count drifted two
    rounds running, 417-vs-420 then 424-vs-428). Counts come from
    ``pytest --collect-only`` (collected == passed whenever the suite is
    green, which the close ritual separately requires) and from importing
    the catalog. Warn-and-skip on any failure — docs must not block the
    commit."""
    cov = os.path.join(REPO, "COVERAGE.md")
    if not os.path.exists(cov):
        return
    body = open(cov).read()
    if COUNTS_BEGIN not in body or COUNTS_END not in body:
        print("  WARN: COVERAGE.md lacks the generated-counts markers",
              file=sys.stderr)
        return
    try:
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
            cwd=REPO, capture_output=True, text=True, timeout=600,
        ).stdout
        m = re.search(r"(\d+) tests? collected", out)
        n_tests = int(m.group(1)) if m else None
        counts = json.loads(subprocess.run(
            [sys.executable, "-c",
             "import json, __spark_entry__ as e; q = e.queries(); "
             "o = e.oracle_sql(); print(json.dumps("
             "{'queries': len(q), 'oracle': len(o), "
             "'rows_only': len(set(q) - set(o))}))"],
            cwd=REPO, capture_output=True, text=True, timeout=300,
        ).stdout.strip().splitlines()[-1])
    except Exception as ex:  # noqa: BLE001 — docs step must not block commit
        print(f"  WARN: generated-counts refresh failed ({ex!r})",
              file=sys.stderr)
        return
    if n_tests is None:
        print("  WARN: could not parse pytest --collect-only output",
              file=sys.stderr)
        return
    block = (
        f"{COUNTS_BEGIN}\n"
        f"**{counts['queries']} catalog `queries()` entries** — "
        f"{counts['oracle']} DuckDB-oracle twins + "
        f"{counts['rows_only']} rows-only; "
        f"**{n_tests} pytest tests collected** "
        f"(counts machine-generated by `tools/round_close.py` at close).\n"
        f"{COUNTS_END}"
    )
    new = re.sub(
        re.escape(COUNTS_BEGIN) + r".*?" + re.escape(COUNTS_END),
        block, body, flags=re.S,
    )
    if new != body:
        open(cov, "w").write(new)
        print(f"  refreshed COVERAGE.md counts: {counts['queries']} queries / "
              f"{counts['oracle']} twins / {n_tests} tests")


def _load_quiet():
    """Load tools/quiet.py by file path (round-13 ADVICE): inserting
    tools/ into sys.path and importing the generic name `quiet` could
    shadow a same-named installed package for the rest of the process."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_graft_tools_quiet", os.path.join(REPO, "tools", "quiet.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def sh(*args: str) -> str:
    return subprocess.run(
        args, cwd=REPO, capture_output=True, text=True, check=False
    ).stdout


def round_start() -> int:
    """Round-START half of the ritual (round-9 VERDICT item 2): the
    driver writes round N-1's BENCH/CORRECTNESS (plus VERDICT/ADVICE)
    AFTER round N-1's closing commit, so they are necessarily untracked
    when round N begins. Committing them FIRST thing keeps ``git
    status`` clean for the whole round, so the close step only ever
    deals with round N's own refreshes."""
    prior = [
        os.path.relpath(p, REPO)
        for pat in (
            "BENCH_r*.json",
            "CORRECTNESS_r*.json",
            "VERDICT.md",
            "ADVICE.md",
        )
        for p in glob.glob(os.path.join(REPO, pat))
    ]
    subprocess.check_call(["git", "add", "--"] + sorted(prior), cwd=REPO)
    if not sh("git", "diff", "--cached", "--name-only").strip():
        print("round_start: prior-round driver artifacts already committed")
        return 0
    ns = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    n_prev = max(ns) if ns else 0
    subprocess.check_call(
        [
            "git",
            "commit",
            "-q",
            "-m",
            f"round {n_prev}: driver verdict/advice/correctness/bench artifacts",
        ],
        cwd=REPO,
    )
    print(sh("git", "log", "--oneline", "-1").strip())
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("round", nargs="?", type=int, default=None)
    ap.add_argument("--no-bench", action="store_true")
    ap.add_argument(
        "--bench-attempts",
        type=int,
        default=3,
        help="max quiet-gated bench attempts before promoting the "
        "quietest loud one (round-12 VERDICT item 6)",
    )
    ap.add_argument(
        "--start",
        action="store_true",
        help="round-START mode: commit the PREVIOUS round's driver "
        "artifacts (BENCH/CORRECTNESS/VERDICT/ADVICE) and exit",
    )
    args = ap.parse_args()

    if args.start:
        return round_start()

    n = args.round
    if n is None:  # infer: highest BENCH_r* present (driver writes per round)
        ns = [
            int(m.group(1))
            for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        n = (max(ns) + 1) if ns else 1

    staged_detail = os.path.join(REPO, "bench_out", "bench_detail.json")
    if not args.no_bench:
        # quiet-load gate (round-12 VERDICT item 6): the r12 canonical
        # pair was the quietest of three MANUAL runs — now round_close
        # enforces the threshold the artifacts stamp. Each attempt waits
        # for a quiet window first; if an attempt still STARTS loud
        # (co-tenant arrived mid-wait), retry up to --bench-attempts
        # times and promote the quietest start.
        quiet = _load_quiet()
        quiet_max, wait_for_quiet = quiet.quiet_max, quiet.wait_for_quiet

        attempts: list[tuple[float, str]] = []
        for attempt in range(1, args.bench_attempts + 1):
            wait_for_quiet(what=f"bench refresh (attempt {attempt})")
            print(f"== bench refresh (attempt {attempt})", flush=True)
            rc = subprocess.call(
                [sys.executable, os.path.join(REPO, "bench.py")],
                cwd=REPO,
                stderr=subprocess.DEVNULL,
            )
            if rc != 0:
                print("bench.py failed; aborting before commit", file=sys.stderr)
                return rc
            # judge the attempt by the WORSE of its start/end stamps: a
            # co-tenant burst mid-run slips a start-only check (the first
            # r13 close promoted a 0.02-start run whose streaming tail ate
            # a burst to 4.9 and read 194 s)
            import shutil

            kept = staged_detail + f".attempt{attempt}"
            # preserve the raw artifact FIRST (round-14 ADVICE): a run
            # whose detail file lacks stamps is not promotable, but its
            # per-query numbers are still wanted for diagnosis
            try:
                shutil.copyfile(staged_detail, kept)
            except OSError:
                pass
            try:
                with open(staged_detail) as f:
                    det = json.load(f)
                was_loud, burst_excess, worst_load = attempt_rank(
                    det, quiet_max()
                )
            except (OSError, ValueError, KeyError) as ex:
                # bench exited 0 but its detail artifact is missing or
                # unreadable (round-13 ADVICE): record nothing for this
                # attempt instead of crashing round_close mid-ritual
                # (the raw copy above, if any, stays for diagnosis)
                print(
                    f"  attempt {attempt}: bench_detail unreadable "
                    f"({ex!r}); attempt not promotable (raw copy kept "
                    f"at {os.path.basename(kept)} if written)",
                    file=sys.stderr,
                )
                continue
            attempts.append(((was_loud, burst_excess, worst_load), kept))
            if not was_loud and burst_excess < BURST_EXCESS_MAX_S:
                break
            print(
                f"  attempt {attempt} ran loud (worse of start/end "
                f"loadavg {worst_load:.2f} vs {quiet_max():.1f}; in-run "
                f"burst excess {burst_excess:.1f} s)"
                + (
                    "; retrying"
                    if attempt < args.bench_attempts
                    else " — out of attempts"
                ),
                file=sys.stderr,
            )
        if not attempts:
            print(
                "no bench attempt produced a readable bench_detail; "
                "aborting before commit",
                file=sys.stderr,
            )
            return 1
        # promote: quiet-stamped attempts first, then least in-run burst
        # excess (the movers re-probes), then the stamp itself
        (was_loud, best_excess, best_load), best_path = min(attempts)
        import shutil

        shutil.copyfile(best_path, staged_detail)
        if was_loud or best_excess >= BURST_EXCESS_MAX_S:
            print(
                f"  WARN: promoting an imperfect bench run (worse-of-"
                f"stamps loadavg {best_load:.2f}, in-run burst excess "
                f"{best_excess:.1f} s, across {len(attempts)} attempt(s))"
                " — the artifact stamps/movers show it",
                file=sys.stderr,
            )
    # bench.py writes to the UNTRACKED bench_out/ (so ad-hoc / driver
    # post-close runs keep the tree clean); promote the latest run to the
    # tracked root copy that gets committed as the round's canonical
    # per-query artifact (round-11 VERDICT item 7)
    if os.path.exists(staged_detail):
        import shutil

        shutil.copyfile(staged_detail, os.path.join(REPO, "bench_detail.json"))
        print("  promoted bench_out/bench_detail.json -> bench_detail.json")

    print("== generated counts")
    refresh_generated_counts()

    print("== canonical ratios")
    canonical: dict[str, str] = {}
    for f, label in (
        ("BASELINE_COMPARE.json", "warm"),
        ("BASELINE_COMPARE_COLD.json", "cold"),
    ):
        p = os.path.join(REPO, f)
        if os.path.exists(p):
            d = json.load(open(p))
            canonical[label] = f"{d['total_ratio']:.2f}"
            print(f"  {label}: total_ratio={d['total_ratio']} ({f})")
    for doc in ("COVERAGE.md", "PLANS.md"):
        p = os.path.join(REPO, doc)
        if not os.path.exists(p):
            continue
        body = open(p).read()
        defers = "canonical" in body and "BASELINE_COMPARE" in body
        cited = set(re.findall(r"(\d\.\d{2})[x×]", body))
        for label, val in canonical.items():
            if val not in cited and not defers:
                print(
                    f"  WARN: {doc} does not cite the committed {label} "
                    f"ratio {val}x — update it or point at the canonical "
                    "artifact"
                )

    print("== commit")
    to_add = [a for a in ARTIFACTS if os.path.exists(os.path.join(REPO, a))]
    to_add += [
        os.path.basename(p)
        for pat in ("BENCH_r*.json", "CORRECTNESS_r*.json")
        for p in glob.glob(os.path.join(REPO, pat))
    ]
    subprocess.check_call(["git", "add", "--"] + sorted(set(to_add)), cwd=REPO)
    if not sh("git", "status", "--porcelain").strip():
        print("  nothing to commit; already clean")
        return 0
    staged = sh("git", "diff", "--cached", "--name-only").strip()
    if not staged:
        print("  no artifact changes staged; working tree has only "
              "non-artifact changes — commit those yourself")
        return 0
    subprocess.check_call(
        ["git", "commit", "-q", "-m", f"round {n}: refresh round-close artifacts"],
        cwd=REPO,
    )
    print(sh("git", "log", "--oneline", "-1").strip())
    rest = sh("git", "status", "--porcelain").strip()
    if rest:
        print("  NOTE: non-artifact changes remain uncommitted:\n" + rest)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
