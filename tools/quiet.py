"""Quiet-window gate for canonical measurement artifacts (round-12
VERDICT item 6).

The host is shared-tenancy: 1m loadavg drifts 0.1-13 and absolute
seconds drift ±25% with it (measurement notes in BASELINE.md /
COVERAGE.md). Every canonical artifact (bench_detail.json,
BASELINE_COMPARE*.json) already STAMPS loadavg; this module makes the
producers enforce the threshold they stamp: block until the box is
quiet before a timed run, instead of publishing a loud run and
adjudicating it later. The r12 experience: three same-day pairs on
identical code spread warm 1.66x/2.00x/1.87x on load alone, and a
quiet-gated runner reliably catches a <1.5 window within ~30 min.

Env overrides:
  SPARK_GRAFT_QUIET_MAX      loadavg_1m threshold (default 2.0)
  SPARK_GRAFT_QUIET_TIMEOUT  max seconds to wait (default 1800)
"""

from __future__ import annotations

import os
import sys
import time

DEFAULT_MAX = 2.0
DEFAULT_TIMEOUT_S = 1800.0
POLL_S = 20.0


def quiet_max() -> float:
    return float(os.environ.get("SPARK_GRAFT_QUIET_MAX", str(DEFAULT_MAX)))


def wait_for_quiet(
    threshold: float | None = None,
    timeout_s: float | None = None,
    what: str = "timed run",
) -> float:
    """Block until 1m loadavg <= threshold; return the loadavg seen.

    Gives up after ``timeout_s`` (returning the current — loud — value)
    so an always-busy box degrades to a warned loud run rather than a
    hung harness; the caller decides whether to proceed, retry, or
    refuse promotion."""
    threshold = quiet_max() if threshold is None else threshold
    if timeout_s is None:
        timeout_s = float(
            os.environ.get("SPARK_GRAFT_QUIET_TIMEOUT", str(DEFAULT_TIMEOUT_S))
        )
    deadline = time.time() + timeout_s
    try:
        load, load5, _ = os.getloadavg()
    except OSError:  # platform without getloadavg: nothing to gate on
        return 0.0

    # the 5m average must ALSO be calm (at 2x the 1m threshold): a
    # one-minute co-tenant pause can drop load_1m under the bar while the
    # box is still busy on average — the r13 first pair started at 1m
    # 1.26 / 5m 6.4 and measured a DuckDB denominator 13% off the quiet
    # generation's
    def _loud(l1: float, l5: float) -> bool:
        return l1 > threshold or l5 > 2 * threshold

    waited = False
    while _loud(load, load5) and time.time() < deadline:
        if not waited:
            print(
                f"quiet-gate: loadavg 1m {load:.2f} / 5m {load5:.2f} over "
                f"({threshold:.1f}, {2 * threshold:.1f}); waiting up to "
                f"{timeout_s:.0f}s for a quiet window before {what}",
                file=sys.stderr,
                flush=True,
            )
            waited = True
        time.sleep(POLL_S)
        load, load5, _ = os.getloadavg()
    if _loud(load, load5):
        print(
            f"quiet-gate: still loud after {timeout_s:.0f}s "
            f"(loadavg {load:.2f}); proceeding LOUD — the artifact's own "
            "stamps will show it",
            file=sys.stderr,
            flush=True,
        )
    elif waited:
        print(
            f"quiet-gate: window found (loadavg {load:.2f})",
            file=sys.stderr,
            flush=True,
        )
    return load
