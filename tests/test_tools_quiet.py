"""tools/quiet.py — the quiet-window gate for canonical artifacts.

Loaded via importlib by file path (round-13 ADVICE): inserting tools/
into sys.path and importing the generic name `quiet` could shadow a
same-named installed package for the rest of the pytest session.
"""

import importlib.util
import os
import time

_spec = importlib.util.spec_from_file_location(
    "spark_graft_tools_quiet",
    os.path.join(os.path.dirname(__file__), "..", "tools", "quiet.py"),
)
quiet = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(quiet)


def test_quiet_max_env_override(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_QUIET_MAX", raising=False)
    assert quiet.quiet_max() == 2.0
    monkeypatch.setenv("SPARK_GRAFT_QUIET_MAX", "1.5")
    assert quiet.quiet_max() == 1.5


def test_wait_returns_immediately_when_quiet(monkeypatch):
    # threshold above any plausible load: no sleep, returns current load
    t0 = time.time()
    load = quiet.wait_for_quiet(threshold=10_000.0, timeout_s=60, what="test")
    assert time.time() - t0 < 1.0
    assert load >= 0.0


def test_wait_gives_up_after_timeout(monkeypatch):
    # impossible threshold + tiny timeout: must return (loud) rather than hang
    monkeypatch.setattr(quiet, "POLL_S", 0.05)
    t0 = time.time()
    load = quiet.wait_for_quiet(threshold=-1.0, timeout_s=0.2, what="test")
    assert time.time() - t0 < 5.0
    assert load > -1.0
