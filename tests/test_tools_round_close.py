"""tools/round_close.py attempt ranking — the r14 promotion rule.

Loaded via importlib by file path (same hygiene as test_tools_quiet).
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "spark_graft_tools_round_close",
    os.path.join(os.path.dirname(__file__), "..", "tools", "round_close.py"),
)
round_close = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(round_close)


def _det(start, end, movers=None):
    return {
        "conditions_start": {"loadavg_1m": start},
        "conditions_end": {"loadavg_1m": end},
        "movers_vs_committed": movers or {},
    }


def test_burst_excess_outranks_calmer_stamps():
    """The r14 regression: a burst-hit attempt with calmer stamps
    (1.67→3.01, 23 s of run−reprobe excess) must lose to the clean run
    whose end stamp merely caught decaying load (0.31→4.25, 0.3 s)."""
    burst_hit = _det(
        1.67, 3.01,
        {"a": {"committed": 3.1, "run": 10.2, "reprobe": 3.5},
         "b": {"committed": 4.5, "run": 7.0, "reprobe": 4.8},
         "c": {"committed": 4.0, "run": 6.4, "reprobe": 4.8}},
    )
    clean = _det(
        0.31, 4.25,
        {"d": {"committed": 2.2, "run": 0.65, "reprobe": 0.51},  # improvement
         "e": {"committed": 2.0, "run": 1.1, "reprobe": 1.0}},
    )
    assert round_close.attempt_rank(clean, 2.0) < round_close.attempt_rank(
        burst_hit, 2.0
    )


def test_quiet_stamp_outranks_loud_regardless_of_excess():
    quiet = _det(0.5, 1.2, {"a": {"run": 5.0, "reprobe": 3.0}})
    loud = _det(0.5, 6.0, {})
    assert round_close.attempt_rank(quiet, 2.0) < round_close.attempt_rank(
        loud, 2.0
    )


def test_improvements_do_not_count_as_excess():
    # run < reprobe (code got faster vs committed) contributes zero
    det = _det(0.5, 0.7, {"a": {"run": 0.6, "reprobe": 1.0}})
    was_loud, excess, worst = round_close.attempt_rank(det, 2.0)
    assert not was_loud and excess == 0.0 and worst == 0.7


def test_missing_stamps_raise():
    import pytest

    with pytest.raises(KeyError):
        round_close.attempt_rank({"movers_vs_committed": {}}, 2.0)
