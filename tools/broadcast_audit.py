"""Broadcast-build audit at a scaled SF (round-10; motivated by a real
crash): find every planned BroadcastExchange whose build subtree reads a
FACT table (documents/events/orders/lineitem — the tables that grow) or
a checkpointed RDD, i.e. a broadcast whose size is decided by data
volume rather than by construction.

Why: ``t_dsir_weights`` died at the synthesized sf10 with "Not enough
memory to build and broadcast" — Catalyst chose BuildLeft on the
corpus-sized (doc, bucket) checkpoint because a LogicalRDD's size
estimate does not track real volume. Any other plan with the same shape
is the same latent OOM. Plans are BUILT, not executed (eager shared
checkpoints and cost probes do run — that is part of plan construction).

Usage::

    python tools/broadcast_audit.py [sf_dir] [query ...]

Prints one line per query: OK / FLAG (with the offending scan) / SKIP
(plan build failed — listed, not hidden).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACT_MARKERS = ("documents.parquet", "events.parquet", "orders.parquet",
                "lineitem.parquet")
# ExistingRDD = localCheckpoint output; its stats do not track volume
RDD_MARKER = "Scan ExistingRDD"

_RDD_COLS = re.compile(r"Scan ExistingRDD\[([^\]]*)\]")


def _is_bounded_offsets_scan(line: str) -> bool:
    """True when every column of the ExistingRDD scan is __-prefixed —
    the repo convention for the bounded global-cumsum offsets artifact
    (`operators/order.py`: rows = partition count by construction)."""
    m = _RDD_COLS.search(line)
    if not m:
        return False
    cols = [c.strip() for c in m.group(1).split(",") if c.strip()]
    return bool(cols) and all(c.startswith("__") for c in cols)


# Nodes that provably bound a broadcast's size regardless of input
# volume: a hard row limit, or a keyless (scalar) aggregate. A KEYED
# aggregate between the scan and the broadcast reduces to the key
# cardinality — bounded iff the key is (bucket, event_type, …), which
# the tool cannot prove, so those are REVIEW, not FLAG.
_LIMIT_NODES = ("TakeOrderedAndProject", "CollectLimit", "GlobalLimit")
_SCALAR_AGG = re.compile(r"Aggregate\(keys=\[\]")
_KEYED_AGG = re.compile(r"Aggregate\(keys=\[[^\]]")


def audit_plan(plan_str: str) -> tuple[list[str], list[str]]:
    """(hard_flags, reviews) for BroadcastExchange subtrees that read a
    fact scan / checkpointed RDD.

    HARD FLAG = no size-reducing node (limit / aggregate) between the
    exchange and the data scan — the broadcast build grows with the
    data (the ``t_dsir_weights`` sf10 OOM signature). REVIEW = a keyed
    aggregate intervenes; bounded iff the grouping key's cardinality is
    bounded by construction — human judgment, shown with the node.

    Subtree extraction is indentation-based over the treeString: a
    node's subtree is every following line whose visual indent is
    deeper than the node's own."""
    lines = plan_str.splitlines()

    def indent(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-*("))

    hard, review = [], []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line or "ReusedExchange" in line:
            continue
        d = indent(line)
        sub = []
        for nxt in lines[i + 1:]:
            if nxt.strip() and indent(nxt) <= d:
                break
            sub.append(nxt)
        hit = None
        reducer = None
        for s in sub:
            if any(n in s for n in _LIMIT_NODES) or _SCALAR_AGG.search(s):
                reducer = "bounded"  # provably size-capped
                break
            if _KEYED_AGG.search(s) and reducer is None:
                reducer = s.strip()[:80]  # keyed — needs judgment
            if RDD_MARKER in s and _is_bounded_offsets_scan(s):
                # the order.py global-cumsum bucket-offset artifact:
                # rows = partition count by construction; its columns
                # are all __-prefixed (`__b`, `__off_*`) — the marker
                # of a deliberately-bounded broadcast dimension
                continue
            if any(m in s for m in FACT_MARKERS) or RDD_MARKER in s:
                hit = next((m for m in FACT_MARKERS if m in s), "ExistingRDD")
                break
        if hit is None or reducer == "bounded":
            continue
        if reducer is None:
            hard.append(f"{hit} with NO reducing node")
        else:
            review.append(f"{hit} via keyed agg: {reducer}")
    return hard, review


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]

    from good_enough_timecamp_data_pipeline_spark.plans import catalog
    from good_enough_timecamp_data_pipeline_spark.session import (
        get_spark,
        tuned_conf_for,
    )

    spark = get_spark("broadcast_audit")
    for k, v in tuned_conf_for(sf_dir).items():
        spark.conf.set(k, v)

    qs = catalog.queries()
    if names:
        qs = {n: qs[n] for n in names}
    else:
        # default: every oracle twin (rows-only entries often need
        # streaming feeds / media dirs not present under sf_dir)
        oracles = catalog.oracle_sql()
        qs = {n: f for n, f in qs.items() if n in oracles}

    n_flag = n_review = n_skip = 0
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"SKIP   {name}: {type(exc).__name__}: {str(exc)[:120]}")
            n_skip += 1
            continue
        hard, review = audit_plan(plan)
        if hard:
            n_flag += 1
            print(f"FLAG   {name}: {hard}")
        elif review:
            n_review += 1
            print(f"REVIEW {name}: {review}")
        else:
            print(f"OK     {name}")
    print(
        f"\n{n_flag} flagged, {n_review} review, {n_skip} skipped, "
        f"{len(qs)} audited"
    )
    return 1 if n_flag else 0


if __name__ == "__main__":
    raise SystemExit(main())
