"""Unit tests for tools/broadcast_audit.py's plan-string classifier."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.broadcast_audit import audit_plan


def test_flags_unreduced_fact_broadcast():
    plan = """AdaptiveSparkPlan
+- BroadcastHashJoin [doc_id], [doc_id], Inner, BuildRight
   :- HashAggregate(keys=[doc_id], functions=[count(1)])
   +- BroadcastExchange HashedRelationBroadcastMode(List(input[0, bigint, true]),false)
      +- Project [doc_id, dl]
         +- Filter isnotnull(doc_id)
            +- FileScan parquet [doc_id,text] ... documents.parquet
"""
    hard, review = audit_plan(plan)
    assert hard and "documents.parquet" in hard[0]
    assert not review


def test_scalar_agg_and_limit_are_bounded():
    plan = """Join
:- BroadcastExchange IdentityBroadcastMode
:  +- HashAggregate(keys=[], functions=[count(1)])
:     +- FileScan parquet ... events.parquet
+- BroadcastExchange HashedRelationBroadcastMode(List(input[0]),false)
   +- TakeOrderedAndProject(limit=40, orderBy=[df DESC])
      +- FileScan parquet ... documents.parquet
"""
    hard, review = audit_plan(plan)
    assert not hard and not review


def test_keyed_agg_is_review_not_flag():
    plan = """Join
+- BroadcastExchange HashedRelationBroadcastMode(List(input[0]),false)
   +- HashAggregate(keys=[bucket], functions=[sum(n)])
      +- Scan ExistingRDD[doc_id,bucket,n]
"""
    hard, review = audit_plan(plan)
    assert not hard
    assert review and "keyed agg" in review[0]


def test_checkpoint_scan_without_reducer_flags():
    plan = """Join
+- BroadcastExchange HashedRelationBroadcastMode(List(input[0]),false)
   +- Filter isnotnull(doc_id)
      +- Scan ExistingRDD[doc_id,dl]
"""
    hard, review = audit_plan(plan)
    assert hard and "ExistingRDD" in hard[0]


def test_reused_exchange_not_double_counted():
    plan = """Join
+- ReusedExchange [tok, df], BroadcastExchange HashedRelationBroadcastMode
   +- FileScan parquet ... documents.parquet
"""
    hard, review = audit_plan(plan)
    assert not hard and not review


def test_bounded_offsets_scan_whitelisted():
    """The order.py global-cumsum offsets artifact (all __-prefixed
    columns, rows = partition count) is a deliberately-bounded broadcast
    dimension — never flagged."""
    plan = """Join
+- BroadcastExchange HashedRelationBroadcastMode(List(cast(input[0, int, false] as bigint)),false)
   +- Filter isnotnull(__b#389)
      +- Scan ExistingRDD[__b#389,__off_c1#390L,__off_c2#391L]
"""
    hard, review = audit_plan(plan)
    assert not hard and not review
