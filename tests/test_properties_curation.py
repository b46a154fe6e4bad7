"""Property-based invariants for the round-5b curation operators:
random inputs checked against brute-force Python references (SURVEY §5
strategy — the Spark plan must agree with the obvious sequential program).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.operators.multimodal import (
    ppm_average_hash,
    synthesize_ppm,
)

# small random corpora: a handful of docs over a tiny vocabulary so line
# collisions actually happen
words = st.sampled_from(["alpha", "beta", "gamma", "delta"])
docs_strategy = st.lists(
    st.lists(words, min_size=1, max_size=35), min_size=1, max_size=8
)


def brute_force_line_dedup(token_lists, width=10):
    """Sequential reference: global first-occurrence wins over pseudo-lines."""
    seen = set()
    out = {}
    for doc_id, toks in enumerate(token_lists):
        n_lines = -(-len(toks) // width)
        kept = []
        for i in range(n_lines):
            line = " ".join(toks[i * width : (i + 1) * width])
            if line not in seen:
                seen.add(line)
                kept.append(line)
        out[doc_id] = (n_lines, len(kept), " ".join(kept))
    return out


# 4 examples: each is a whole random corpus and costs ~5 s of fixed
# write+plan constant; suite-time budget (round-9 VERDICT item 8)
@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(token_lists=docs_strategy)
def test_line_dedup_matches_brute_force(spark, token_lists):
    import os
    import tempfile

    from good_enough_timecamp_data_pipeline_spark.plans.curation import t_line_dedup

    with tempfile.TemporaryDirectory() as d:
        df = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
            "doc_id long, text string",
        )
        df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r.doc_id: (r.n_lines, r.n_kept, r.clean_text)
            for r in t_line_dedup(spark, d).collect()
        }
    assert got == brute_force_line_dedup(token_lists)


revenues = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30
)


# 4 examples: see the suite-time note above
@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(cents=revenues)
def test_pareto_matches_brute_force(spark, cents):
    import os
    import tempfile

    from good_enough_timecamp_data_pipeline_spark.plans.curation import w_pareto_share

    with tempfile.TemporaryDirectory() as d:
        rows = [(i, float(c) / 100.0) for i, c in enumerate(cents)]
        spark.createDataFrame(rows, "o_custkey long, o_totalprice double").coalesce(
            1
        ).write.parquet(os.path.join(d, "orders.parquet"))
        got = {
            r.o_custkey: (r.rev_cents, r.cum_cents, r.is_top80)
            for r in w_pareto_share(spark, d).collect()
        }
    # brute force on exact integer cents
    import math

    ref_rev = {i: math.floor((float(c) / 100.0) * 100) for i, c in enumerate(cents)}
    order = sorted(ref_rev, key=lambda k: (-ref_rev[k], k))
    total = sum(ref_rev.values())
    cum = 0
    for k in order:
        cum += ref_rev[k]
        expect_top = (cum - ref_rev[k]) * 10 < total * 8
        assert got[k] == (ref_rev[k], cum, expect_top), (k, got[k])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(key=st.integers(min_value=0, max_value=10_000), text=st.text(max_size=30))
def test_phash_locality(key, text):
    """aHash must be stable under identity and change only a bounded number
    of bits under a last-byte nudge (grid locality)."""
    img = synthesize_ppm(key, text)
    h1 = ppm_average_hash(img)
    assert h1 == ppm_average_hash(bytes(img))
    nudged = img[:-1] + bytes([(img[-1] + 1) % 256])
    ham = bin((h1 ^ ppm_average_hash(nudged)) & ((1 << 64) - 1)).count("1")
    # one channel of one pixel moved by 1/255 → at most a mean-boundary
    # handful of grid cells can flip
    assert ham <= 8


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 43) - 1),  # doc_id
            st.integers(min_value=0, max_value=(1 << 20) - 1),  # pos
        ),
        min_size=2,
        max_size=50,
    )
)
def test_line_dedup_packed_key_preserves_order(pairs):
    """The r12 t_line_dedup rewrite decides winners with
    min(doc_id << POS_BITS | pos) instead of min(struct(doc_id, pos)) —
    valid ONLY if packing is order-isomorphic to the lexicographic
    (doc_id, pos) order over the documented domain (pos < 2^20,
    doc_id < 2^43). Pure property, no Spark needed."""
    from good_enough_timecamp_data_pipeline_spark.plans.curation import POS_BITS

    packed = [(d << POS_BITS) | p for d, p in pairs]
    assert all(pk < (1 << 63) for pk in packed)  # no long overflow
    by_tuple = sorted(range(len(pairs)), key=lambda i: pairs[i])
    by_packed = sorted(range(len(pairs)), key=lambda i: packed[i])
    # identical total order => identical min-winner for any subset
    assert [pairs[i] for i in by_tuple] == [pairs[i] for i in by_packed]
    assert min(packed) == (min(pairs)[0] << POS_BITS) | min(pairs)[1]
