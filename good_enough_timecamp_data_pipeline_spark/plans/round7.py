"""Round-7 catalog additions.

Each oracle-twinned entry lands in ``ROUND7_QUERIES`` as
``name -> (fn, oracle_sql)`` and is registered inside the driver's
first-50 correctness window (see catalog.py) so new queries get a hard
driver confirmation in their first round. Rows-only additions register
separately at the catalog tail.

- ``t_calibration_bins`` — reliability-diagram data for the hashed
  quality classifier (round5d.t_hashed_classifier) against the
  rules-based quality gate (northstar.t_quality): bin the model score
  into 10 equal-width bins over [-1, 1] and report, per bin, the doc
  count, mean predicted score, and the observed pass rate of the
  heuristic gate. The standard calibration diagnostic every model-based
  corpus filter ships with (does score s really mean "s-likely to be
  good"?). One projection + one 10-group hash agg — scan-shaped, no
  Python, no join: both the score and the label derive from the same
  tokenized row.
- ``a_weighted_quantile`` — exact weighted quantiles (p25/p50/p90 of
  l_extendedprice weighted by l_quantity). Shape: groupBy value first
  (the value-histogram, cardinality-sized), then one cumulative-weight
  window over the HISTOGRAM, never the fact table — the same
  dimension-sized-window contract as the catalog's other global-order
  entries. At 100 TB the histogram is the only thing that sorts.
- ``f_variant_write_shred`` (rows-only) — the WRITE half of the VARIANT
  story (f_variant_shred covers read/extract): parse the events props
  into VARIANT, land them as SHREDDED parquet (typed ``typed_value``
  subcolumns per the parquet variant spec), read the artifact back and
  extract a shredded field. tests/test_round7.py pins the 100×-scale
  payoff: the scan of the shredded artifact prunes to
  ``struct<v:struct<k:bigint>>`` — field-level column pruning through a
  semi-structured payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text
from .northstar import TOKS_SQL, _stop_ratio_sql
from .round5d import _WEIGHT_SQL, _weight_expr
from .testdata import load_table

ROUND7_QUERIES: dict = {}


def _register(name: str, fn, sql: str) -> None:
    ROUND7_QUERIES[name] = (fn, sql)


# ---------------------------------------------------------------------------
# t_calibration_bins
# ---------------------------------------------------------------------------


def t_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins: hashed-classifier score vs heuristic-gate label.

    label := quality >= 0.6 with quality exactly as `t_quality` computes
    it (operand order mirrored in the SQL twin, so the IEEE doubles and
    hence the boundary comparisons agree engine-to-engine).

    The per-doc (n_tokens, score_raw, quality) inference pass is the
    session-shared scored corpus (`round5d.docs_hash_scored`) — the
    md5-per-token fold and the quality heuristic run once per session,
    not once per consumer entry."""
    from .round5d import docs_hash_scored

    d = docs_hash_scored(spark, sf_dir)
    score_raw = F.col("score_raw")
    n_toks = F.col("n_tokens")
    score = F.when(
        n_toks > 0,
        score_raw.cast("double") / (n_toks.cast("double") * 1000.0),
    ).otherwise(F.lit(0.0))
    label = (F.col("quality") >= 0.6).cast("int")
    scored = d.select(
        F.least(
            F.lit(9), F.floor((score + F.lit(1.0)) / F.lit(0.2)).cast("int")
        ).alias("bin"),
        score.alias("score"),
        label.alias("label"),
    )
    return (
        scored.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.avg(F.col("label").cast("double")), 6).alias("pass_rate"),
        )
    )


T_CALIBRATION_BINS_SQL = f"""
WITH t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents),
s AS (
    SELECT doc_id, text, toks,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(COALESCE(list_sum(list_transform(toks, t -> {_WEIGHT_SQL})), 0)
                AS BIGINT) AS score_raw,
           {_stop_ratio_sql('toks', text.STOPWORDS['en'])} AS en_stop_ratio,
           CASE WHEN len(toks) >= 20 AND len(toks) <= 1000 THEN 1.0
                WHEN len(toks) > 0 THEN 0.5 ELSE 0.0 END AS len_band,
           CASE WHEN length(text) > 0
                THEN CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
                     / length(text)
                ELSE 0.0 END AS alpha_ratio
    FROM t
),
q AS (
    SELECT CASE WHEN n_tokens > 0
                THEN CAST(score_raw AS DOUBLE) / (n_tokens * 1000.0)
                ELSE 0.0 END AS score,
           CASE WHEN 0.4 * len_band + 0.4 * alpha_ratio
                     + 0.2 * (CASE WHEN en_stop_ratio > 0.01 THEN 1.0 ELSE 0.0 END)
                     >= 0.6 THEN 1 ELSE 0 END AS label
    FROM s
)
SELECT LEAST(9, CAST(FLOOR((score + 1.0) / 0.2) AS INTEGER)) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(score), 6) AS mean_score,
       ROUND(AVG(CAST(label AS DOUBLE)), 6) AS pass_rate
FROM q
GROUP BY 1
""".strip()

_register("t_calibration_bins", t_calibration_bins, T_CALIBRATION_BINS_SQL)


# ---------------------------------------------------------------------------
# a_weighted_quantile
# ---------------------------------------------------------------------------


def a_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted p25/p50/p90 of l_extendedprice, weighted by
    l_quantity: smallest value whose cumulative weight reaches q·W.

    The fact table reduces to the value histogram first (one hash agg,
    checkpointed once — compressed table, never the fact). The quantile
    boundaries then come from the textbook two-level refine, NOT a
    cumulative window over the whole histogram: per-BUCKET weight totals
    (monotone range buckets, `operators/order.py::long_range_bucket`)
    are collected — ≤ 256 rows however big the data — the driver
    prefix-sums them to locate each quantile's bucket and its incoming
    offset, and a single partitioned window pass over ONLY the marked
    buckets (≤ 3 of 256) finds the crossing values. No single-partition
    stage anywhere, and the big pass touches ~1% of the histogram
    (round-7 VERDICT item 2: a bare ``Window.orderBy`` here serializes a
    millions-of-distinct-prices histogram through one task at 100 TB).
    Weights are integral sums of integral quantities, so the driver's
    integer prefix and both engines' running sums are exact."""
    from ..operators.order import pin_with_range_bucket

    li = load_table(spark, sf_dir, "lineitem")
    hist, bucket = pin_with_range_bucket(
        li.groupBy(F.col("l_extendedprice").alias("v")).agg(
            F.sum("l_quantity").alias("wt")
        ),
        F.col("v"),
    )
    b = hist.withColumn("__b", bucket)
    totals = sorted(
        (r["__b"], int(r["t"]))
        for r in b.groupBy("__b").agg(F.sum("wt").alias("t")).collect()
    )
    tw = float(sum(t for _, t in totals))
    qs = {"p25_w": 0.25, "p50_w": 0.50, "p90_w": 0.90}
    # driver prefix over the ≤256-row bucket totals: each quantile's
    # crossing bucket and the cumulative weight entering it
    marks: dict[str, tuple[int, int]] = {}
    for name, q in qs.items():
        run = 0
        for bk, t in totals:
            if run + t >= q * tw:
                marks[name] = (bk, run)
                break
            run += t
    want = sorted({bk for bk, _ in marks.values()})
    w_in = Window.partitionBy("__b").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        b.filter(F.col("__b").isin(want))
        .withColumn("cw", F.sum("wt").over(w_in))
    )
    aggs = []
    for name, q in qs.items():
        bk, off = marks.get(name, (None, 0))
        cond = (F.col("__b") == F.lit(bk)) & (
            F.col("cw") + F.lit(off) >= F.lit(q) * F.lit(tw)
        )
        aggs.append(F.min(F.when(cond, F.col("v"))).alias(name))
    # empty input: the twin's MAX(tw) over zero rows is NULL, not 0.0
    aggs.append(
        F.round(F.lit(tw if totals else None).cast("double"), 2).alias("total_weight")
    )
    return cum.agg(*aggs)


A_WEIGHTED_QUANTILE_SQL = """
WITH hist AS (
    SELECT l_extendedprice AS v, SUM(l_quantity) AS wt
    FROM lineitem GROUP BY 1
),
c AS (
    SELECT v,
           SUM(wt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw,
           SUM(wt) OVER () AS tw
    FROM hist
)
SELECT MIN(CASE WHEN cw >= 0.25 * tw THEN v END) AS p25_w,
       MIN(CASE WHEN cw >= 0.50 * tw THEN v END) AS p50_w,
       MIN(CASE WHEN cw >= 0.90 * tw THEN v END) AS p90_w,
       ROUND(MAX(tw), 2) AS total_weight
FROM c
""".strip()

_register("a_weighted_quantile", a_weighted_quantile, A_WEIGHTED_QUANTILE_SQL)


# ---------------------------------------------------------------------------
# f_variant_write_shred (rows-only)
# ---------------------------------------------------------------------------


def f_variant_write_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events props as SHREDDED VARIANT parquet, read the artifact
    back, extract the shredded field, aggregate. Covers the write half
    of the VARIANT story; tests/test_round7.py asserts the scan of the
    artifact prunes to the single typed subfield.

    The shredding schema is forced via
    ``spark.sql.variant.forceShreddingSchemaForTest`` — the only switch
    OSS Spark 4.1 exposes to produce spec-compliant shredded files (the
    production surface is a writer/table property once SPARK-45891's
    shredding API stabilizes); the files themselves are real shredded
    variant parquet, not a test fake. Conf is set/restored around the
    write so nothing leaks into the session."""
    import os

    from ..localfs import private_run_dir

    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "event_id", "event_type", F.parse_json(F.col("props")).alias("v")
    )
    # fresh mkdtemp under the lstat-verified per-user root: the previous
    # fixed per-sf path was pre-plantable by another local user and
    # raced between concurrent runs on the same sf basename (round-7
    # ADVICE item 1)
    out_dir = os.path.join(
        private_run_dir(
            "spark_graft_variant_shred",
            prefix=os.path.basename(os.path.normpath(sf_dir)) + "-",
        ),
        "data",
    )
    key = "spark.sql.variant.forceShreddingSchemaForTest"
    prev = spark.conf.get(key, "")
    spark.conf.set(key, "k bigint")
    try:
        v.write.mode("overwrite").parquet(out_dir)
    finally:
        spark.conf.set(key, prev)
    back = spark.read.parquet(out_dir)
    return (
        back.select(
            "event_type",
            F.expr("try_variant_get(v, '$.k', 'bigint')").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.count("k").cast("long").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
        )
        .orderBy("event_type")
    )
