"""Round-6 batch: Spark-4-native surfaces the catalog had not yet
exercised — VariantType semi-structured shredding and correlated
LATERAL subquery joins.

- ``f_variant_shred`` — the modern semi-structured path: ``parse_json``
  into a VARIANT value (Spark 4's binary-encoded, shredded-access
  semi-structured type — the open analog of warehouse VARIANT columns),
  typed field extraction with ``try_variant_get``, then a relational
  rollup over the extracted field. At 100 TB this is the schema-on-read
  pattern for event payloads: the variant column prunes/pushes like any
  other, and extraction happens without a per-row JSON re-parse per
  field. The reference stores raw JSON strings from the API
  (/root/reference/dlt_fetch_timecamp.py keeps dict payloads verbatim);
  this is the engine-native upgrade of that column.
- ``x_lateral_topn`` — per-group top-n via a correlated LATERAL
  subquery (ORDER BY + LIMIT inside the lateral body), the SQL-standard
  form of the top-k-per-group pattern the DataFrame catalog pins with
  windows (``x_topk_per_group``). Catalyst decorrelates the LIMIT into
  a ranked window, so the physical plan is one keyed shuffle — asserted
  against the window twin by the oracle, and LATERAL syntax parity
  matters to users porting warehouse SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .testdata import load_table, register_views


def f_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type rollup of a field shredded out of a VARIANT
    payload: parse the JSON props column once into VARIANT, extract
    ``$.k`` as BIGINT (``try_variant_get`` — NULL, never a throw, on
    path/type misses), and aggregate. One scan + one hash agg.

    Fixture contract (pinned by tests/test_round6.py): ``$.k`` in the
    testdata props is always an integer or absent. On non-integer
    payloads the engines would diverge — try_variant_get(...,'bigint')
    truncates 1.5 → 1 and casts booleans, while DuckDB's
    TRY_CAST(->>'k' AS BIGINT) yields NULL — so the twin holds only
    under that contract."""
    events = load_table(spark, sf_dir, "events")
    shredded = events.select(
        "event_type",
        F.expr("try_variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return (
        shredded.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.count("k").cast("long").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


F_VARIANT_SHRED_SQL = """
WITH shredded AS (
    SELECT event_type,
           TRY_CAST(props::JSON ->> 'k' AS BIGINT) AS k
    FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       ROUND(AVG(k), 6) AS avg_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM shredded
GROUP BY event_type
""".strip()


def x_lateral_topn(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Top-``n`` customers by account balance per nation, written as a
    correlated LATERAL subquery (ORDER BY + LIMIT in the body) — the
    SQL-standard spelling of top-k-per-group. Catalyst decorrelates the
    correlated LIMIT into a per-key ranked window, so the executed plan
    is ONE shuffle on the correlation key, not a per-nation re-scan
    (plan shape pinned in tests/test_plans.py)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT n.n_name AS nation, c.c_name AS customer, c.c_acctbal AS acctbal
        FROM nation n,
        LATERAL (
            SELECT c_name, c_acctbal
            FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT {int(n)}
        ) c
        """
    )


X_LATERAL_TOPN_SQL = """
SELECT n.n_name AS nation, c.c_name AS customer, c.c_acctbal AS acctbal
FROM nation n,
LATERAL (
    SELECT c_name, c_acctbal
    FROM customer
    WHERE c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_name
    LIMIT 3
) c
""".strip()


def t_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn 6 BPE merges from a deterministic 1-in-11 document sample
    (operators/bpe.py) — tokenizer TRAINING, the step upstream of every
    token-count/seq-pack entry in the catalog. Tokenizer trainers sample
    at scale (merge statistics converge long before the corpus ends), so
    the sample IS the production shape, not a shortcut. rows-only:
    the merge loop is iterative (argmax per round) — not one SQL
    statement; exactness is pinned by a pure-Python reference fold in
    tests/test_bpe.py."""
    from ..operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    return bpe_train(docs, n_merges=6)
