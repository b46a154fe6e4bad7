"""Round-5e batch: web-crawl source governance, distribution testing,
and time-series smoothing — four oracle-twinned queries plus the k-core
graph cut.

- ``t_source_caps`` — per-source document capping: every web-crawl
  curation stack caps how many documents any single domain may
  contribute (Gopher/RefinedWeb-style host balancing) so one crawl-happy
  site cannot dominate the mixture. Deterministic: rank within source by
  md5(doc_id) — a seedless uniform shuffle both engines compute
  identically — and keep the first ``SOURCE_CAP``.
- ``t_temperature_mix`` — temperature-scaled source sampling weights
  (the multilingual-LM recipe, α = 0.5): w_s ∝ p_s^α flattens the
  source distribution so small sources are not drowned. sqrt/div are
  correctly-rounded IEEE ops, and the one order-sensitive float
  reduction (Σ √n_s) is an ORDERED sequential fold over sources sorted
  by name — bit-identical in both engines (`F.aggregate` vs DuckDB
  ``list_reduce`` over ``list(... ORDER BY ...)``).
- ``a_chi_square`` — Pearson χ² independence test between event type
  and weekend/weekday — the categorical drift companion to the
  continuous ``a_ks_test``. Exactness: each cell's statistic is
  (o·N − r·c)² / (N·r·c) with the difference held in exact 128-bit
  integers (DECIMAL(38,0) / HUGEINT); the square and divisions run in
  correctly-rounded double from identical inputs, and the cross-cell
  sum is again an ordered fold (10 cells).
- ``e_ewma_anomaly`` — exponentially-weighted moving average of daily
  event volume with a ratio anomaly flag. The EWMA recurrence
  s_t = ½x_t + ½s_{t−1} looks iterative, but with λ = ½ it has an EXACT
  closed form as a cumulative sum: s_t = (Σ_{k≤t} y_k) / 2^{t+1} with
  y_0 = 2x_0, y_k = x_k·2^k — integer powers of two in DECIMAL(38,0),
  one final division by a power of two (exact double scaling). The
  "recursive smoothing as one windowed cumsum" move is how a
  Spark-first design avoids a sequential per-row UDF entirely.
- ``g_kcore`` — k-core of the part↔supplier co-purchase graph
  (`operators/graph.py::kcore`): iterative peeling, rows-only in the
  gate (fixpoint loops are not single-statement SQL), invariants and a
  brute-force tiny-graph reference in tests/test_round5e.py.

Scale notes: source/day/event-type are BOUNDED-cardinality dimensions
(domains, calendar days, enum types), so per-source windows, the
one-row totals crossJoin, and the per-day cumsum window all operate on
dimension-sized data, never fact-sized; every fact-table touch is a
single hash-agg with map-side combine. The EWMA closed form is exact
for series up to ~120 steps (DECIMAL(38) headroom); longer horizons
re-base the exponent per chunk — documented at the function.

Cross-engine exactness follows the a_gini rule throughout: integers
until one final division; any float SUM whose addition order Spark
does not fix runs as an ordered sequential fold on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import kcore
from ..operators.text import tokenize
from .testdata import load_table

# ---------------------------------------------------------------------------
# t_source_caps — per-source document capping (host/domain balancing)
# ---------------------------------------------------------------------------

SOURCE_CAP = 15  # max documents any one source may contribute


def t_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically cap each source's contribution at ``SOURCE_CAP``
    docs: rank within source by md5(doc_id) (a uniform, seedless,
    engine-agnostic shuffle), keep the first CAP.

    Scale shape: ONE window partitioned by source — partition count =
    domain count (millions at web scale, so parallelism is wide), and a
    hot domain's partition holds only that domain's rows. For a domain
    too big for one task, the rank-free equivalent ("keep iff
    md5 < per-source threshold") computes the threshold from a
    per-source count + a quantile of the hash — but the plain window is
    the right default. Output keeps every doc with its rank so the
    downstream filter (keep=true) is a free predicate.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("int").alias("rk"),
    ).withColumn("keep", F.col("rk") <= SOURCE_CAP)


T_SOURCE_CAPS_SQL = f"""
SELECT doc_id, source,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       ) AS INTEGER) AS rk,
       ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       ) <= {SOURCE_CAP} AS keep
FROM documents
""".strip()


# ---------------------------------------------------------------------------
# t_temperature_mix — temperature-scaled source sampling weights (α = 0.5)
# ---------------------------------------------------------------------------


def t_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token share p_s and temperature-scaled sampling weight
    w_s = √n_s / Σ√n (α = 0.5), plus boost = w_s / p_s (the up/down-
    sampling factor a data loader applies).

    The fact-table touch is one tokenize+hash-agg; everything after
    runs on the source dimension. The only order-sensitive float
    reduction (Σ√n_s) folds over sources sorted by name — both engines
    execute the identical IEEE addition sequence.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.withColumn("__n", F.size(tokenize(F.col("text"))))
        .groupBy("source")
        .agg(F.sum("__n").cast("long").alias("n_tokens"))
    )
    totals = counts.agg(
        F.sum("n_tokens").cast("long").alias("t_tok"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "n_tokens"))),
            F.lit(0.0),
            lambda acc, x: acc + F.sqrt(x["n_tokens"].cast("double")),
        ).alias("t_sqrt"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))  # 1-row totals side
        .select(
            "source",
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("t_tok").cast("double")).alias(
                "share"
            ),
            (F.sqrt(F.col("n_tokens").cast("double")) / F.col("t_sqrt")).alias(
                "weight"
            ),
        )
        .withColumn("boost", F.col("weight") / F.col("share"))
    )


from .northstar import TOKS_SQL  # noqa: E402  (shared tokenizer contract)

T_TEMPERATURE_MIX_SQL = f"""
WITH counts AS (
    SELECT source, CAST(SUM(len({TOKS_SQL})) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
totals AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS t_tok,
           list_reduce(
               list_transform(list(n_tokens ORDER BY source, n_tokens),
                              x -> sqrt(CAST(x AS DOUBLE))),
               (a, b) -> a + b
           ) AS t_sqrt
    FROM counts
)
SELECT source, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(t_tok AS DOUBLE) AS share,
       sqrt(CAST(n_tokens AS DOUBLE)) / t_sqrt AS weight,
       (sqrt(CAST(n_tokens AS DOUBLE)) / t_sqrt)
         / (CAST(n_tokens AS DOUBLE) / CAST(t_tok AS DOUBLE)) AS boost
FROM counts CROSS JOIN totals
""".strip()


# ---------------------------------------------------------------------------
# a_chi_square — Pearson χ² independence: event type × weekend
# ---------------------------------------------------------------------------


def a_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row χ² independence test between event_type and
    weekend/weekday — "does the event mix shift on weekends" as a
    statistic instead of an eyeball.

    The cell difference o·N − r·c stays in exact 128-bit integers
    (Spark DECIMAL(38,0) / DuckDB HUGEINT — room for a trillion-row
    table); squaring and dividing run in correctly-rounded double, so
    both engines emit the same bits. The ≤ (types × 2)-term sum folds
    in (event_type, wk) order.

    Plan shape: the fact is scanned ONCE into the partial/final
    contingency hash-agg, then the whole enum-sized table collects into
    one sorted array row and margins/N/dof/χ² are nested higher-order
    folds over that array — zero joins, zero fact re-scans (the naive
    cells→margins→totals join formulation re-scanned the fact 5×:
    derived aggregates over an unmaterialized frame don't hit
    ReuseExchange because each consumer's partial-agg differs).
    """
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("wk"),
        )
        .groupBy("event_type", "wk")
        .agg(F.count("*").cast("long").alias("o"))
    )
    one = cells.agg(
        F.array_sort(F.collect_list(F.struct("event_type", "wk", "o"))).alias("arr")
    )
    arr = F.col("arr")
    long0 = F.lit(0).cast("long")
    n_expr = F.aggregate(arr, long0, lambda a, x: a + x["o"])
    dec = "decimal(38,0)"

    def margin(x, field):
        # row/column total for x's category: an inner fold over the same
        # tiny array (nested lambda — x is captured from the outer scope)
        return F.aggregate(
            arr,
            long0,
            lambda a, y: a
            + F.when(y[field] == x[field], y["o"]).otherwise(long0),
        )

    def term(x):
        num = (
            x["o"].cast(dec) * F.col("n")
            - margin(x, "event_type").cast(dec) * margin(x, "wk")
        ).cast("double")
        return (num * num) / (
            F.col("n").cast("double")
            * margin(x, "event_type").cast("double")
            * margin(x, "wk").cast("double")
        )

    return (
        one.withColumn("n", n_expr)
        .withColumn(
            "dof",
            (
                (F.size(F.array_distinct(F.transform(arr, lambda x: x["event_type"]))) - 1)
                * (F.size(F.array_distinct(F.transform(arr, lambda x: x["wk"]))) - 1)
            ).cast("int"),
        )
        .withColumn("chi2", F.aggregate(arr, F.lit(0.0), lambda a, x: a + term(x)))
        .select("n", "dof", "chi2")
    )


A_CHI_SQUARE_SQL = """
WITH cells AS (
    SELECT event_type,
           CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wk,
           CAST(COUNT(*) AS BIGINT) AS o
    FROM events GROUP BY 1, 2
),
rows_ AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
cols_ AS (SELECT wk, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
terms AS (
    SELECT cells.event_type, cells.wk,
           (CAST(CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c AS DOUBLE)
            * CAST(CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) AS term
    FROM cells
    JOIN rows_ USING (event_type)
    JOIN cols_ USING (wk)
    CROSS JOIN tot
)
SELECT MIN(n) AS n,
       CAST((COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT wk) - 1)
            AS INTEGER) AS dof,
       list_reduce(
           list_transform(list(term ORDER BY event_type, wk), x -> x),
           (a, b) -> a + b
       ) AS chi2
FROM terms CROSS JOIN tot
""".strip()


# ---------------------------------------------------------------------------
# e_ewma_anomaly — EWMA (λ = ½) of daily volume as an exact closed-form cumsum
# ---------------------------------------------------------------------------

EWMA_MAX_STEPS = 100  # 2^101 · Σcount must fit DECIMAL(38); see docstring


def e_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event volume with its λ=½ EWMA and a ratio anomaly flag
    (today's count more than doubles, or falls below half of, the
    smoothed history).

    The recurrence s_t = ½x_t + ½s_{t−1} (s_0 = x_0) is evaluated
    NON-iteratively via the exact closed form
    s_t = (2x_0 + Σ_{k=1..t} x_k·2^k) / 2^{t+1}: the weights are exact
    integer powers of two, the cumulative sum runs in DECIMAL(38,0),
    and the single division by 2^{t+1} is an exact double scaling —
    both engines produce bit-identical doubles, and no sequential UDF
    ever runs. 2^t is materialized as 2^⌊t/2⌋ · 2^(t−⌊t/2⌋): each half
    is ≤ 2^50 and shifts safely inside BIGINT (a single ``shiftleft``
    would silently wrap at t ≥ 63 — Spark reduces the shift distance
    mod 64), and the product is exact in DECIMAL(38,0). Valid while
    2^{t+1}·Σx stays inside DECIMAL(38) — EWMA_MAX_STEPS = 100 daily
    steps with headroom for ~1e7 total events; an in-plan
    ``raise_error`` fires LOUDLY past the cap rather than letting
    decimal overflow degrade to NULLs. Longer horizons re-base the
    exponent per ~quarter chunk and carry the chunk boundary s_t as the
    next chunk's x_0 (the recurrence is associative in that sense).

    The window orders CALENDAR DAYS (one row per day — dimension-sized,
    bounded by the horizon), never raw events; the fact-table touch is
    the one daily hash-agg.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.orderBy("d")
    t = (F.row_number().over(w) - 1).alias("t")
    stepped = daily.select("d", "cnt", t)
    # shiftleft with a COLUMN shift count only exists at the SQL-function
    # layer (the python F.shiftleft wrapper pins numBits to a literal);
    # split the exponent so neither shift can reach the BIGINT wrap at 63
    two_t = (
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(floor(t / 2) AS INT))").cast(
            "decimal(38,0)"
        )
        * F.expr(
            "shiftleft(CAST(1 AS BIGINT), t - CAST(floor(t / 2) AS INT))"
        ).cast("decimal(38,0)")
    )
    overflow_msg = F.concat(
        F.lit(
            "e_ewma_anomaly: horizon step t="
        ),
        F.col("t").cast("string"),
        F.lit(
            f" exceeds EWMA_MAX_STEPS={EWMA_MAX_STEPS}; re-base the exponent"
            " per chunk for longer horizons"
        ),
    )
    y = (
        F.when(F.col("t") > EWMA_MAX_STEPS, F.raise_error(overflow_msg).cast("decimal(38,0)"))
        .when(F.col("t") == 0, F.col("cnt").cast("decimal(38,0)") * 2)
        .otherwise(F.col("cnt").cast("decimal(38,0)") * two_t)
    )
    cum = stepped.withColumn(
        "s", F.sum(y).over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "ewma",
        F.col("s").cast("double") / F.pow(F.lit(2.0), (F.col("t") + 1).cast("double")),
    )
    prev = F.lag("ewma").over(Window.orderBy("d"))
    return cum.select(
        "d",
        "cnt",
        "ewma",
        F.when(
            prev.isNull(), F.lit(False)
        )
        .otherwise(
            (F.col("cnt").cast("double") > 2.0 * prev)
            | (F.col("cnt").cast("double") * 2.0 < prev)
        )
        .alias("anomaly"),
    )


E_EWMA_ANOMALY_SQL = """
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1
),
stepped AS (
    SELECT d, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS INTEGER) AS t
    FROM daily
),
cum AS (
    SELECT d, cnt, t,
           SUM(CASE WHEN t > 100 THEN CAST(error('e_ewma_anomaly: horizon exceeds EWMA_MAX_STEPS=100') AS DECIMAL(38,0))
                    WHEN t = 0 THEN CAST(cnt AS DECIMAL(38,0)) * 2
                    ELSE CAST(cnt AS DECIMAL(38,0))
                         * (CAST((CAST(1 AS BIGINT) << CAST(floor(t / 2) AS INTEGER)) AS DECIMAL(38,0))
                            * CAST((CAST(1 AS BIGINT) << (t - CAST(floor(t / 2) AS INTEGER))) AS DECIMAL(38,0))) END)
             OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS s
    FROM stepped
),
e AS (
    SELECT d, cnt,
           CAST(s AS DOUBLE) / power(2.0, CAST(t + 1 AS DOUBLE)) AS ewma
    FROM cum
)
SELECT d, cnt, ewma,
       CASE WHEN LAG(ewma) OVER (ORDER BY d) IS NULL THEN FALSE
            ELSE (CAST(cnt AS DOUBLE) > 2.0 * LAG(ewma) OVER (ORDER BY d))
                 OR (CAST(cnt AS DOUBLE) * 2.0 < LAG(ewma) OVER (ORDER BY d))
       END AS anomaly
FROM e
""".strip()


# ---------------------------------------------------------------------------
# g_kcore — density cut of the part↔supplier co-purchase graph (rows-only)
# ---------------------------------------------------------------------------

KCORE_K = 25


def g_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes of the 25-core of the bipartite part↔supplier graph from
    lineitem (suppliers offset by 10M, the g_pagerank convention).
    Iterative peeling — not single-statement SQL, so rows-only in the
    gate; brute-force references live in tests/test_round5e.py."""
    from .round5 import part_supplier_edges

    edges = part_supplier_edges(spark, sf_dir)
    return kcore(edges, k=KCORE_K).orderBy("node")
