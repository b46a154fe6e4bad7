"""Training-data curation queries (round 2, batch 2): the operations that
sit between "corpus cleaned" and "tokens on the training cluster".

The reference stops at fetch→normalize→report (its whole data surface is
``/root/reference/dlt_fetch_timecamp.py`` + two DuckDB report docs); none
of these exist there. They are the SURVEY §2.11 north-star extensions a
100 TB text pipeline runs last:

- benchmark decontamination (``t_decontam``) — drop/flag train docs that
  share word n-grams with an eval set (the GPT-3/PaLM 13-gram rule,
  here n=5 to suit the tiny synthetic docs);
- sequence packing (``t_seq_pack``) — concatenate docs in a deterministic
  global order and cut fixed token-budget bins, the step that turns docs
  into fixed-length training sequences;
- mixture weights (``t_mixture_weights``) — temperature-scaled sampling
  weights per language (τ = 0.5 ⇒ ∝ √share — √ chosen deliberately:
  ``sqrt`` is IEEE-exact on both engines while ``pow``/``ln`` are not,
  see ARCHITECTURE.md "cross-engine exactness");
- repetition filters (``t_repetition``) — Gopher-style duplicate-bigram
  and top-bigram fractions, the cheap junk detector;
- shard assignment (``t_shard_assign``) — deterministic global shuffle
  (md5 order) cut into fixed-size output shards.

Scale notes (100 TB shapes):
- decontam: the eval-shingle side is SMALL (benchmarks are MBs) — it is
  built distinct and **broadcast**, so the train corpus is one map-side
  scan + hash probe, no shuffle of the big side;
- packing/sharding: one global sort by a uniform hash key — Spark's
  range-partitioned sort, the same cost class as a shuffle, and the
  canonical way to get a reproducible global order at any size;
- mixture weights: two-level agg (per-lang partial sums combine
  map-side); the per-lang normalization avoids any cross-row double
  fold, so results are bit-stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text
from ..operators.dedup import shingle_rows
from ..operators.order import global_cumsum, global_row_number, md5_prefix_bucket
from .northstar import TOKS_SQL, _shingles_sql
from .testdata import load_table

# ---------------------------------------------------------------------------
# t_decontam — benchmark decontamination via shared word 5-grams
# ---------------------------------------------------------------------------

#: eval-set membership rule: every 97th doc plays the "benchmark" corpus.
_EVAL_MOD = 97


def t_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train docs that share ≥1 word-5-gram with the eval set, with the
    count of distinct colliding grams.

    The eval side (docs where ``doc_id % 97 = 0``) stands in for a held-out
    benchmark; the train side is the full corpus, so the planted eval docs
    flag themselves plus any natural near-dups — a deterministic, non-empty
    answer. Eval shingles are deduped then **broadcast**: at 100 TB the
    benchmark suite is MBs while the corpus is the big side, so the join
    must be a map-side hash probe over the train scan (no shuffle of the
    corpus, verified broadcast in ``tests/test_training.py``).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_sh = (
        shingle_rows(docs.filter(F.col("doc_id") % _EVAL_MOD == 0))
        .select("sh")
        .distinct()
    )
    train_sh = shingle_rows(docs)
    return (
        train_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy(F.col("doc").alias("doc_id"))
        .agg(F.count("*").alias("eval_gram_hits"))
    )


T_DECONTAM_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
ev AS (
    SELECT DISTINCT unnest({_shingles_sql('toks')}) AS sh
    FROM t WHERE doc_id % {_EVAL_MOD} = 0
),
tr AS (SELECT doc_id, unnest({_shingles_sql('toks')}) AS sh FROM t)
SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS eval_gram_hits
FROM tr JOIN ev USING (sh)
GROUP BY tr.doc_id
""".strip()


# ---------------------------------------------------------------------------
# t_seq_pack — greedy sequence packing into fixed token-budget bins
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512  # tokens per training sequence bin


def t_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack docs (in deterministic md5 order) into 512-token bins.

    The concatenate-and-cut packing used for LLM pretraining: lay docs end
    to end in a reproducible shuffled order (md5 of doc_id — uniform, so
    bins are load-balanced regardless of input order or partitioning) and
    assign each doc to the bin its FIRST token lands in. Per bin: how many
    docs start there and their total tokens. The global running token sum
    is the scalable two-level construction (``operators/order.py``):
    md5-prefix range buckets + per-bucket windows + broadcast offsets —
    never a single-partition global window.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", text.token_count(F.col("text")).alias("n_tok")
    )
    key = F.md5(F.col("doc_id").cast("string"))
    packed = global_cumsum(
        docs.withColumn("__k", key),
        F.col("__k"),
        F.col("n_tok"),
        md5_prefix_bucket(F.col("__k")),
        out="cum",
    ).withColumn("bin_id", F.expr(f"(cum - n_tok) div {_PACK_BUDGET}"))
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("bin_tokens")
    )


T_SEQ_PACK_SQL = f"""
WITH d AS (SELECT doc_id, CAST(len({TOKS_SQL}) AS BIGINT) AS n_tok FROM documents),
o AS (
    SELECT doc_id, n_tok,
           CAST(SUM(n_tok) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
    FROM d
),
b AS (SELECT doc_id, n_tok, (cum - n_tok) // {_PACK_BUDGET} AS bin_id FROM o)
SELECT bin_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
FROM b GROUP BY bin_id
""".strip()


# ---------------------------------------------------------------------------
# t_mixture_weights — temperature-scaled language sampling weights
# ---------------------------------------------------------------------------

def t_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats + τ=0.5 sampling weight ∝ √(token share).

    ``weight = sqrt(lang_tokens) / sqrt(total_tokens)`` — algebraically
    √share, but computed WITHOUT summing doubles across languages: both
    operands are exact BIGINT sums cast once, and ``sqrt``/division are
    IEEE-identical on Spark and DuckDB. (A normalized-to-1 weight would
    need a cross-language double fold whose order neither engine pins.)
    Aggregation is a two-level groupBy — partial sums combine map-side, so
    the shuffle carries one row per (partition × lang).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", text.token_count(F.col("text")).alias("n_tok")
    )
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("lang_tokens")
    )
    total = F.sum("lang_tokens").over(Window.partitionBy())
    return per_lang.select(
        "lang",
        "n_docs",
        "lang_tokens",
        (
            F.sqrt(F.col("lang_tokens").cast("double"))
            / F.sqrt(total.cast("double"))
        ).alias("weight"),
    )


T_MIXTURE_WEIGHTS_SQL = f"""
WITH d AS (SELECT lang, CAST(len({TOKS_SQL}) AS BIGINT) AS n_tok FROM documents),
g AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS lang_tokens
    FROM d GROUP BY lang
)
SELECT lang, n_docs, lang_tokens,
       sqrt(CAST(lang_tokens AS DOUBLE))
         / sqrt(CAST(SUM(lang_tokens) OVER () AS DOUBLE)) AS weight
FROM g
""".strip()


# ---------------------------------------------------------------------------
# t_repetition — Gopher-style repetition quality filters
# ---------------------------------------------------------------------------

def t_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram and top-bigram fractions per doc (repetition junk
    detector, cf. Gopher's rep filters).

    ``dup_frac = (bigrams − distinct bigrams) / bigrams`` and
    ``top_frac = max single-bigram count / bigrams`` — both exact BIGINT
    ratios divided once (IEEE-exact either engine). Two-level aggregate:
    per-(doc, bigram) counts first (map-side combinable), then per-doc —
    never a collect of the bigram list. Docs with <2 tokens are excluded
    (no bigrams ⇒ fractions undefined).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.withColumn("toks", text.tokenize(F.col("text")))
    n_bi = F.size("toks") - 1
    idx = F.when(n_bi > 0, F.sequence(F.lit(1), n_bi)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, 2)))
        ).alias("bg"),
    )
    per_bg = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    per_doc = per_bg.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    n = F.col("n_bigrams").cast("double")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        ((F.col("n_bigrams") - F.col("n_distinct")).cast("double") / n).alias(
            "dup_bigram_frac"
        ),
        (F.col("top_c").cast("double") / n).alias("top_bigram_frac"),
        (
            ((F.col("n_bigrams") - F.col("n_distinct")).cast("double") / n > 0.2)
            | (F.col("top_c").cast("double") / n > 0.18)
        ).alias("flagged"),
    )


T_REPETITION_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
bg AS (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                  i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS bg
    FROM t
),
pb AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY doc_id, bg),
pd AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct, MAX(c) AS top_c
    FROM pb GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       CAST(n_bigrams - n_distinct AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
           AS dup_bigram_frac,
       CAST(top_c AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_bigram_frac,
       (CAST(n_bigrams - n_distinct AS DOUBLE) / CAST(n_bigrams AS DOUBLE) > 0.2
        OR CAST(top_c AS DOUBLE) / CAST(n_bigrams AS DOUBLE) > 0.18) AS flagged
FROM pd
""".strip()


# ---------------------------------------------------------------------------
# t_shard_assign — deterministic global shuffle → fixed-size shards
# ---------------------------------------------------------------------------

_SHARD_SIZE = 64  # docs per output shard


def t_shard_assign(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_pin_rows: int = 20_000_000,
) -> DataFrame:
    """Assign every doc a (shard, position) under a reproducible global
    shuffle: order by md5(doc_id), cut every 64 docs.

    This is the writer layout for training shards — the order is
    content-independent and uniform, so shards are size-balanced and the
    assignment is identical on ANY cluster/partitioning (md5 is the only
    source of order). Row numbering uses the distributed two-level
    construction (``operators/order.py``), not a one-partition window.

    Scale shape (round-12 VERDICT item 3): the two-level construction
    needs two passes over the keyed input (per-bucket counts, then the
    bucketed window); unpinned, each pass re-scans parquet, recomputes
    md5, and the window pass pays its exchange + sort. The input here is
    the NARROW (doc_id, md5) projection — ~56 bytes/row — so below a
    footer-measured cap it is pinned ALREADY bucket-partitioned and
    (bucket, key)-sorted: the totals pass materializes the cache (one
    parquet scan + one md5 pass + the single exchange, all in one job)
    and the window pass then runs exchange-free AND sort-free — the
    cached relation advertises its partitioning/ordering and Catalyst
    accepts them through the offsets join (verified in the physical
    plan: Window directly over BroadcastHashJoin over
    InMemoryTableScan). Past the cap (~1 GB pinned at 20M docs; a
    10^10-doc corpus would be ~600 GB) the rescan shape ships unchanged
    — at that scale a columnar re-scan is cheaper and safer than
    caching (the operators/order.py contract)."""
    from pyspark.storagelevel import StorageLevel

    from .round5d import _file_size_row_bound

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    key = F.md5(F.col("doc_id").cast("string"))
    keyed = docs.withColumn("__k", key)
    bucket = md5_prefix_bucket(F.col("__k"))
    bound = _file_size_row_bound(sf_dir, "documents")
    if bound is not None and bound <= max_pin_rows:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # SESSION-LIFETIME pin, deliberately never unpersisted here
        # (round-13 ADVICE): the cached relation must stay alive for the
        # returned (lazy) DataFrame, so this function cannot own its
        # unpersist. Repeat calls on the same sf_dir dedup via Spark's
        # CacheManager (identical analyzed plan -> same cache entry);
        # long sessions that mix MANY sf_dirs accumulate one ~56 B/row
        # pinned projection per dir until the caller clears it
        # (bench.py clearCaches between entries; pytest sessions stay
        # within two small dirs).
        keyed = (
            keyed.withColumn("__bp", bucket)
            .repartition(n_parts, "__bp")
            .sortWithinPartitions("__bp", "__k")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        bucket = F.col("__bp")
    numbered = global_row_number(
        keyed,
        F.col("__k"),
        bucket,
        out="rn",
    ).withColumn("__rn", (F.col("rn") - 1).cast("bigint"))
    return numbered.select(
        "doc_id",
        F.expr(f"__rn div {_SHARD_SIZE}").alias("shard"),
        (F.col("__rn") % _SHARD_SIZE).alias("pos"),
    )


T_SHARD_ASSIGN_SQL = f"""
WITH o AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1
                AS BIGINT) AS rn
    FROM documents
)
SELECT doc_id, rn // {_SHARD_SIZE} AS shard, rn % {_SHARD_SIZE} AS pos FROM o
""".strip()


# ---------------------------------------------------------------------------
# s_quantize_int8 — per-vector int8 scalar quantization of embeddings
# ---------------------------------------------------------------------------

def s_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column (per-vector
    min/max scaling to codes 0..255) with reconstruction-error stats —
    the compression step an embedding store runs before ANN serving
    (4× smaller than float32, distance error bounded by span/255).

    Implemented codegen-only: array_min/max before a ``posexplode``, the
    quantize/dequantize arithmetic per exploded cell, one hash-agg back
    to vec_id (int-sum checksum + double max — both order-independent,
    so bit-exact vs DuckDB; an array-HOF formulation would run
    interpreted AND re-evaluate per reference). Scale: explode is a
    map-side row multiply (×dim) feeding a combinable agg — no state
    beyond the shuffle on vec_id.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cells = emb.select(
        "vec_id",
        F.array_min("v").alias("lo"),
        F.array_max("v").alias("hi"),
        F.posexplode("v").alias("dim", "x"),
    )
    span = F.col("hi") - F.col("lo")
    code = F.when(
        span > 0,
        F.least(F.floor(((F.col("x") - F.col("lo")) / span) * 255), F.lit(255)),
    ).otherwise(F.lit(0)).cast("int")
    with_code = cells.withColumn("code", code).withColumn(
        "err",
        F.abs(
            F.col("x")
            - (F.col("lo") + (F.col("code").cast("double") * span) / F.lit(255.0))
        ),
    )
    return with_code.groupBy("vec_id").agg(
        F.sum("code").cast("bigint").alias("code_sum"),
        F.max("err").alias("max_err"),
    )


S_QUANTIZE_INT8_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
m AS (SELECT vec_id, list_min(v) AS lo, list_max(v) AS hi, unnest(v) AS x FROM e),
c AS (
    SELECT vec_id, x, lo, hi, hi - lo AS span,
           CASE WHEN hi - lo > 0
                THEN CAST(least(floor(((x - lo) / (hi - lo)) * 255), 255) AS INTEGER)
                ELSE 0 END AS code
    FROM m
)
SELECT vec_id,
       CAST(SUM(code) AS BIGINT) AS code_sum,
       MAX(abs(x - (lo + (CAST(code AS DOUBLE) * span) / 255.0))) AS max_err
FROM c GROUP BY vec_id
""".strip()


# ---------------------------------------------------------------------------
# t_chunking — overlapping fixed-size chunks with offsets (RAG prep)
# ---------------------------------------------------------------------------

_CHUNK = 100  # tokens per chunk
_STRIDE = 80  # 20-token overlap between consecutive chunks


def t_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every doc into 100-token chunks on an 80-token stride
    (20-token overlap) with 1-based start offsets — the chunking pass a
    RAG / embedding pipeline runs before vectorization.

    Chunk starts come from ``sequence(1, n, stride)`` so chunk_idx is a
    closed form ``(start-1) div stride`` (no per-doc ordinality needed);
    the trailing chunk is the natural truncation. Map-only: the explode
    multiplies rows by ~n/stride with no shuffle; chunk identity is the
    md5 of the joined tokens, chunk length a min() — nothing re-tokenizes
    the chunk text.
    """
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", text.tokenize(F.col("text"))
    )
    n = F.size("toks")
    starts = F.when(n > 0, F.sequence(F.lit(1), n, F.lit(_STRIDE))).otherwise(
        F.array().cast("array<int>")
    )
    return (
        docs.select("doc_id", "toks", n.alias("n"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.expr(f"cast((s - 1) div {_STRIDE} as bigint)").alias("chunk_idx"),
            F.col("s").cast("bigint").alias("chunk_start"),
            F.least(F.lit(_CHUNK), F.col("n") - F.col("s") + 1)
            .cast("bigint")
            .alias("n_chunk_toks"),
            F.md5(F.concat_ws(" ", F.slice("toks", F.col("s"), _CHUNK))).alias(
                "chunk_md5"
            ),
        )
    )


T_CHUNKING_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
c AS (
    SELECT doc_id, toks, len(toks) AS n,
           unnest(CASE WHEN len(toks) > 0
                       THEN range(1, len(toks) + 1, {_STRIDE})
                       ELSE [] END) AS s
    FROM t
)
SELECT doc_id,
       CAST((s - 1) // {_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(s AS BIGINT) AS chunk_start,
       CAST(least({_CHUNK}, n - s + 1) AS BIGINT) AS n_chunk_toks,
       md5(array_to_string(list_slice(toks, s, s + {_CHUNK} - 1), ' ')) AS chunk_md5
FROM c
""".strip()
