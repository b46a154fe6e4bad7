"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.11).

All built from JVM-side column expressions (split/filter/transform/aggregate
— no Python UDFs in the hot path), so they whole-stage-codegen and scale
linearly with input: tokenization, token stats, quality scoring, language
ID (stopword heuristic), document fingerprints, and a 64-bit SimHash
signature.

Cross-engine portability: every hash used in an oracle-checked query is
``md5`` (identical in Spark and DuckDB); SimHash bit extraction uses only
``instr``/``substr``/``%`` so the same SQL text runs on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(text: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(F.trim(_c(text)), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokenize(text))


#: tiny embedded stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "es"),
    "de": ("der", "die", "das", "und", "zu", "in", "ist", "ein"),
}


def stopword_ratio(tokens: Column, words: tuple[str, ...]) -> Column:
    """Fraction of tokens that are in ``words`` (0.0 for empty docs)."""
    hits = F.size(F.filter(tokens, lambda t: t.isin(*words)))
    n = F.size(tokens)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def lang_id(text: Column | str, toks: Column | None = None) -> Column:
    """Best-scoring language by stopword ratio; 'und' when nothing hits.

    Ties break by language-code order (deterministic, documented).

    ``toks`` reuses an already-materialized token array: the expression
    otherwise re-tokenizes per stopword list, and below the codegen
    cutoff (no whole-stage subexpression elimination) each copy is
    evaluated — pass the projected column when the plan also computes
    quality/token counts (measured 2.0 → 1.1 s on t_corpus_prep at
    sf0.1)."""
    if toks is None:
        toks = tokenize(text)
    scores = [(lang, stopword_ratio(toks, words)) for lang, words in sorted(STOPWORDS.items())]
    best = F.lit("und")
    best_score = F.lit(0.0)
    # fold left, strict > keeps the earlier (alphabetically first) language on tie
    for lang, score in scores:
        take = score > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, score).otherwise(best_score)
    return best


def quality_score(text: Column | str, toks: Column | None = None) -> Column:
    """Deterministic [0,1] doc-quality heuristic: length band + alpha ratio
    + English-stopword presence (the reference has nothing comparable; this
    is the SURVEY §2.11 north-star op). ``toks`` as in ``lang_id``."""
    t = _c(text)
    if toks is None:
        toks = tokenize(t)
    n_toks = F.size(toks)
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z ]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha.cast("double") / n_chars).otherwise(F.lit(0.0))
    len_band = F.when((n_toks >= 20) & (n_toks <= 1000), F.lit(1.0)).otherwise(
        F.when(n_toks > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    stop = stopword_ratio(toks, STOPWORDS["en"])
    stop_band = F.when(stop > 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    return 0.4 * len_band + 0.4 * alpha_ratio + 0.2 * stop_band


def content_fingerprint(text: Column | str) -> Column:
    """Exact-content fingerprint: md5 of whitespace-normalized text."""
    return F.md5(F.concat_ws(" ", tokenize(text)))


def key_fingerprint(text: Column | str) -> Column:
    """Key-collision fingerprint (OpenRefine style): md5 of the sorted
    distinct token set — catches re-ordered near-identical docs."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokenize(text)))))


# ---------------------------------------------------------------------------
# SimHash — 64-bit signature, portable SQL construction
#
# Two bit-extraction paths with identical output (oracle-verified):
# the portable instr/substr CASE text (runs unchanged in DuckDB), and a
# fast engine path that parses each md5 half once with conv() and then
# shift/masks — 3× faster than 64 string scans per token row.
# ---------------------------------------------------------------------------


def md5_half_longs(hash_col: Column | str) -> tuple[Column, Column]:
    """The first 16 hex chars of an md5 as two 32-bit longs (chars 1-8,
    9-16); input to `simhash_bit_col`."""
    h = _c(hash_col)
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long"),
    )


def simhash_bit_col(v1: Column, v2: Column, j: int) -> Column:
    """±1 contribution of bit ``j`` — same bit order as `simhash_bit_sql`
    (hex chars left→right, LSB-first within each nibble)."""
    i = j // 4  # 0-based hex char index
    half, ii = (v1, i) if i < 8 else (v2, i - 8)
    shift = (7 - ii) * 4 + (j % 4)
    return F.shiftright(half, shift).bitwiseAND(F.lit(1)) * 2 - 1

def simhash_bit_sql(hash_col: str, j: int) -> str:
    """Portable SQL for bit ``j`` (0-based, LSB-of-first-nibble order) of a
    32-hex-char md5 in ``hash_col``: ±1 contribution for SimHash summing.

    Uses only substr/instr/% so the identical text runs in Spark SQL and
    DuckDB (no engine-specific bit ops)."""
    i = j // 4 + 1          # 1-based hex char index
    k = j % 4               # bit within nibble
    nib = f"(instr('0123456789abcdef', substr({hash_col}, {i}, 1)) - 1)"
    bit = f"(CASE WHEN ({nib} % {2 ** (k + 1)}) >= {2 ** k} THEN 1 ELSE -1 END)"
    return bit


def simhash_agg_exprs(hash_col: str = "tok_hash", n_bits: int = 64) -> list[str]:
    """SUM expressions (one per bit) to aggregate per document."""
    return [
        f"SUM({simhash_bit_sql(hash_col, j)}) AS bit_{j}" for j in range(n_bits)
    ]


# Unresolved-Column cache: one bit-sum Column list per (v1, v2, n_bits).
# Fresh construction is ~6 Py4J round-trips × n_bits (~0.9 s of driver
# time per simhash plan); Columns are plan-free and safe to reuse.
_SIMHASH_AGG_COLS: dict[tuple, list] = {}


def simhash_agg_cols_weighted(
    v1_col: str = "_v1",
    v2_col: str = "_v2",
    cnt_col: str = "_cnt",
    n_bits: int = 64,
) -> list[Column]:
    """Term-frequency-weighted Column twins of `simhash_agg_exprs`: over
    distinct (doc, token, cnt) rows, SUM(cnt × (±1 bit)) equals SUM(±1
    bit) over raw token instances exactly (integer arithmetic), so signatures are
    bit-identical while md5/conv/bit extraction run once per DISTINCT
    token per doc instead of once per instance (guide §2.3 — aggregate
    before you shuffle; the (doc, tok) partial count collapses repeats
    map-side)."""
    key = (v1_col, v2_col, cnt_col, n_bits)
    cols = _SIMHASH_AGG_COLS.get(key)
    if cols is None:
        v1, v2, cnt = F.col(v1_col), F.col(v2_col), F.col(cnt_col)
        cols = [
            F.sum(simhash_bit_col(v1, v2, j) * cnt).alias(f"bit_{j}")
            for j in range(n_bits)
        ]
        _SIMHASH_AGG_COLS[key] = cols
    return cols


def simhash_bits_concat_sql(n_bits: int = 64) -> str:
    """Final signature: '1' where the summed weight is positive."""
    cases = [f"CASE WHEN bit_{j} > 0 THEN '1' ELSE '0' END" for j in range(n_bits)]
    return " || ".join(cases)


def hamming_distance_bits(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two equal-length '0'/'1' signatures."""
    pairs = F.zip_with(
        F.split(_c(a), ""), F.split(_c(b), ""), lambda x, y: (x != y).cast("int")
    )
    return F.aggregate(pairs, F.lit(0), lambda acc, x: acc + x)
