"""Corpus-quality operators for training-data pipelines: Gopher-style
repetition metrics and benchmark decontamination.

These are DataFrame-level operators (the per-row scalar heuristics live
in functions/text_quality.py): repetition needs a per-doc n-gram
frequency table, decontamination a join against the benchmark n-gram
set.  Everything stays JVM-side (tokenize → transform/slice n-grams →
explode → groupBy) with pinned, ANSI-SQL-expressible semantics so the
DuckDB oracle replicates them exactly.

Reference analog: the derived-quality-field layer the reference attaches
before export (seqr_mt_schema.py @row_annotation fields) — these are the
web-text equivalents used to filter a crawl before training.

Scale posture: the n-gram explode shuffles (doc_id, gram) pairs —
O(tokens) rows, the same order as the index build's posting explode; the
aggregation is a map-side-combinable count.  Decontamination broadcasts
the BENCHMARK side (eval sets are tiny next to a crawl) so the scan
stays shuffle-free in ``hashed=True`` mode the join key is an 8-byte
xxhash64, never the gram string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_col


def _gram_col(text_col: str, n: int):
    """array<string> of space-joined token n-grams (empty when the doc
    has fewer than n tokens — guarded: F.sequence would otherwise
    descend)."""
    toks = tokenize_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition metrics per document over token n-grams:

    * ``n_grams`` — total n-gram occurrences (tokens − n + 1, floored
      at 0),
    * ``dup_gram_frac`` — fraction of n-gram occurrences belonging to a
      gram that occurs more than once in the doc (the Gopher
      "duplicate n-gram fraction" filter),
    * ``top_gram_frac`` — occurrences of the doc's most frequent n-gram
      over all occurrences (the "top n-gram fraction" filter).

    Docs with fewer than n tokens keep a row with 0 / 0.0 / 0.0.  The
    explode is O(tokens) and the two fractions come from one
    map-side-combinable count per (doc, gram)."""
    if n <= 0:
        raise ValueError("n-gram order must be a positive int")
    # NB: no spread_small_scan here — bigram counting is light enough
    # that the repartition's first-call cost exceeded the win (measured
    # 0.20 s 1-task vs 0.33 s spread at sf1.0); gopher_filter spreads
    # its input once and passes it through, so the heavy composite
    # still parallelizes.
    ids = df.select(F.col(id_col).alias("doc_id"))
    counts = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_gram_col(text_col, n)).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "dup_cnt"
        ),
    )
    return (
        ids.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(
                F.col("dup_cnt") / F.col("n_grams"), F.lit(0.0)
            ).alias("dup_gram_frac"),
            F.coalesce(
                F.col("top_cnt") / F.col("n_grams"), F.lit(0.0)
            ).alias("top_gram_frac"),
        )
    )


def duplicate_line_fraction(col) -> "F.Column":
    """Gopher duplicate-line fraction as a scalar column: fraction of
    non-empty (trimmed) lines that are repeats of an earlier-seen line
    — 1 − distinct/total, 0.0 for line-less text.  Pure JVM higher-order
    functions; SQL-expressible."""
    c = F.col(col) if isinstance(col, str) else col
    # NB: lambda, not bare F.trim — trim's optional second param makes
    # transform pass the element INDEX as the trim-character set
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    total = F.size(lines)
    distinct = F.size(F.array_distinct(lines))
    return F.when(
        total > 0, F.lit(1.0) - distinct / total
    ).otherwise(F.lit(0.0))


def ngram_overlap(
    docs_df: DataFrame,
    bench_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """Benchmark decontamination — the training-data hygiene staple:
    for every document, the overlap between its DISTINCT token n-grams
    and the benchmark corpus's n-gram set (the canonical n=13 "dirty
    document" test).  Returns (doc_id, n_grams, n_overlap,
    overlap_frac); docs shorter than n tokens report 0 / 0 / 0.0.

    The benchmark side is collapsed to distinct grams and BROADCAST
    (eval suites are MBs against a 100-TB crawl), so the corpus scan
    never shuffles gram strings for the membership test.
    ``hashed=True`` joins on ``xxhash64(gram)`` — an 8-byte key instead
    of the ~100-byte gram — for the at-scale path; exact-string mode is
    the oracle-checkable default (hash collisions are ~n_grams²/2⁶⁴;
    the pytest asserts both modes agree on the test corpus)."""
    if n <= 0:
        raise ValueError("n-gram order must be a positive int")
    from ..sources.readers import spread_small_scan

    # distinct INSIDE the row (array_distinct on the gram strings — so
    # n_grams counts distinct STRINGS in both modes), then in hashed
    # mode the 8-byte xxhash64 replaces each ~100-byte gram BEFORE the
    # explode: the generator, the broadcast probe and the aggregation
    # all handle longs instead of strings.  transform preserves element
    # count, so n_grams/n_overlap are identical to hashing after the
    # explode (the r6 shape).
    def keyed_grams(text: str):
        garr = F.array_distinct(_gram_col(text, n))
        return F.transform(garr, lambda g: F.xxhash64(g)) if hashed else garr

    # ONE pass over the corpus: r6 computed the tokenize→13-gram→
    # distinct chain twice (once for the overlap branch, once for the
    # n_grams branch) and joined the halves by doc_id; here n_grams is
    # recovered as count(g) in the same aggregation that counts the
    # benchmark hits — no second gram build, no doc_id join.
    dg = spread_small_scan(docs_df).select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(keyed_grams(text_col)).alias("g"),
    )
    bench_grams = (
        spread_small_scan(bench_df)
        .select(F.explode(keyed_grams(bench_text_col)).alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        dg.join(F.broadcast(bench_grams), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("g").alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias(
                "n_overlap"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_overlap",
            F.when(
                F.col("n_grams") > 0, F.col("n_overlap") / F.col("n_grams")
            ).otherwise(F.lit(0.0)).alias("overlap_frac"),
        )
    )


# ---------------------------------------------------------------------------
# composite Gopher-style quality filter
# ---------------------------------------------------------------------------

GOPHER_DEFAULTS = {
    "min_tokens": 50,
    "max_tokens": 100_000,
    "min_mean_token_len": 3.0,
    "max_mean_token_len": 10.0,
    "min_alnum_ratio": 0.6,
    "min_distinct_stopwords": 2,
    "max_dup_line_frac": 0.30,
    "max_dup_gram_frac": 0.20,
    "max_top_gram_frac": 0.18,
    "gram_n": 2,
}

# rule evaluation order is pinned — the reasons column lists failures
# in this order, comma-joined, so output is deterministic and
# SQL-replicable
GOPHER_RULES = (
    "too_few_tokens",
    "too_many_tokens",
    "mean_token_len_low",
    "mean_token_len_high",
    "too_symbolic",
    "too_few_stopwords",
    "dup_lines",
    "dup_ngrams",
    "top_ngram_dominates",
)


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """Composite Gopher-style document quality filter — the standard
    pre-training keep/reject gate, with per-doc explanations:
    DataFrame(doc_id, keep, n_failed, reasons) where ``reasons`` is the
    comma-joined pinned-order list of failed rules (empty string =
    clean).  Rules (thresholds overridable per call, defaults in
    GOPHER_DEFAULTS):

      too_few_tokens / too_many_tokens     token-count bounds
      mean_token_len_low / _high           word-shape bounds
      too_symbolic                         alnum-char ratio floor
      too_few_stopwords                    ≥ N distinct stopwords
      dup_lines                            duplicate-line fraction cap
      dup_ngrams / top_ngram_dominates     repetition caps (gram_n)

    Everything except the repetition pair is a pure column expression;
    the repetition metrics join in from repetition_stats (one n-gram
    count pass) — so the whole filter is one scan + one
    map-side-combinable aggregation, no Python in the plan."""
    from ..functions import text_quality as tq
    from ..functions.tokenize import tokenize_col
    from ..sources.readers import spread_small_scan

    df = spread_small_scan(df)
    cfg = {**GOPHER_DEFAULTS, **thresholds}
    unknown = set(thresholds) - set(GOPHER_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown gopher_filter thresholds: {sorted(unknown)}")
    toks = tokenize_col(text_col)
    n = F.size(toks)
    mtl = tq.mean_token_len(text_col)
    sw_distinct = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in tq.EN_STOPWORDS]),
        )
    )
    rep = repetition_stats(df, text_col, id_col, n=int(cfg["gram_n"]))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("_n"),
        mtl.alias("_mtl"),
        tq.alnum_ratio(text_col).alias("_alnum"),
        sw_distinct.alias("_sw"),
        duplicate_line_fraction(text_col).alias("_dlf"),
    ).join(rep, "doc_id")
    fails = {
        "too_few_tokens": F.col("_n") < int(cfg["min_tokens"]),
        "too_many_tokens": F.col("_n") > int(cfg["max_tokens"]),
        "mean_token_len_low": F.col("_mtl") < float(cfg["min_mean_token_len"]),
        "mean_token_len_high": F.col("_mtl") > float(cfg["max_mean_token_len"]),
        "too_symbolic": F.col("_alnum") < float(cfg["min_alnum_ratio"]),
        "too_few_stopwords": F.col("_sw") < int(cfg["min_distinct_stopwords"]),
        "dup_lines": F.col("_dlf") > float(cfg["max_dup_line_frac"]),
        "dup_ngrams": F.col("dup_gram_frac") > float(cfg["max_dup_gram_frac"]),
        "top_ngram_dominates": F.col("top_gram_frac")
        > float(cfg["max_top_gram_frac"]),
    }
    reasons = F.concat_ws(
        ",",
        F.filter(
            F.array(
                *[
                    F.when(fails[r], F.lit(r)).otherwise(F.lit(None))
                    for r in GOPHER_RULES
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    n_failed = sum(
        (F.when(fails[r], 1).otherwise(0) for r in GOPHER_RULES), F.lit(0)
    )
    return base.select(
        "doc_id",
        (n_failed == 0).alias("keep"),
        n_failed.cast("long").alias("n_failed"),
        reasons.alias("reasons"),
    )
