"""N-gram language-model perplexity filtering — the CCNet quality stage
(Wenzek et al. 2020 use a KenLM 5-gram; the filtering recipe is identical):
fit token n-gram counts on a trusted reference corpus, score candidate
documents by per-token surprisal under the model, and gate on the score
(low-perplexity ≈ fluent prose, high ≈ gibberish/boilerplate/wrong
language).

Two scoring variants share one fitted count model:

- ``ngram_lm_score`` — float average log2 probability + perplexity
  (Laplace-smoothed), the ranking you'd use in production;
- ``ngram_lm_surprisal`` — an integer-exact quantization (whole-bit
  surprisal via floor-log2 = ``length(bin(x)) - 1``) with identical
  monotonic structure, which a SQL oracle replays hash-exactly (floats
  summed across engines drift in the last ulp; bit-lengths of identical
  integers cannot — the calibration_alpha_sweep lesson).

Shape at scale: the model is (context, token, count) — fit is one explode
+ one groupBy over the REFERENCE corpus (small by definition: CCNet fits
on Wikipedia, scores Common Crawl). Scoring explodes candidates to
(context, token) rows and equi-joins the model twice (pair counts, then
context totals); both joins broadcast when the model is small and shuffle
on the context hash otherwise — never a cross join, never Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BOS = "<s>"


def _token_arrays(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # materialized as its own projection: an array captured in later
    # higher-order lambdas would otherwise re-split per element (the
    # winnow O(len²) lesson, see memory of round 3)
    return docs.select(
        id_col,
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda w: w != F.lit(""),
        ).alias("__toks"),
    ).where(F.size("__toks") > 0)


def _context_token_rows(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, context, token) rows: context = the (n−1) previous tokens
    joined by spaces, left-padded with BOS markers. Built by zipping the
    token array against its own shifted copies — in-JVM, no self-join."""
    toks = _token_arrays(docs, text_col, id_col)
    padded = toks.select(
        id_col,
        F.concat(
            F.array(*[F.lit(BOS) for _ in range(n - 1)]), F.col("__toks")
        ).alias("__p"),
        F.size("__toks").alias("__len"),
    )
    # token i (0-based in the original array) sits at padded[i + n - 1];
    # its context is padded[i .. i + n - 2]
    return padded.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("__len") - 1),
                lambda i: F.struct(
                    F.array_join(
                        F.slice(F.col("__p"), i + 1, n - 1), " "
                    ).alias("context"),
                    F.element_at(F.col("__p"), i + n).alias("token"),
                ),
            )
        ).alias("pos", "ct"),
    ).select(id_col, "pos", F.col("ct.context").alias("context"),
             F.col("ct.token").alias("token"))


def ngram_lm_fit(
    ref_docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(context, token, c) counts over the reference corpus — the whole
    model state, persistable as parquet and reusable across scoring runs
    (fit on the trusted corpus ONCE, score every crawl snapshot)."""
    if n < 2:
        raise ValueError("ngram_lm_fit needs n >= 2")
    rows = _context_token_rows(ref_docs, n, text_col, id_col)
    return rows.groupBy("context", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def _scored_tokens(docs, model, n, text_col, id_col):
    rows = _context_token_rows(docs, n, text_col, id_col)
    ctx_totals = model.groupBy("context").agg(F.sum("c").alias("ctx_c"))
    return (
        rows.join(model, ["context", "token"], "left")
        .join(ctx_totals, "context", "left")
        .select(
            id_col,
            F.coalesce("c", F.lit(0)).alias("c"),
            F.coalesce("ctx_c", F.lit(0)).alias("ctx_c"),
        )
    )


def ngram_lm_score(
    docs: DataFrame,
    model: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, avg_logprob, perplexity) — Laplace-smoothed
    p(tok|ctx) = (c+1)/(ctx_c+V), avg log2 over the doc's tokens,
    perplexity = 2^(−avg). Floats: use for ranking/gating in production;
    the oracle-exact twin is ngram_lm_surprisal."""
    v = model.select("token").distinct().count()
    scored = _scored_tokens(docs, model, n, text_col, id_col)
    logp = F.log2((F.col("c") + 1).cast("double") / (F.col("ctx_c") + v))
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.avg(logp).alias("avg_logprob"),
    )
    return out.withColumn("perplexity", F.pow(F.lit(2.0), -F.col("avg_logprob")))


def ngram_lm_surprisal(
    docs: DataFrame,
    model: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, surprisal_bits) — integer-exact whole-bit surprisal:
    per token, floor_log2(ctx_c + V) − floor_log2(c + 1), summed. Same
    Laplace structure as ngram_lm_score quantized to integer bits
    (floor_log2(x) = length-of-binary-string − 1, exact in any engine);
    monotone enough for gating and bit-identical cross-engine."""
    v = model.select("token").distinct().count()
    scored = _scored_tokens(docs, model, n, text_col, id_col)

    def flog2(c):
        return (F.length(F.bin(c)) - 1).cast("long")

    bits = flog2(F.col("ctx_c") + v) - flog2(F.col("c") + 1)
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(bits).cast("long").alias("surprisal_bits"),
    )


def ngram_lm_filter(
    docs: DataFrame,
    model: DataFrame,
    max_avg_bits: float,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``docs`` with documents whose average whole-bit surprisal exceeds
    ``max_avg_bits`` removed (the CCNet "head/middle" gate, integer
    arithmetic: sum_bits·1000 ≤ thr_milli·n_tokens, exact at 0.001
    resolution). Schema-preserving left-semi join."""
    thr_milli = int(round(max_avg_bits * 1000))
    scores = ngram_lm_surprisal(docs, model, n, text_col, id_col)
    keep = scores.where(
        F.col("surprisal_bits") * 1000 <= F.lit(thr_milli) * F.col("n_tokens")
    ).select(F.col(id_col))
    return docs.join(keep, id_col, "left_semi")


def perplexity_buckets(
    docs: DataFrame,
    model: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet head/middle/tail assignment (Wenzek et al. 2020 §4.3): rank
    every document by per-token surprisal against the reference LM and
    cut the corpus into thirds — 'head' is the most-reference-like
    third. Everything stays integer: the score is milli-bits per token
    (surprisal_bits·1000 div n_tokens), the rank is the distributed
    global_rank over (score, id) — a total order, so the assignment is
    deterministic and engine-portable — and the tertile test is
    3·rank < n vs 3·rank < 2n, no percentile interpolation anywhere.

    Returns (id, n_tokens, surprisal_bits, milli_bits_per_tok, bucket)."""
    from nama_spark.operators.block import global_rank

    scores = ngram_lm_surprisal(docs, model, n, text_col, id_col).select(
        F.col(id_col),
        "n_tokens",
        "surprisal_bits",
        F.expr("surprisal_bits * 1000 div n_tokens").alias(
            "milli_bits_per_tok"
        ),
    )
    ranked = global_rank(scores, ["milli_bits_per_tok", id_col])
    n_docs = ranked.count()
    return ranked.select(
        id_col,
        "n_tokens",
        "surprisal_bits",
        "milli_bits_per_tok",
        F.when(F.col("rank") * 3 < F.lit(n_docs), F.lit("head"))
        .when(F.col("rank") * 3 < F.lit(2 * n_docs), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
