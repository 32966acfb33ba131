"""Text-analysis column functions for training-data pipelines — language-ID,
quality scoring, token counting, document fingerprinting. All pure Column
expressions (JVM-side), DuckDB-oracle-checkable."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from nama_spark.functions.normalize import ENGLISH_STOPWORDS

# tiny per-language marker sets for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "it", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "por", "que", "con"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _words(c: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda w: w != F.lit(""))


def token_count(c: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(_words(_col(c)))


def word_token_count(c: Column | str) -> Column:
    """BPE-ish sub-token estimate: words + extra tokens for long words
    (a word of length L counts ceil(L/4) tokens) — a cheap, deterministic
    proxy for tokenizer budgeting."""
    return F.aggregate(
        _words(_col(c)),
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )


def stopword_ratio(c: Column | str, stopwords: list[str] | None = None) -> Column:
    # single array Literal — see normalize.remove_stopwords (round 6):
    # CreateArray(179 lit children) cost ~1.7 s build+compile per use
    sw = F.lit(list(stopwords or ENGLISH_STOPWORDS))
    ws = _words(_col(c))
    n = F.size(ws)
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))


def punct_ratio(c: Column | str) -> Column:
    s = _col(c)
    n = F.length(s)
    n_punct = n - F.length(F.regexp_replace(s, r"[^\w\s]", ""))
    return F.when(n > 0, n_punct / n).otherwise(F.lit(0.0))


def mean_word_length(c: Column | str) -> Column:
    ws = _words(_col(c))
    return F.when(
        F.size(ws) > 0,
        F.aggregate(ws, F.lit(0), lambda a, w: a + F.length(w)) / F.size(ws),
    ).otherwise(F.lit(0.0))


def quality_score(c: Column | str) -> Column:
    """[0,1] document-quality heuristic from length / punctuation / stopword
    signals (Gopher/C4-style rule-of-thumb filters, expressed as one expr):
    0.4·len_ok + 0.3·stopword_ok + 0.3·punct_ok."""
    col = _col(c)
    n_tok = token_count(col)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(
        F.when(n_tok > 0, 0.5).otherwise(0.0)
    )
    sw = stopword_ratio(col)
    sw_ok = F.when((sw >= 0.05) & (sw <= 0.7), 1.0).otherwise(0.0)
    p = punct_ratio(col)
    p_ok = F.when(p <= 0.2, 1.0).otherwise(F.when(p <= 0.4, 0.5).otherwise(0.0))
    score = F.round(0.4 * len_ok + 0.3 * sw_ok + 0.3 * p_ok, 6)
    return F.when(n_tok > 0, score).otherwise(F.lit(0.0))


def lang_id(c: Column | str) -> Column:
    """Marker-stopword language ID: argmax language by marker hit-count over
    whitespace tokens; 'und' (undetermined) when nothing matches."""
    ws = _words(_col(c))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.lit(list(markers))
        # single-arg lambda (a second arg would be treated as the index);
        # F.filter evaluates it eagerly, so the closure is safe in this loop
        n = F.size(F.filter(ws, lambda w: F.array_contains(marker_arr, w)))
        scores.append((lang, n))
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, n in scores:
        cond = n > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, n).otherwise(best_n)
    return best


def fingerprint(c: Column | str) -> Column:
    """Normalized-content fingerprint: md5 of lowercase, whitespace-collapsed
    text — stable across engines (docs with the same normalized content get
    the same fingerprint)."""
    norm = F.regexp_replace(F.lower(F.trim(_col(c))), r"\s+", " ")
    return F.md5(norm)


def doc_keywords(
    df,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, keyword, tfidf, rank) — top-k TF-IDF keywords per document
    (corpus profiling / index summarization). tf = in-doc term count,
    idf = ln(N / df) over distinct-doc frequency; ties break on the word
    ascending so the ranking is total and engine-portable. Two shuffles:
    token explode → (doc, word) counts + df agg, then one window per doc."""
    from pyspark.sql import DataFrame, Window

    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_words(F.col(text_col))).alias("word"),
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # 1-row corpus total rides in as a broadcast crossJoin so the whole
    # operator stays lazy (no job at plan-construction time)
    n = df.agg(F.countDistinct(id_col).alias("__n_docs"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("word").asc()
    )
    return (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("__n_docs").cast("double") / F.col("df")),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", F.col("word").alias("keyword"), "tfidf", "rank")
    )


def chunk_documents(
    df,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, chunk_seq, chunk_text, n_tokens) — fixed-size token windows
    with overlap (training-example preparation: context windows stride by
    chunk_tokens − overlap so no boundary content is lost). Whitespace
    tokens; the final chunk may be short; an empty document yields one
    empty chunk (row-count preserving for auditability).

    The token array is materialized as its own projection before the
    windowing transform — the split() would otherwise re-evaluate at every
    chunk start (higher-order-lambda subexpression hazard, see
    dedup.word_shingles)."""
    from pyspark.sql import functions as F

    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tokenized = df.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
    t = F.col("__toks")
    n = F.size(t)
    starts = F.when(
        n > chunk_tokens,
        F.sequence(F.lit(0), n - F.lit(overlap) - F.lit(1), F.lit(step)),
    ).otherwise(F.array(F.lit(0)))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / F.lit(step)).cast("long").alias("chunk_seq"),
            F.array_join(F.slice(t, s + 1, chunk_tokens), " ").alias("chunk_text"),
            F.least(n - s, F.lit(chunk_tokens)).cast("long").alias("n_tokens"),
        ),
    )
    return tokenized.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id",
        F.col("c.chunk_seq").alias("chunk_seq"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


def pack_chunks(
    chunks,
    budget_tokens: int = 2048,
    id_col: str = "doc_id",
    seq_col: str = "chunk_seq",
    tokens_col: str = "n_tokens",
):
    """(doc_id, chunk_seq, pack_id) — assign chunks to fixed-budget training
    sequences by running token count in deterministic (doc_id, chunk_seq)
    order: pack_id = floor((cumsum − n) / budget). The streaming-friendly
    first-fit approximation (a chunk may straddle two packs' budget line;
    exact bin packing is NP-hard and order-destroying): average pack fill is
    ≥ 1 − max_chunk/budget. The running sum is the DISTRIBUTED global
    cumsum (block.global_cumsum: range partition + local window + offset
    prefix — never Exchange SinglePartition)."""
    from pyspark.sql import functions as F

    from nama_spark.operators.block import global_cumsum

    cs = global_cumsum(
        chunks, [id_col, seq_col], tokens_col, out_col="__cum"
    )
    return cs.select(
        id_col,
        seq_col,
        ((F.col("__cum") - F.col(tokens_col)) / F.lit(int(budget_tokens)))
        .cast("long")
        .alias("pack_id"),
    )
