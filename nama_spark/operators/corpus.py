"""Training-corpus preparation beyond dedup: benchmark decontamination,
temperature-based domain mixture sampling, and deterministic shuffle-sharding.

These are the standard steps between a deduplicated corpus and a training
run (no reference counterpart — beyond-reference scope, same family as
dedup.py's corpus operators):

- decontamination: drop/flag training documents that share long n-grams with
  an evaluation set (Brown et al., "Language Models are Few-Shot Learners",
  NeurIPS 2020, appendix C; standard in every LLM data pipeline since).
- temperature sampling: re-balance domain mixture by sampling each domain at
  a rate proportional to n_domain^(1/T - 1) (Arivazhagan et al. 2019's
  temperature heuristic; used by multilingual + multi-source LLM corpora).
- shuffle-shard: a deterministic, seed-keyed global shuffle materialized as
  (shard, pos) — training-order assignment that is reproducible, resumable,
  and never funnels through a single partition.

Every operator keeps its randomness engine-portable (md5 → 48-bit uniform,
the split_documents_leakfree pattern) so a SQL oracle can replay it exactly,
and every shuffle is an equi-join or a range partition — no driver loops, no
Python in the hot path.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import word_shingles


def _uniform48(*cols) -> "F.Column":
    """md5(concat_ws(':', cols)) → first 12 hex digits → uniform double in
    [0,1). Exact in a double (48 bits) and bit-identical in DuckDB, so
    sampling decisions can be replayed by an independent engine."""
    return (
        F.conv(F.substring(F.md5(F.concat_ws(":", *cols)), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(1 << 48))
    )


# ---------- benchmark decontamination ----------

def ngram_overlap(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_ngrams, n_hit, overlap_frac) — for each training document,
    the fraction of its DISTINCT n-word-gram set that also occurs anywhere
    in ``eval_docs``. The eval n-gram set is deduplicated and is small by
    construction (benchmarks are MBs against a TB corpus), so Spark
    broadcasts it and the probe is a map-side semi-join: the corpus is
    scanned once, nothing wide shuffles.

    Documents shorter than ``n`` words contribute their single whole-text
    shingle (word_shingles' short-doc rule), so every doc gets a row —
    n_ngrams is never 0 and the fraction is always defined."""
    grams = word_shingles(docs, text_col=text_col, id_col=id_col, k=n)
    eval_grams = (
        word_shingles(eval_docs, text_col=text_col, id_col=id_col, k=n)
        .select("shingle")
        .distinct()
    )
    hit = F.broadcast(eval_grams.withColumn("__hit", F.lit(1)))
    return (
        grams.join(hit, "shingle", "left")
        .groupBy(F.col("doc_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_hit"),
        )
        .withColumn(
            "overlap_frac", F.col("n_hit") / F.col("n_ngrams").cast("double")
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    max_overlap: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training docs with eval-set contamination REMOVED: keep a document
    iff its distinct-n-gram overlap fraction is ≤ ``max_overlap`` (the
    GPT-3 rule is any 13-gram collision ⇒ drop, i.e. max_overlap=0.0 —
    kept as the default; raise it for the softer "mostly clean" gate).
    Schema-preserving: returns ``docs``' own columns."""
    clean = ngram_overlap(
        docs, eval_docs, n=n, text_col=text_col, id_col=id_col
    ).where(F.col("overlap_frac") <= F.lit(float(max_overlap)))
    return docs.join(clean.select(id_col), id_col, "left_semi")


# ---------- temperature-based domain mixture ----------

def mixture_rates(
    docs: DataFrame,
    temperature: float = 1.0,
    domain_col: str = "source",
) -> DataFrame:
    """(domain, n_docs, rate) — per-domain sampling rates that re-shape the
    corpus mixture toward p_domain ∝ n_domain^(1/T) (Arivazhagan et al.,
    "Massively Multilingual NMT in the Wild", 2019 — T=1 keeps natural
    proportions, T→∞ approaches uniform). Rates are per-DOCUMENT keep
    probabilities r_d ∝ n_d^(1/T)/n_d, normalized so the best-kept domain
    has rate 1.0 (pure down-sampling — no document is duplicated, so the
    output is still a dedup-safe corpus). One tiny groupBy; the rate table
    is domains-sized and broadcast by the samplers below."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    counts = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # r_d ∝ n_d^(1/T - 1); max over domains normalized to 1.0
    raw = F.pow(F.col("n_docs").cast("double"), F.lit(1.0 / temperature - 1.0))
    scored = counts.withColumn("__raw", raw)
    m = scored.agg(F.max("__raw").alias("m"))
    return (
        scored.crossJoin(F.broadcast(m))
        .select(
            "domain",
            "n_docs",
            (F.col("__raw") / F.col("m")).alias("rate"),
        )
    )


def sample_mixture(
    docs: DataFrame,
    rates: DataFrame,
    seed: int = 0,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic Bernoulli down-sample of ``docs`` at the per-domain
    ``rates`` (a (domain, rate) table — mixture_rates output or hand-built):
    keep iff u48(id, seed) < rate. The decision hashes only (id, seed), so
    it is reproducible run-to-run, stable under re-partitioning, and adding
    new documents never flips an existing keep/drop — the property that
    makes incremental corpus builds append-only. Broadcast rate join; the
    corpus shuffles zero bytes."""
    r = F.broadcast(rates.select(F.col("domain"), F.col("rate")))
    keep = _uniform48(F.col(id_col), F.lit(str(seed))) < F.col("rate")
    return (
        docs.join(r, docs[domain_col] == r["domain"], "left")
        .where(F.coalesce(keep, F.lit(False)))
        .drop("domain", "rate")
    )


# ---------- deterministic shuffle-shard ----------

def shuffle_shard(
    docs: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """(shard, pos, <docs columns>) — a deterministic global shuffle
    materialized as a training-order assignment: documents are ranked by a
    seed-keyed 48-bit uniform (a true random permutation, reproducible
    run-to-run) and dealt round-robin: shard = rank % n_shards,
    pos = rank // n_shards. Round-robin off the GLOBAL rank gives exactly
    balanced shards (sizes differ by ≤1) and — because the rank comes from
    block.global_rank's range-partition + offset-prefix-sum realization —
    the permutation never funnels through a single partition and no shard
    is ever sorted inside one task (the per-shard-window alternative holds
    corpus/n_shards rows in one task: a spill at 100 TB). Re-running with
    the same seed reproduces the exact order — what a resumable training
    job needs from its data loader."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    from .block import global_rank

    hashed = docs.withColumn(
        "__u", _uniform48(F.col(id_col), F.lit(str(seed)))
    )
    ranked = global_rank(hashed, ["__u", id_col], rank_col="__rank")
    return ranked.select(
        (F.col("__rank") % n_shards).cast("int").alias("shard"),
        F.floor(F.col("__rank") / n_shards).cast("bigint").alias("pos"),
        *docs.columns,
    )


# ---------- Gopher repetition signals (Rae et al. 2021, Table A1) ----------

#: drop when the char-mass of the single most repeated n-gram exceeds this
#: fraction of the normalized text (Rae et al., "Scaling Language Models:
#: Methods, Analysis & Insights from Training Gopher", 2021, Table A1).
GOPHER_TOP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
#: drop when the total char-mass of ALL duplicated n-grams exceeds this
#: fraction (same source; the n=5..10 "duplicate n-gram" family).
GOPHER_DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def repetition_profile(
    docs: DataFrame,
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_chars_norm, top{n}_gram_chars..., dup{n}_gram_chars...) —
    the within-document repetition signals of the Gopher quality rules
    (Rae et al. 2021, Table A1): for each ``n`` in ``top_ns`` the char-mass
    (occurrences x gram length) of the single most repeated word n-gram, and
    for each ``n`` in ``dup_ns`` the total char-mass of every n-gram that
    occurs >= 2 times in the document. Downstream fractions are these
    integers over ``n_chars_norm`` (the length of the whitespace-normalized
    text) — emitted as exact integers, not floats, so an oracle can compare
    without rounding-tie hazards and a filter can threshold with integer
    arithmetic.

    Variant notes vs the paper (documented, deterministic): the "top" signal
    is max(occ x len) rather than "chars of the modal gram" (monotone
    tie-free twin); the "dup" signal counts every occurrence's chars, so
    overlapping duplicated grams double-count (an upper bound on the
    paper's distinct-char coverage — stricter, never looser, as a filter).
    Documents with fewer than ``n`` words have no n-grams → 0 char-mass.

    Shape at scale: the tokenized projection is computed once and pinned
    (lazy localCheckpoint — each ``n`` branch re-reads the skinny
    (doc_id, tokens) frame, not the corpus); every branch is explode →
    groupBy(doc_id, md5(gram)) → groupBy(doc_id) — all signals are
    WITHIN-document, so each agg is per-doc-local mass, no cross-doc joins,
    no pair enumeration, linear in corpus token count. Shuffle rows are
    (id, 32-char hash, int) — the gram text itself never crosses a
    shuffle."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: w != F.lit(""),
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
    base = base.localCheckpoint(eager=False)
    t = F.col("__toks")
    nw = F.size(t)
    out = base.select(
        "doc_id", F.length(F.array_join(t, " ")).cast("long").alias("n_chars_norm")
    )
    def _gram_at(width):
        # single-arg lambda only: a second parameter would be bound to the
        # element INDEX by Spark's higher-order transform
        return lambda i: F.array_join(F.slice(t, i + 1, width), " ")

    for n in sorted(set(top_ns) | set(dup_ns)):
        grams = F.when(
            nw >= n,
            F.transform(F.sequence(F.lit(0), nw - F.lit(n)), _gram_at(n)),
        ).otherwise(F.array().cast("array<string>"))
        per_gram = (
            base.select("doc_id", F.explode(grams).alias("g"))
            .select("doc_id", F.md5("g").alias("h"), F.length("g").alias("l"))
            .groupBy("doc_id", "h")
            .agg(F.count(F.lit(1)).alias("occ"), F.max("l").alias("l"))
        )
        per_doc = per_gram.groupBy("doc_id").agg(
            F.max(F.col("occ") * F.col("l")).alias(f"__top{n}"),
            F.sum(
                F.when(F.col("occ") >= 2, F.col("occ") * F.col("l")).otherwise(0)
            ).alias(f"__dup{n}"),
        )
        out = out.join(per_doc, "doc_id", "left")
    sel = [F.col("doc_id"), F.col("n_chars_norm")]
    for n in top_ns:
        sel.append(
            F.coalesce(F.col(f"__top{n}"), F.lit(0))
            .cast("long")
            .alias(f"top{n}_gram_chars")
        )
    for n in dup_ns:
        sel.append(
            F.coalesce(F.col(f"__dup{n}"), F.lit(0))
            .cast("long")
            .alias(f"dup{n}_gram_chars")
        )
    return out.select(*sel)


def gopher_repetition_filter(
    docs: DataFrame,
    top_thresholds: dict | None = None,
    dup_thresholds: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``docs`` with documents failing ANY Gopher repetition rule removed:
    keep iff top{n}_gram_chars / n_chars_norm <= top_thresholds[n] for every
    n, and likewise for dup_thresholds (defaults = the paper's Table A1
    values). The comparison is integer arithmetic (chars x 1000 vs
    thr_millis x n_chars_norm) — exact, engine-portable, no float rounding.
    Thresholds must therefore be exact milli-units (0.001 resolution).
    Schema-preserving left-semi join; empty documents (n_chars_norm = 0)
    trivially pass (0 <= 0) — length gating is quality_score's job."""
    top_thresholds = (
        dict(GOPHER_TOP_NGRAM_THRESHOLDS) if top_thresholds is None else top_thresholds
    )
    dup_thresholds = (
        dict(GOPHER_DUP_NGRAM_THRESHOLDS) if dup_thresholds is None else dup_thresholds
    )
    prof = repetition_profile(
        docs,
        top_ns=tuple(top_thresholds),
        dup_ns=tuple(dup_thresholds),
        text_col=text_col,
        id_col=id_col,
    )
    cond = F.lit(True)
    for n, thr in sorted(top_thresholds.items()):
        cond = cond & (
            F.col(f"top{n}_gram_chars") * 1000
            <= F.lit(int(round(thr * 1000))) * F.col("n_chars_norm")
        )
    for n, thr in sorted(dup_thresholds.items()):
        cond = cond & (
            F.col(f"dup{n}_gram_chars") * 1000
            <= F.lit(int(round(thr * 1000))) * F.col("n_chars_norm")
        )
    keep = prof.where(cond).select(F.col("doc_id").alias(id_col))
    return docs.join(keep, id_col, "left_semi")


# ---------- per-domain document caps ----------

def cap_per_domain(
    docs: DataFrame,
    max_per_domain: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    priority_col: str | None = None,
    seed: int = 0,
    n_salts: int = 32,
) -> DataFrame:
    """Keep at most ``max_per_domain`` documents per domain — the standard
    anti-over-representation cap of web-corpus builds (RefinedWeb, Penedo
    et al. 2023 keep per-domain shares bounded so a single crawl-heavy host
    cannot dominate the training mixture). Documents are ranked within
    their domain by ``priority_col`` DESCENDING when given (e.g. a quality
    score — keep the best), else by a seed-keyed 48-bit uniform hash of the
    id (a deterministic random sample: reproducible run-to-run, replayable
    by a SQL oracle, and stable under re-partitioning). Ties break on the
    id ascending so the ranking is total. Schema-preserving.

    Skew shape: a naive per-domain window puts a hot domain's entire row
    set in ONE task (a crawl-heavy host at 100 TB is millions of rows —
    the Exchange-then-sort spills). Two phases bound it: phase 1 ranks
    within (domain, salt) — ``n_salts`` hash-salted sub-partitions — and
    keeps each sub-partition's top ``max_per_domain`` (a superset of every
    global survivor in that salt); phase 2 ranks the ≤ n_salts x cap
    survivors per domain. No phase-2 partition ever exceeds
    n_salts x max_per_domain rows, whatever the domain skew."""
    if max_per_domain <= 0:
        raise ValueError("max_per_domain must be positive")
    from pyspark.sql import Window

    key = (
        F.col(priority_col).cast("double")
        if priority_col
        else _uniform48(F.col(id_col), F.lit(str(seed)))
    )
    salted = docs.withColumn("__key", key).withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_salts))
    )
    w1 = Window.partitionBy(domain_col, "__salt").orderBy(
        F.col("__key").desc(), F.col(id_col).asc()
    )
    survivors = (
        salted.withColumn("__r", F.row_number().over(w1))
        .where(F.col("__r") <= max_per_domain)
        .drop("__r", "__salt")
    )
    w2 = Window.partitionBy(domain_col).orderBy(
        F.col("__key").desc(), F.col(id_col).asc()
    )
    return (
        survivors.withColumn("__r", F.row_number().over(w2))
        .where(F.col("__r") <= max_per_domain)
        .drop("__r", "__key")
    )


# ---------- PII redaction ----------

def redact_documents(
    docs: DataFrame,
    kinds: tuple = None,
    text_col: str = "text",
    with_counts: bool = True,
    token_fmt: str = "<{kind}>",
) -> DataFrame:
    """``docs`` with ``text_col`` PII-redacted (typed placeholders) and,
    when ``with_counts``, one ``n_<kind>`` long column per kind counting
    pre-redaction matches — the scrubbing pass every released web corpus
    runs (C4 strips lines; Dolma/FineWeb mask emails/IPs/phones in place,
    which is what this does). Schema-preserving apart from the appended
    count columns; pure regexp column expressions, no shuffle at all."""
    from nama_spark.functions.pii import PII_KINDS, pii_count, redact_pii

    if kinds is None:
        kinds = PII_KINDS
    out = docs
    if with_counts:
        for kind in kinds:
            out = out.withColumn(f"n_{kind}", pii_count(text_col, kind))
    return out.withColumn(text_col, redact_pii(text_col, tuple(kinds), token_fmt))


# ---------- C4-style line-level quality filtering ----------

def _line_table(docs: DataFrame, text_col: str, id_col: str, sep: str):
    import re as _re

    return docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
            "pos", "line"
        ),
    ).withColumn("l", F.trim(F.col("line")))


def line_quality_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_words: int = 3,
) -> DataFrame:
    """Per-document line-structure profile: counts of non-empty lines and
    of the boilerplate shapes the C4/Gopher line rules gate on — lines
    ending in terminal punctuation ('.', '!', '?', '"'), bullet-prefixed
    lines ('-', '*', '•'), lines ending in an ellipsis, and lines shorter
    than ``min_words`` whitespace words. All integer counts from string
    predicates — exact, engine-portable. One explode + one groupBy."""
    lines = _line_table(docs, text_col, id_col, sep).where(F.col("l") != "")
    last = F.substring(F.col("l"), -1, 1)
    first = F.substring(F.col("l"), 1, 1)
    nw = F.size(F.split(F.col("l"), r"\s+"))
    return lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(last.isin(".", "!", "?", '"').cast("long")).alias("n_terminal"),
        F.sum(first.isin("-", "*", "•").cast("long")).alias("n_bullet"),
        F.sum(F.col("l").endswith("...").cast("long")).alias("n_ellipsis"),
        F.sum((nw < min_words).cast("long")).alias("n_short"),
    )


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_words: int = 3,
    min_kept_lines: int = 2,
    drop_doc_substrings: tuple = ("lorem ipsum", "{"),
) -> DataFrame:
    """C4's line-level cleaning (Raffel et al. 2020 §2.2), the standard
    web-text scrub between dedup and tokenization:

    - keep only lines that end in terminal punctuation ('.', '!', '?', '"'),
    - drop lines with fewer than ``min_words`` words,
    - drop bullet/ellipsis boilerplate lines and lines mentioning
      "javascript" (cookie/JS warnings),
    - drop whole documents whose RAW text contains any
      ``drop_doc_substrings`` entry (C4: "lorem ipsum", a curly brace ⇒
      code), case-insensitively,
    - drop documents with fewer than ``min_kept_lines`` surviving lines
      (C4 keeps pages with ≥ 5 sentences; parameterized here).

    Returns (``id_col``, text_clean, n_kept, n_dropped) with surviving
    lines re-joined in original order. Shape at scale: one posexplode →
    per-line predicates (no shuffle) → one groupBy re-assembly with an
    in-JVM array_sort — the dedup_paragraphs shape, so a 100×-wider corpus
    only widens the explode, and the only shuffle key is the doc id."""
    raw = F.lower(F.col(text_col))
    doc_gate = F.lit(True)
    for s in drop_doc_substrings:
        doc_gate = doc_gate & ~raw.contains(s.lower())
    gated = docs.where(doc_gate)

    lines = _line_table(gated, text_col, id_col, sep).where(F.col("l") != "")
    last = F.substring(F.col("l"), -1, 1)
    first = F.substring(F.col("l"), 1, 1)
    nw = F.size(F.split(F.col("l"), r"\s+"))
    keep = (
        last.isin(".", "!", "?", '"')
        & (nw >= min_words)
        & ~first.isin("-", "*", "•")
        & ~F.col("l").endswith("...")
        & ~F.lower(F.col("l")).contains("javascript")
    )
    marked = lines.withColumn("__keep", keep)
    out = (
        marked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.filter(
                            F.collect_list(
                                F.struct("pos", "line", "__keep")
                            ),
                            lambda s: s["__keep"],
                        )
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("text_clean"),
            F.sum(F.col("__keep").cast("long")).alias("n_kept"),
            F.sum((~F.col("__keep")).cast("long")).alias("n_dropped"),
        )
        .where(F.col("n_kept") >= min_kept_lines)
    )
    return out
