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
