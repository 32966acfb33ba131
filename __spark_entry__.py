"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full multi-pass entity-resolution pipeline
(exact-normalized-key → token-similarity → CC) over messy org-name variants
synthesized from sf0.001 part names.

``queries()`` — one entry per implemented operator family from SURVEY.md §2
plus the training-data-pipeline operators (dedup / ANN / text analysis).
Each callable takes (spark, sf_dir) and returns a DataFrame.

``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (tables region nation
customer supplier part orders lineitem events documents embeddings are
pre-registered views). Iterative connected components are oracle-checked via
recursive-CTE min-label propagation; SimHash via md5 nibble bit math; the
ANN approximations against the exact top-k (LSH: measured deterministic
recall 1.0; IVF: nprobe = n_cells probes every cell); the 3-pass flagship via
the engine-portable md5 feature-hashing embedder (embed_strings_md5), whose
bit math DuckDB recomputes exactly. Every queries() entry has an oracle; the
only non-SQL-expressible artifact left is the multimodal feature VECTOR
(seeded numpy RNG — its scalar decode fields ARE oracle-checked, the vector
is pinned by pytest).

Float discipline: every float column is rounded identically on both sides
(and double math is forced on the Spark side where DuckDB uses DOUBLE[]), so
the order-insensitive value-hash comparison is stable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# shared builders (Spark side) — mirrored 1:1 in the oracle SQL
# ---------------------------------------------------------------------------

def _variants(spark, sf_dir) -> DataFrame:
    """Messy org-name variants of the part-name universe: raw, UPPER,
    ', Inc.'-suffixed. Deterministic, built identically in the oracle SQL."""
    p = _t(spark, sf_dir, "part").select("p_name")
    return (
        p.select(F.col("p_name").alias("string"))
        .union(p.select(F.upper("p_name").alias("string")))
        .union(p.select(F.concat(F.col("p_name"), F.lit(", Inc.")).alias("string")))
        .distinct()
    )


def _name_universe(spark, sf_dir) -> DataFrame:
    return _t(spark, sf_dir, "part").select(F.col("p_name").alias("string")).distinct()


def _pred_gold_matchdata(spark, sf_dir):
    """pred partition = p_brand, gold partition = p_type over part keys,
    weighted by lineitem multiplicity (+1 so every part appears)."""
    from nama_spark.operators.matchdata import MatchData

    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    base = part.join(li, part["p_partkey"] == li["l_partkey"], "left").select(
        F.col("p_partkey").cast("string").alias("string"),
        (F.coalesce(F.col("n"), F.lit(0)) + F.lit(1)).alias("count"),
        F.col("p_brand").alias("pred_g"),
        F.col("p_type").alias("gold_g"),
    )
    pred = MatchData(
        base.select("string", "count", F.col("pred_g").alias("group")), _relabel=False
    )
    gold = MatchData(
        base.select("string", "count", F.col("gold_g").alias("group")), _relabel=False
    )
    return pred, gold


def _doc_shingle_pairs(spark, sf_dir, threshold=0.5):
    from nama_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    # max_df mirrors the operator's intended skew cap (dedup.py ngram_jaccard_pairs):
    # a shingle shared by >1000 docs is a stop-shingle, not a dedup signal
    return ngram_jaccard_pairs(docs, k=3, threshold=threshold, max_df=1000)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Full ER pipeline on sf0.001: ingest → exact-key pass → token-sim pass
    → embedding-LSH pass → distributed CC → clusters (string, count, group).
    All three blocking passes (B1/B2/B3, SURVEY.md §3) run fused into one CC."""
    from nama_spark.plans.pipeline import (
        EmbeddingPass,
        ExactKeyPass,
        MatchPipeline,
        TokenSimPass,
    )

    sf_dir = "/root/testdata/sf0.001"
    records = _variants(spark, sf_dir).withColumnRenamed("string", "repo")
    pipe = MatchPipeline(
        passes=[
            ExactKeyPass(key="simplify_corp"),
            TokenSimPass(threshold=0.7),
            EmbeddingPass(threshold=0.5),
        ],
        checkpoint_dir=None,
    )
    md, _ = pipe.run(records, string_col="repo")
    return md.to_df(sort_groups=False)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_normalize_simplify(spark, sf_dir):
    from nama_spark.functions.normalize import simplify

    return _t(spark, sf_dir, "customer").select(
        "c_custkey", simplify("c_name").alias("name_simplified")
    )


def q_normalize_simplify_corp(spark, sf_dir):
    from nama_spark.functions.normalize import simplify_corp

    part = _t(spark, sf_dir, "part")
    suffix = (
        F.when(F.col("p_partkey") % 4 == 0, "Inc")
        .when(F.col("p_partkey") % 4 == 1, "Holding Co LLC")
        .when(F.col("p_partkey") % 4 == 2, "Ltd")
        .otherwise("Group")
    )
    raw = F.concat(F.col("p_name"), F.lit(" "), suffix)
    raw = F.when(F.col("p_partkey") % 5 == 0, F.concat(F.lit("The "), raw)).otherwise(raw)
    return part.select(
        "p_partkey", raw.alias("raw_name"), simplify_corp(raw).alias("corp_key")
    )


def q_matchdata_from_unmatched(spark, sf_dir):
    from nama_spark.operators.matchdata import MatchData

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    names = li.join(part, li["l_partkey"] == part["p_partkey"]).select("p_name")
    return MatchData.from_unmatched(names, string_col="p_name").df


def q_exact_key_clusters(spark, sf_dir):
    from nama_spark.functions.normalize import simplify_corp
    from nama_spark.operators.matchdata import MatchData

    md = MatchData.from_unmatched(_variants(spark, sf_dir))
    return md.unite(simplify_corp).df.select("string", "group")


def q_normalize_remove_stopwords(spark, sf_dir):
    """remove_stopwords (utils[html]:84-106 parity): drop words whose
    LOWERCASE form is an English stopword, preserve the original case of
    survivors, rejoin single-spaced. Pure column expressions — no UDF."""
    from nama_spark.functions.normalize import remove_stopwords

    p = _t(spark, sf_dir, "part")
    raw = F.concat(F.lit("The "), F.col("p_name"), F.lit(" of the Day and more"))
    return p.select(
        "p_partkey",
        raw.alias("raw_name"),
        remove_stopwords(raw).alias("cleaned"),
    )


def q_matchdata_add_strings(spark, sf_dir):
    """MatchData.add_strings (match_data.py:93-130 parity): new strings
    insert as singletons, strings already present accumulate counts and KEEP
    their group — one full outer join, no driver round-trip."""
    from nama_spark.operators.matchdata import MatchData

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    names = li.join(part, li["l_partkey"] == part["p_partkey"]).select("p_name")
    md = MatchData.from_unmatched(names, string_col="p_name")
    newcomers = (
        part.where(F.col("p_partkey") % 3 == 0)
        .select(F.col("p_name").alias("string"))
        .union(
            part.where(F.col("p_partkey") % 5 == 0)
            .select(F.concat(F.col("p_name"), F.lit(" redux")).alias("string"))
        )
    )
    return md.add_strings(newcomers).df


def q_matchdata_split(spark, sf_dir):
    """MatchData.split (match_data.py:320-370 parity): unite the name
    universe by first word, then break the strings with length % 4 == 0 back
    out into singletons; remnant groups re-elect labels (max count, tie min
    string). Exercises the label-split regression: a split string that was
    its group's label must not re-merge with the remnants. split() takes a
    driver-side list by reference contract — the collect is the API shape,
    bounded by the split-set size."""
    from nama_spark.operators.matchdata import MatchData

    md = MatchData.from_unmatched(_name_universe(spark, sf_dir))
    united = md.unite(lambda c: F.split(c, " ").getItem(0))
    to_split = [
        r["string"]
        for r in united.df.where(F.length("string") % 4 == 0)
        .select("string").collect()
    ]
    return united.split(to_split).df.select("string", "group")


def q_token_doc_counts(spark, sf_dir):
    from nama_spark.functions.tokenize import tokens_table

    toks = tokens_table(_name_universe(spark, sf_dir), tokenizer="words")
    return toks.groupBy("token").agg(
        F.sum("tf").alias("f"), F.count(F.lit(1)).alias("n_strings")
    )


def q_tokens_tfidf_weights(spark, sf_dir):
    from nama_spark.functions.tokenize import token_weights, tokens_table

    toks = tokens_table(_name_universe(spark, sf_dir), tokenizer="words")
    w = token_weights(toks, weighting="tf-idf", reference_doc_counts=True)
    return w.select("token", "f", "d", F.round("weight", 6).alias("weight"))


def q_token_block_pairs(spark, sf_dir):
    from nama_spark.functions.tokenize import token_weights, tokens_table
    from nama_spark.operators.block import eligible_tokens, token_block_pairs

    toks = tokens_table(_name_universe(spark, sf_dir), tokenizer="words")
    w = token_weights(toks, weighting="tf-idf")
    return token_block_pairs(toks, eligible_tokens(w, 2, 100))


def q_pair_jaccard_scores(spark, sf_dir):
    from nama_spark.functions.tokenize import token_weights, tokens_table
    from nama_spark.operators.block import eligible_tokens, token_block_pairs
    from nama_spark.operators.score import token_similarity_scores

    toks = tokens_table(_name_universe(spark, sf_dir), tokenizer="words")
    w = token_weights(toks, weighting="tf-idf")
    pairs = token_block_pairs(toks, eligible_tokens(w, 2, 100))
    scored = token_similarity_scores(pairs, toks, w, measure="jaccard")
    return scored.select("s0", "s1", F.round("score", 5).alias("score"))


def q_explain_pairs(spark, sf_dir):
    """score.explain_pairs — the match debugger: per-token evidence rows
    (which side carries each token, its global tf-idf weight) for every
    blocked candidate pair over the part-name universe. The breakdown
    reconciles exactly to the engine's weighted Jaccard
    (test_tokensim.py); this row pins the evidence table itself."""
    from nama_spark.functions.tokenize import token_weights, tokens_table
    from nama_spark.operators.block import eligible_tokens, token_block_pairs
    from nama_spark.operators.score import explain_pairs

    u = _name_universe(spark, sf_dir)
    toks = tokens_table(u, tokenizer="words")
    w = token_weights(toks, weighting="tf-idf")
    pairs = token_block_pairs(toks, eligible_tokens(w, 2, 100))
    out = explain_pairs(pairs.select("s0", "s1"), u, tokenizer="words")
    return out.select(
        "s0", "s1", "token",
        F.col("in_s0").cast("int").alias("in_s0"),
        F.col("in_s1").cast("int").alias("in_s1"),
        F.col("shared").cast("int").alias("shared"),
        F.round("weight", 5).alias("weight"),
    )


def q_partition_diff(spark, sf_dir):
    """matchdata.diff_partitions — the model-upgrade audit: classify
    every string's fate between two partitions (brand-keyed vs
    type-keyed groupings over part names, on deliberately offset
    universes so only_a/only_b fire) as stable / split / merged /
    regrouped by pure cluster-cardinality arithmetic — three groupBy
    counts, never a pairwise expansion."""
    from nama_spark.operators.matchdata import diff_partitions

    part = _t(spark, sf_dir, "part")
    a = (
        part.where(F.col("p_partkey") % 5 != 0)
        .groupBy(F.col("p_name").alias("string"))
        .agg(F.min("p_brand").alias("group"))
    )
    b = (
        part.where(F.col("p_partkey") % 7 != 0)
        .groupBy(F.col("p_name").alias("string"))
        .agg(F.min("p_type").alias("group"))
    )
    return diff_partitions(a, b)


def q_uncertain_pairs(spark, sf_dir):
    """pairs.select_uncertain_pairs — the labeling-budget op: the 30
    blocked candidate pairs whose jaccard sits within ±0.4 of the 0.5
    decision threshold, drawn by the reproducible md5(seed, pair) key.
    Scores pre-rounded to 5dp so the band filter compares the same
    values both engines hash."""
    from nama_spark.functions.tokenize import token_weights, tokens_table
    from nama_spark.operators.block import eligible_tokens, token_block_pairs
    from nama_spark.operators.pairs import select_uncertain_pairs
    from nama_spark.operators.score import token_similarity_scores

    toks = tokens_table(_name_universe(spark, sf_dir), tokenizer="words")
    w = token_weights(toks, weighting="tf-idf")
    pairs = token_block_pairs(toks, eligible_tokens(w, 2, 100))
    scored = token_similarity_scores(pairs, toks, w, measure="jaccard").select(
        "s0", "s1", F.round("score", 5).alias("score")
    )
    out = select_uncertain_pairs(
        scored, threshold=0.5, band=0.4, k=30, seed="r05"
    )
    return out.select(
        "s0", "s1", "score", F.round("uncertainty", 5).alias("uncertainty")
    )


# Fellegi–Sunter fixture params: fixed (m, u) per comparison level, shared
# verbatim by the Spark query and the oracle SQL (the integer milli log2
# Bayes-factor weights are computed ONCE from these literals — both engines
# sum identical integers). EM fitting itself is covered in
# tests/test_fs_metablock.py (float iteration — not an oracle row).
_FS_PARAMS = {
    "g_nation": {0: (0.05, 0.96), 1: (0.95, 0.04)},
    "g_segment": {0: (0.10, 0.80), 1: (0.90, 0.20)},
    "g_bal": {0: (0.05, 0.90), 1: (0.25, 0.099), 2: (0.70, 0.001)},
}


def _fs_gamma_pairs(spark, sf_dir):
    """Blocked customer×customer pairs with integer agreement levels.
    Block key = last 3 name digits (1000 blocks, bounded occupancy at any
    sf); γ over nation key, market segment, and account balance measured
    in integer cents (2 = exact, 1 = within 100.00, 0 = apart)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.substring("c_name", -3, 3).alias("__blk"),
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("__cents"),
    )
    a = c.select([F.col(x).alias(f"{x}_a") for x in c.columns])
    b = c.select([F.col(x).alias(f"{x}_b") for x in c.columns])
    pairs = a.join(
        b,
        (F.col("__blk_a") == F.col("__blk_b"))
        & (F.col("c_custkey_a") < F.col("c_custkey_b")),
    )
    return pairs.select(
        F.col("c_custkey_a").alias("c0"),
        F.col("c_custkey_b").alias("c1"),
        F.when(F.col("c_nationkey_a") == F.col("c_nationkey_b"), 1)
        .otherwise(0).cast("int").alias("g_nation"),
        F.when(F.col("c_mktsegment_a") == F.col("c_mktsegment_b"), 1)
        .otherwise(0).cast("int").alias("g_segment"),
        F.when(F.col("__cents_a") == F.col("__cents_b"), 2)
        .when(F.abs(F.col("__cents_a") - F.col("__cents_b")) <= 10000, 1)
        .otherwise(0).cast("int").alias("g_bal"),
        # raw agreed-field values ride along for TF adjustment
        F.col("c_mktsegment_a").alias("seg0"),
        F.col("c_mktsegment_b").alias("seg1"),
    )


def q_fs_gamma_patterns(spark, sf_dir):
    """fellegi_sunter.pattern_counts — the EM sufficient statistic: one
    groupBy over the blocked pair set collapses any corpus to ≤ 12 pattern
    rows (2·2·3 levels). Fellegi & Sunter JASA 1969; pattern-EM per
    Winkler 1988 (tests/test_fs_metablock.py recovers planted params)."""
    from nama_spark.operators.fellegi_sunter import pattern_counts

    g = _fs_gamma_pairs(spark, sf_dir)
    return pattern_counts(g, ["g_nation", "g_segment", "g_bal"])


def q_fs_match_weights(spark, sf_dir):
    """fellegi_sunter.match_weights — per-pair integer milli log2-Bayes
    match weight under the fixed _FS_PARAMS model: a pure chained-CASE
    column expression (no join, no shuffle beyond the block join)."""
    from nama_spark.operators.fellegi_sunter import match_weights

    g = _fs_gamma_pairs(spark, sf_dir)
    return match_weights(
        g, _FS_PARAMS, ["g_nation", "g_segment", "g_bal"]
    ).select("c0", "c1", "g_nation", "g_segment", "g_bal",
             F.col("weight_milli").cast("long").alias("weight_milli"))


def q_bcubed_eval(spark, sf_dir):
    """evaluate.bcubed_df — record-level B-cubed precision/recall rows
    (Bagga & Baldwin 1998) over the brand-vs-type partitions, count-
    weighted. Integer na/ng/nab (exact), ratios rounded at 6dp. Same
    groupBy+join shape as confusion_df — no group-partitioned windows."""
    from nama_spark.operators.evaluate import bcubed_df

    pred, gold = _pred_gold_matchdata(spark, sf_dir)
    out = bcubed_df(pred, gold, use_counts=True)
    return out.select(
        "string",
        F.col("count").cast("long").alias("count"),
        "group_pred", "group_gold",
        "na", "ng", "nab",
        F.round("p", 6).alias("p"),
        F.round("r", 6).alias("r"),
    )


def q_metablock_wep_pairs(spark, sf_dir):
    """block.metablock_weights + WEP pruning (Papadakis et al., TKDE 2014)
    over word-token blocks of the part-name universe: CBS edge weights,
    block purging outside [2, 100], and the keep-if-≥-mean cut done in
    exact integer arithmetic (cbs·n_edges ≥ Σcbs) so both engines cut
    identically."""
    from nama_spark.operators.block import metablock_prune, metablock_weights

    from nama_spark.functions.tokenize import tokens_table

    toks = tokens_table(_name_universe(spark, sf_dir), tokenizer="words")
    w = metablock_weights(
        toks.withColumnRenamed("token", "block"),
        scheme="cbs", min_block_size=2, max_block_size=100,
    )
    out = metablock_prune(w, method="wep", weight_col="cbs")
    return out.select(
        "s0", "s1",
        F.col("cbs").cast("long").alias("cbs"),
        F.col("nb0").cast("long").alias("nb0"),
        F.col("nb1").cast("long").alias("nb1"),
    )


def q_metablock_cnp_pairs(spark, sf_dir):
    """block.metablock_prune(method='cnp') — Cardinality Node Pruning:
    keep an edge iff it ranks in the top-k (k=3) of EITHER endpoint's
    incident edges by CBS weight (partner-asc tie-break). One window over
    the exploded edge endpoints; integer weights end-to-end."""
    from nama_spark.functions.tokenize import tokens_table
    from nama_spark.operators.block import metablock_prune, metablock_weights

    toks = tokens_table(_name_universe(spark, sf_dir), tokenizer="words")
    w = metablock_weights(
        toks.withColumnRenamed("token", "block"),
        scheme="cbs", min_block_size=2, max_block_size=100,
    )
    out = metablock_prune(w, method="cnp", weight_col="cbs", k=3)
    return out.select(
        "s0", "s1",
        F.col("cbs").cast("long").alias("cbs"),
        F.col("nb0").cast("long").alias("nb0"),
        F.col("nb1").cast("long").alias("nb1"),
    )


def q_golden_records(spark, sf_dir):
    """fusion.golden_records — per-cluster survivorship (Bleiholder &
    Naumann 2009): clusters keyed by the last 2 name digits; name wins by
    longest (tie: greater), balance by max, segment by deterministic vote
    (tie: smaller). One groupBy + one vote aggregate, no cluster windows."""
    from nama_spark.operators.fusion import golden_records

    cust = _t(spark, sf_dir, "customer").select(
        F.substring("c_name", -2, 2).alias("grp"),
        "c_name", "c_acctbal", "c_mktsegment",
    )
    out = golden_records(
        cust, "grp",
        {"c_name": "longest", "c_acctbal": "max",
         "c_mktsegment": "most_frequent"},
    )
    return out.select(
        "group",
        F.col("n_members").cast("long").alias("n_members"),
        "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )


def q_golden_records_delta(spark, sf_dir):
    """fusion.golden_records_delta — incremental fusion: yesterday's golden
    table (customers with custkey%11 != 0) plus today's arrivals
    (custkey%11 == 0) re-fuses ONLY the arrival-touched clusters and
    carries the rest. The oracle is the FULL golden recompute over today's
    records — the delta path must be indistinguishable from it (same
    convention as cc_delta_clusters)."""
    from nama_spark.operators.fusion import golden_records, golden_records_delta

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.substring("c_name", -2, 2).alias("grp"),
        "c_name", "c_acctbal", "c_mktsegment",
    )
    rules = {"c_name": "longest", "c_acctbal": "max",
             "c_mktsegment": "most_frequent"}
    yesterday = cust.where(F.col("c_custkey") % 11 != 0).drop("c_custkey")
    today = cust.drop("c_custkey")
    prev = golden_records(yesterday, "grp", rules)
    changed = (
        cust.where(F.col("c_custkey") % 11 == 0)
        .select(F.col("grp").alias("group"))
        .distinct()
    )
    out = golden_records_delta(prev, today, "grp", rules, changed)
    return out.select(
        "group",
        F.col("n_members").cast("long").alias("n_members"),
        "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )


def q_fs_tf_adjusted(spark, sf_dir):
    """fellegi_sunter.term_frequencies + tf_adjusted_weights — Winkler's
    value-specific u (the adjustment Splink applies): pairs agreeing on a
    COMMON segment lose weight, rare segments gain. One broadcast u_bar
    scalar + one equi-join on the agreed value; integer milli units."""
    from nama_spark.operators.fellegi_sunter import (
        match_weights,
        term_frequencies,
        tf_adjusted_weights,
    )

    g = _fs_gamma_pairs(spark, sf_dir)
    w = match_weights(g, _FS_PARAMS, ["g_nation", "g_segment", "g_bal"])
    tf = term_frequencies(_t(spark, sf_dir, "customer"), "c_mktsegment")
    out = tf_adjusted_weights(w, tf, "seg0", "seg1")
    return out.select(
        "c0", "c1", "g_segment",
        F.col("tf_adj_milli").cast("long").alias("tf_adj_milli"),
        F.col("weight_tf_milli").cast("long").alias("weight_tf_milli"),
    )


def _split_shingle_edges(spark, sf_dir):
    """Deterministic base/delta split of the shingle-jaccard ≥ 0.5 edge set
    by the first hex char of md5("id0:id1") — engine-portable, so the
    stable_entity_ids oracle reproduces the exact same split in DuckDB.
    Delta ≈ 3/16 of edges (first char in 0/1/2)."""
    pairs = _doc_shingle_pairs(spark, sf_dir, threshold=0.5).select(
        F.col("id0").cast("string").alias("src"),
        F.col("id1").cast("string").alias("dst"),
    )
    tag = F.substring(F.md5(F.concat_ws(":", "src", "dst")), 1, 1)
    is_delta = tag.isin("0", "1", "2")
    return pairs.where(~is_delta), pairs.where(is_delta)


def q_cc_delta_clusters(spark, sf_dir):
    """cluster.connected_components_delta — the delta-daily clustering path
    (the clustering member of the index-once/delta family alongside
    minhash_band_index and ivf_assign_delta): solve CC over the base ~81%
    of the shingle-jaccard edges, persist the (node, component) assignment,
    then fold the held-out delta edges in via the contracted label graph +
    ONE broadcast relabel join — historical edges never re-read, the
    assignment table never shuffled. Oracle = full CC over ALL edges (the
    near_dup_clusters_cc recursive CTE): the delta path must be
    indistinguishable from a full recompute, min-id labels included."""
    from nama_spark.operators.cluster import (
        connected_components,
        connected_components_delta,
    )

    docs = _t(spark, sf_dir, "documents")
    base, delta = _split_shingle_edges(spark, sf_dir)
    assign = connected_components(base)
    all_ids = docs.select(F.col("doc_id").cast("string").alias("node"))
    labels = connected_components_delta(assign, delta, new_nodes=all_ids)
    return labels.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
    )


def q_stable_entity_ids(spark, sf_dir):
    """cluster.stable_entity_ids — entity-id continuity across re-runs:
    yesterday's clustering (base edges only) hands its ids to today's
    (all edges) by member plurality, split-losers and brand-new clusters
    mint 'n:' + md5(component). Downstream systems key on the entity id,
    which must NOT churn just because a cluster's min-member label moved.
    Two groupBy aggs + min(struct(-n, id)) arg-max — no per-cluster
    windows, giant clusters never serialize into one task."""
    from nama_spark.operators.cluster import labels_for_nodes, stable_entity_ids

    docs = _t(spark, sf_dir, "documents")
    all_ids = docs.select(F.col("doc_id").cast("string").alias("node"))
    base, _ = _split_shingle_edges(spark, sf_dir)
    prev = labels_for_nodes(all_ids, base, node_col="node").select(
        "node", F.col("component").alias("entity_id")
    )
    pairs = _doc_shingle_pairs(spark, sf_dir, threshold=0.5)
    cur = labels_for_nodes(
        all_ids,
        pairs.select(
            F.col("id0").cast("string").alias("src"),
            F.col("id1").cast("string").alias("dst"),
        ),
        node_col="node",
    )
    out = stable_entity_ids(prev, cur)
    return out.select(
        F.col("node").cast("long").alias("doc_id"), "entity_id"
    )


def q_cluster_cohesion(spark, sf_dir):
    """evaluate.cluster_cohesion — the ER audit table: per near-dup cluster,
    member count, realized intra-cluster edge count, boundary (just-cut)
    edge count, and exact integer-milli density. Low density = chain-merged
    cluster (the CC over-merge smell); high boundary = threshold sitting in
    a dense score region. Two label joins + two groupBys, all integers."""
    from nama_spark.operators.dedup import near_dup_clusters
    from nama_spark.operators.evaluate import cluster_cohesion

    docs = _t(spark, sf_dir, "documents")
    pairs = _doc_shingle_pairs(spark, sf_dir, threshold=0.5)
    clusters = near_dup_clusters(pairs, docs.select("doc_id"))
    out = cluster_cohesion(
        clusters.select(
            F.col("doc_id").cast("string").alias("node"),
            F.col("cluster_id").cast("string").alias("component"),
        ),
        pairs.select(
            F.col("id0").cast("string").alias("src"),
            F.col("id1").cast("string").alias("dst"),
        ),
    )
    return out.select(
        F.col("cluster").cast("long").alias("cluster_id"),
        "n_members", "n_edges_within", "n_boundary_edges", "density_milli",
    )


def q_monge_elkan_scores(spark, sf_dir):
    """score.monge_elkan_scores — the canonical hybrid measure (Monge &
    Elkan KDD'96): per-token best-match normalized-levenshtein, averaged,
    in exact integer milli units. One fused JVM projection over the pair
    stream (transform/array_max/aggregate) — no explode, no shuffle, no
    Python. Pair source: consecutive-key part names (the fallback_scores
    fixture)."""
    from nama_spark.operators.score import monge_elkan_scores

    part = _t(spark, sf_dir, "part")
    a = part.select(F.col("p_partkey").alias("k"), F.col("p_name").alias("s0"))
    b = part.select(
        (F.col("p_partkey") - 1).alias("k"), F.col("p_name").alias("s1")
    )
    pairs = a.join(b, "k")
    return monge_elkan_scores(pairs).select(
        "k", "s0", "s1", "me01_milli", "me10_milli", "me_sym_milli"
    )


def q_blocking_scheme_stats(spark, sf_dir):
    """block.blocking_scheme_stats — the blocking-scheme selection report:
    per candidate key, block counts, candidate-pair mass (Σ n·(n−1)/2,
    never materialized), labeled-pair coverage, and integer-milli pair
    completeness / reduction ratio. Gold sample: consecutive-custkey
    pairs; schemes: name-suffix, nation, segment, balance band."""
    from nama_spark.operators.block import blocking_scheme_stats

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        "c_name", "c_nationkey", "c_mktsegment", "c_acctbal",
    )
    gold = c.select(F.col("id").alias("id0"), (F.col("id") + 1).alias("id1"))
    gold = gold.join(c.select(F.col("id").alias("id1")), "id1").select(
        "id0", "id1"
    )
    keys = {
        "name3": lambda df: F.substring("c_name", -3, 3),
        "nation": lambda df: F.col("c_nationkey").cast("string"),
        "segment": lambda df: F.col("c_mktsegment"),
        "balband": lambda df: F.floor(F.col("c_acctbal") / 1000).cast("string"),
    }
    return blocking_scheme_stats(c, gold, keys)


def q_one_to_one_links(spark, sf_dir):
    """linkage.one_to_one_links — 1:1 assignment via 3-round mutual-best
    peeling over a ±2-key candidate window with deterministic md5-derived
    integer scores (the portable hash idiom). Candidates come from an
    offset EXPLODE + equi-join (never a range BNLJ); each round is two
    per-id windows + anti-joins."""
    from nama_spark.operators.linkage import one_to_one_links

    part = _t(spark, sf_dir, "part")
    a = part.select(F.col("p_partkey").alias("id0"))
    cand = a.select(
        "id0",
        F.explode(F.array(*[F.lit(i) for i in range(-2, 3)])).alias("_off"),
    ).select("id0", (F.col("id0") + F.col("_off")).alias("id1"))
    cand = cand.join(
        part.select(F.col("p_partkey").alias("id1")), "id1"
    ).select(
        "id0", "id1",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("id0"), F.col("id1"))), 1, 4
                ),
                16, 10,
            ).cast("long") % 1000
        ).alias("score"),
    )
    return one_to_one_links(cand, rounds=3).select(
        "id0", "id1",
        F.col("score").cast("long").alias("score"),
        F.col("round").cast("int").alias("round"),
    )


def q_bloom_dice_pairs(spark, sf_dir):
    """pprl.bloom_dice_pairs — privacy-preserving linkage scoring (Schnell,
    Bachteler & Reiher 2009 CLK Bloom filters): char-bigram k-hash
    encodings as sorted bit-position arrays (engine-portable md5 hash),
    Dice coefficient in exact integer milli. Encodes each DISTINCT string
    once; pure JVM array expressions, no Python. Pair source:
    consecutive-key part names."""
    from nama_spark.operators.pprl import bloom_dice_pairs

    part = _t(spark, sf_dir, "part")
    a = part.select(F.col("p_partkey").alias("k"), F.col("p_name").alias("s0"))
    b = part.select(
        (F.col("p_partkey") - 1).alias("k"), F.col("p_name").alias("s1")
    )
    pairs = a.join(b, "k")
    out = bloom_dice_pairs(pairs, m=256, k=3, q=2)
    return out.select(
        "k", "s0", "s1",
        F.col("dice_milli").cast("long").alias("dice_milli"),
    )


_FS_NULL_PARAMS = {
    "g_nation": {0: (0.05, 0.96), 1: (0.95, 0.04)},
    "g_segment": {0: (0.10, 0.80), 1: (0.90, 0.20)},
    "g_code": {0: (0.08, 0.92), 1: (0.92, 0.08)},
}


def q_fs_null_weights(spark, sf_dir):
    """fellegi_sunter.null_aware + match_weights with MISSING fields: the
    Splink null-level convention — a NULL on either side sets the gamma to
    -1, which carries weight 0 (absence of evidence ≠ disagreement).
    Consecutive-custkey pairs with deterministic synthetic missingness
    (segment nulled when custkey%7==0, name-code when custkey%5==0)."""
    from nama_spark.operators.fellegi_sunter import match_weights, null_aware

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("c_mktsegment")
        ).alias("seg"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None)).otherwise(
            F.substring("c_name", -2, 2)
        ).alias("pre"),
    )
    a = c.select([F.col(x).alias(f"{x}_a") for x in c.columns])
    b = c.select([F.col(x).alias(f"{x}_b") for x in c.columns])
    pairs = a.join(
        b, F.col("c_custkey_b") == F.col("c_custkey_a") + 1
    )
    g = pairs.select(
        F.col("c_custkey_a").alias("c0"),
        F.col("c_custkey_b").alias("c1"),
        null_aware(
            F.when(F.col("c_nationkey_a") == F.col("c_nationkey_b"), 1)
            .otherwise(0),
            F.col("c_nationkey_a"), F.col("c_nationkey_b"),
        ).alias("g_nation"),
        null_aware(
            F.when(F.col("seg_a") == F.col("seg_b"), 1).otherwise(0),
            F.col("seg_a"), F.col("seg_b"),
        ).alias("g_segment"),
        null_aware(
            F.when(F.col("pre_a") == F.col("pre_b"), 1).otherwise(0),
            F.col("pre_a"), F.col("pre_b"),
        ).alias("g_code"),
    )
    return match_weights(
        g, _FS_NULL_PARAMS, ["g_nation", "g_segment", "g_code"]
    ).select(
        "c0", "c1", "g_nation", "g_segment", "g_code",
        F.col("weight_milli").cast("long").alias("weight_milli"),
    )


def q_rule_cascade_links(spark, sf_dir):
    """linkage.rule_cascade_links — deterministic waterfall linkage with
    rule provenance: verbatim → lower-first-3-tokens → stopword-stripped
    sorted token set; first rule that fires wins, ties broken by smallest
    right id. Left side: part names perturbed by partkey%4 (verbatim /
    UPPER / 'incorporated ' prefix / 'the ' prefix) so each rule tier is
    exercised. One equi-join per rule + one per-left-id window."""
    from nama_spark.functions.tokenize import words
    from nama_spark.operators.linkage import rule_cascade_links

    part = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    left = part.select(
        pk.alias("id0"),
        F.when(pk % 4 == 0, F.col("p_name"))
        .when(pk % 4 == 1, F.upper(F.col("p_name")))
        .when(pk % 4 == 2, F.concat(F.lit("incorporated "), F.col("p_name")))
        .otherwise(F.concat(F.lit("the "), F.col("p_name")))
        .alias("name"),
    )
    right = part.select(pk.alias("id1"), F.col("p_name").alias("name"))

    stop = ("the", "incorporated", "inc")

    def k_exact(df):
        return F.col("name")

    def k_first3(df):
        return F.concat_ws(" ", F.slice(words(F.lower(F.col("name"))), 1, 3))

    def k_tokenset(df):
        toks = words(F.lower(F.col("name")))
        kept = F.filter(toks, lambda w: ~w.isin(*stop))
        return F.concat_ws(" ", F.array_sort(F.array_distinct(kept)))

    rules = [
        ("exact", k_exact, k_exact),
        ("first3", k_first3, k_first3),
        ("tokenset", k_tokenset, k_tokenset),
    ]
    return rule_cascade_links(left, right, rules).select(
        "id0", "id1", "rule", F.col("rule_idx").cast("long").alias("rule_idx")
    )


def q_soft_tfidf_scores(spark, sf_dir):
    """score.soft_tfidf_scores — SoftTFIDF (Cohen, Ravikumar & Fienberg,
    IIWeb'03): corpus-IDF-weighted token match with Jaro-Winkler-softened
    agreement (θ=0.9). Weights are two linear aggregates over the corpus
    token table; JW runs once per DISTINCT token pair; the per-token
    best-match argmax is a deterministic struct max. Pair source:
    consecutive-key part names; corpus: all part names."""
    from nama_spark.operators.score import soft_tfidf_scores

    part = _t(spark, sf_dir, "part")
    a = part.select(F.col("p_partkey").alias("k"), F.col("p_name").alias("s0"))
    b = part.select(
        (F.col("p_partkey") - 1).alias("k"), F.col("p_name").alias("s1")
    )
    pairs = a.join(b, "k")
    corpus = part.select(F.col("p_name").alias("string"))
    return soft_tfidf_scores(pairs, corpus, threshold=0.9).select(
        "k", "s0", "s1", "soft01", "soft10", "soft_sym"
    )


def q_ari_metric(spark, sf_dir):
    """evaluate.rand_scores — Rand index + Adjusted Rand Index (Hubert &
    Arabie 1985) from the pair-counting confusion cells, count-weighted.
    The ARI numerator/denominator are emitted as EXACT decimal integers
    (Python bigints — the products exceed int64 at count scale) alongside
    the rounded ratios."""
    from decimal import Decimal

    from pyspark.sql.types import (
        DecimalType, DoubleType, LongType, StructField, StructType,
    )

    from nama_spark.operators.evaluate import rand_scores

    pred, gold = _pred_gold_matchdata(spark, sf_dir)
    s = rand_scores(pred, gold, use_counts=True)
    tp, fp, fn, tn = s["TP"], s["FP"], s["FN"], s["TN"]
    ari_num = 2 * (tp * tn - fn * fp)
    ari_den = (tp + fn) * (fn + tn) + (tp + fp) * (fp + tn)
    schema = StructType([
        StructField("tp", LongType()), StructField("fp", LongType()),
        StructField("fn", LongType()), StructField("tn", LongType()),
        StructField("ari_num", DecimalType(38, 0)),
        StructField("ari_den", DecimalType(38, 0)),
        StructField("ri", DoubleType()), StructField("ari", DoubleType()),
    ])
    return spark.createDataFrame(
        [(tp, fp, fn, tn, Decimal(ari_num), Decimal(ari_den),
          round(s["RI"], 6), round(s["ARI"], 6))],
        schema,
    )


def q_group_stats(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.countDistinct("p_name").alias("n_members"),
            F.count(F.lit(1)).alias("count_sum"),
        )
    )


def q_merge_dfs_group_join(spark, sf_dir):
    from nama_spark.operators.matchdata import MatchData

    part = _t(spark, sf_dir, "part")
    groups = part.groupBy(F.col("p_name").alias("string")).agg(
        F.min("p_brand").alias("group")
    )
    md = MatchData.from_groups(groups)
    left = part.groupBy(F.col("p_name").alias("name_l")).agg(
        F.sum("p_size").alias("size_sum")
    )
    right = part.groupBy(F.col("p_name").alias("name_r")).agg(
        F.round(F.sum("p_retailprice"), 4).alias("retail_sum")
    )
    out = md.merge_dfs(left, right, left_on="name_l", right_on="name_r", how="inner")
    return out.select("match_group", "name_l", "name_r", "size_sum", "retail_sum")


def q_confusion_cells(spark, sf_dir):
    from nama_spark.operators.evaluate import confusion_matrix

    pred, gold = _pred_gold_matchdata(spark, sf_dir)
    cells = confusion_matrix(pred, gold, use_counts=True)
    return spark.createDataFrame(
        [(cells["TP"], cells["FP"], cells["FN"], cells["TN"])],
        ["TP", "FP", "FN", "TN"],
    )


def q_score_metrics(spark, sf_dir):
    from nama_spark.operators.evaluate import score_predicted

    pred, gold = _pred_gold_matchdata(spark, sf_dir)
    s = score_predicted(pred, gold, use_counts=True)
    return spark.createDataFrame(
        [
            (
                round(s["accuracy"], 6),
                round(s["precision"], 6),
                round(s["recall"], 6),
                round(s["F1"], 6),
                round(s["coverage"], 6),
            )
        ],
        ["accuracy", "precision", "recall", "F1", "coverage"],
    )


def q_top_scored_pairs(spark, sf_dir):
    from nama_spark.functions.tokenize import token_weights, tokens_table
    from nama_spark.operators.block import eligible_tokens, token_block_pairs
    from nama_spark.operators.score import token_similarity_scores

    toks = tokens_table(_name_universe(spark, sf_dir), tokenizer="words")
    w = token_weights(toks, weighting="tf-idf")
    pairs = token_block_pairs(toks, eligible_tokens(w, 2, 100))
    scored = token_similarity_scores(pairs, toks, w, measure="jaccard")
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    counts = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_name").alias("string"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = (
        scored.join(counts.select(F.col("string").alias("s0"), F.col("cnt").alias("c0")), "s0")
        .join(counts.select(F.col("string").alias("s1"), F.col("cnt").alias("c1")), "s1")
        .withColumn("impact", F.col("c0") * F.col("c1"))
        .select("s0", "s1", F.round("score", 5).alias("score"), "impact")
        .orderBy(F.col("impact").desc(), F.col("score").desc(), "s0", "s1")
        .limit(20)
    )
    return out


def q_fallback_scores(spark, sf_dir):
    """Jaro-Winkler (Arrow pandas UDF) + normalized Levenshtein (builtin) on
    consecutive-key part-name pairs — oracle-checked against DuckDB's own
    jaro_winkler_similarity/levenshtein."""
    from nama_spark.operators.score import add_fallback_scores

    part = _t(spark, sf_dir, "part")
    a = part.select(F.col("p_partkey").alias("k"), F.col("p_name").alias("s0"))
    b = part.select(
        (F.col("p_partkey") - 1).alias("k"), F.col("p_name").alias("s1")
    )
    pairs = a.join(b, "k")
    out = add_fallback_scores(pairs)
    return out.select(
        "k",
        "s0",
        "s1",
        F.round("jaro_winkler", 5).alias("jw"),
        F.round("levenshtein_sim", 5).alias("lev_sim"),
    )


def q_tpch_q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_customers_by_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(10)
    )


def q_events_hourly(spark, sf_dir):
    from nama_spark.streaming.windows import event_time_aggregate

    return event_time_aggregate(_t(spark, sf_dir, "events"), "1 hour")


def q_events_sessionize(spark, sf_dir):
    from nama_spark.streaming.windows import sessionize

    s = sessionize(_t(spark, sf_dir, "events"), gap="30 minutes")
    return s.groupBy("user_id").agg(F.max("session_seq").alias("n_sessions"))


def q_link_tables_best(spark, sf_dir):
    """link_tables(mode='best_left'): the best-scoring right string per left
    string (same blocking/scoring as the mutual query; selection rule only)."""
    from nama_spark.operators.linkage import link_tables

    left = _name_universe(spark, sf_dir)
    right = left.select(F.concat(F.lit("the "), F.col("string")).alias("string"))
    out = link_tables(left, right, threshold=0.4, mode="best_left")
    return out.select("s0", "s1", F.round("score", 5).alias("score"))


def q_link_tables_mutual(spark, sf_dir):
    """Cross-table record linkage (link_tables, mode='mutual'): the name
    universe links to its 'the '-prefixed counterpart table; a pair survives
    only if each side is the other's best ≥-threshold match (symmetric best
    match — the relational core of one-to-one assignment). Ranking uses
    9-decimal-rounded scores so mathematically-tied candidates break ties on
    the string deterministically in both engines."""
    from nama_spark.operators.linkage import link_tables

    left = _name_universe(spark, sf_dir)
    right = left.select(F.concat(F.lit("the "), F.col("string")).alias("string"))
    out = link_tables(left, right, threshold=0.4, mode="mutual")
    return out.select("s0", "s1", F.round("score", 5).alias("score"))


def q_predict_incremental(spark, sf_dir):
    """Incremental matching (predict_incremental): pluralized name variants
    arrive as NEW strings and unite into the existing (singleton) partition
    through new-touching token-sim edges only — old×old pairs never
    materialize (token_block_pairs_against restricts the block join's left
    side before the join). Oracle = closure over the union-universe tf-idf
    word-token jaccard edges restricted to pairs touching a new string."""
    from nama_spark.operators.matchdata import MatchData
    from nama_spark.operators.token_similarity import TokenSimilarity

    old = _name_universe(spark, sf_dir)
    md = MatchData.from_unmatched(old)
    part = _t(spark, sf_dir, "part")
    new = (
        part.where(F.col("p_partkey") % 7 == 0)
        .select(F.concat(F.col("p_name"), F.lit("s")).alias("string"))
        .distinct()
        .join(old, "string", "left_anti")
    )
    ts = TokenSimilarity(tokenizer="words")
    out = ts.predict_incremental(md, new, threshold=0.5)
    return out.df


def q_blocking_stats(spark, sf_dir):
    """Blocking-quality metrics for the token blocker against a p_brand gold
    partition: pair completeness (blocker recall) + reduction ratio — gold
    pairs counted per-group as Σ s(s−1)/2, never materialized."""
    from nama_spark.functions.tokenize import token_weights, tokens_table
    from nama_spark.operators.block import eligible_tokens, token_block_pairs
    from nama_spark.operators.evaluate import blocking_stats
    from nama_spark.operators.matchdata import MatchData

    part = _t(spark, sf_dir, "part")
    gold = MatchData.from_groups(
        part.groupBy(F.col("p_name").alias("string")).agg(
            F.min("p_brand").alias("group")
        )
    )
    toks = tokens_table(_name_universe(spark, sf_dir), tokenizer="words")
    w = token_weights(toks, weighting="tf-idf")
    pairs = token_block_pairs(toks, eligible_tokens(w, 2, 100))
    s = blocking_stats(pairs, gold)
    return spark.createDataFrame(
        [
            (
                s["n_strings"],
                s["n_candidates"],
                s["n_gold_pairs"],
                round(s["pair_completeness"], 6),
                round(s["reduction_ratio"], 6),
            )
        ],
        ["n_strings", "n_candidates", "n_gold_pairs",
         "pair_completeness", "reduction_ratio"],
    )


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup over the DOCUMENTS table (the brief's fifth
    dedup family): documents join their embedding vectors (doc_id = vec_id),
    dot ≥ 0.3 pairs (vectors stored unit-norm → dot = cosine) close into
    clusters via the shared CC operator. Bruteforce pair scan at this scale
    for oracle exactness; the LSH scale path for the same edge set is
    embed.lsh_candidates (recall-tested). Oracle = recursive-CTE closure over
    DuckDB's list_dot_product edges."""
    from nama_spark.operators.dedup import near_dup_clusters
    from nama_spark.operators.embed import bruteforce_candidates

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("vec")
    )
    doc_emb = docs.join(emb, docs["doc_id"] == emb["vec_id"]).select(
        F.col("doc_id").cast("string").alias("string"), "vec"
    )
    pairs = bruteforce_candidates(doc_emb, 0.3).select(
        F.col("s0").alias("id0"), F.col("s1").alias("id1")
    )
    out = near_dup_clusters(
        pairs, doc_emb.select(F.col("string").alias("doc_id"))
    )
    return out.select("doc_id", "cluster_id")


def q_events_sessionize_window(spark, sf_dir):
    """session_window-based sessionize (one row per session, batch/stream
    agnostic expression) — oracle = lag/cumsum sessions re-aggregated:
    session_start = first event, session_end = last event + gap."""
    from nama_spark.streaming.windows import sessionize_window

    s = sessionize_window(_t(spark, sf_dir, "events"), gap="30 minutes")
    return s.select(
        "user_id", "session_start", "session_end", "n_events", "value_sum"
    )


def q_events_sessionize_capped(spark, sf_dir):
    """Capped sessionization — gap 30 min AND a 2-event cap per session\n    (max session size in the fixture is 3, so the cap genuinely splits).
    The cap depends on the running event count; streaming runs it as the
    applyInPandasWithState custom stateful operator. This batch form is the
    fully-relational equivalent (gap breaks via lag+cumsum, cap splits are
    pure chunking inside gap-free segments — three windows over one user
    shuffle, no Python; tested equal to the shared fold AND to streaming).
    Oracle: DuckDB recursive CTE stepping each user's events in
    (ts, event_id) order."""
    from nama_spark.streaming.stateful import sessionize_capped_sql

    return sessionize_capped_sql(
        _t(spark, sf_dir, "events"), gap="30 minutes", max_events=2
    )


def q_dedup_exact_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    pairs = _doc_shingle_pairs(spark, sf_dir, threshold=0.5)
    return pairs.select("id0", "id1", F.round("jaccard", 5).alias("jaccard"))


def q_containment_pairs(spark, sf_dir):
    """dedup.containment_pairs — asymmetric near-dup detection (Broder
    1997 containment): |A∩B| / min(|A|,|B|) over 3-word shingle sets,
    same [2,1000]-df candidate blocks as the Jaccard query. Catches
    quoted-inside pairs symmetric Jaccard misses."""
    from nama_spark.operators.dedup import containment_pairs

    docs = _t(spark, sf_dir, "documents")
    out = containment_pairs(docs, k=3, threshold=0.5)
    return out.select(
        "id0", "id1", "n0", "n1",
        F.round("containment", 5).alias("containment"),
    )


def q_minhash_lsh_dedup(spark, sf_dir):
    from nama_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=4, verify_threshold=0.5)
    return out.select("id0", "id1", F.round("jaccard", 5).alias("jaccard"))


def q_minhash_dedup_delta(spark, sf_dir):
    """Incremental MinHash dedup: odd doc_ids are the arriving delta, even
    ids the indexed corpus (minhash_band_index). Pairs touching a delta doc,
    exact-Jaccard verified — equals the full run restricted to those pairs
    (band-sharing is symmetric), which is exactly what the oracle computes."""
    from nama_spark.operators.dedup import minhash_band_index, minhash_lsh_pairs_delta

    docs = _t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    idx = minhash_band_index(old, k=3, num_hashes=16, bands=4)
    out = minhash_lsh_pairs_delta(
        new, idx, corpus_df=old, k=3, num_hashes=16, bands=4,
        verify_threshold=0.5,
    )
    return out.select("id0", "id1", F.round("jaccard", 5).alias("jaccard"))


def q_phonetic_soundex_keys(spark, sf_dir):
    """Phonetic (Soundex) blocking keys over the name universe — the classic
    ER blocker, composable with unite()/norm_key(kind='soundex'). The oracle
    recomputes Soundex from the published US-census algorithm in pure SQL
    (translate + H/W deletion + adjacent-duplicate collapse + vowel strip),
    so Spark's builtin is cross-checked against the spec itself."""
    from nama_spark.functions.normalize import soundex_key

    return _name_universe(spark, sf_dir).select(
        "string", soundex_key("string").alias("sx")
    )


def q_fingerprint_key_clusters(spark, sf_dir):
    """Key-collision clustering via the OpenRefine fingerprint (sorted
    unique lowercase words): word order/repetition collapse. Universe =
    names plus their reversed-word-order variants, which must co-cluster."""
    from nama_spark.functions.normalize import fingerprint_key
    from nama_spark.operators.matchdata import MatchData

    names = _name_universe(spark, sf_dir)
    rev = names.select(
        F.array_join(F.reverse(F.split(F.col("string"), " ")), " ").alias("string")
    )
    md = MatchData.from_unmatched(names.union(rev).distinct())
    out = md.unite(fingerprint_key)
    return out.df.select("string", "group")


def q_doc_keywords(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (rounded; ties broken on the word
    so the ranking is total in both engines)."""
    from nama_spark.functions.text import doc_keywords

    out = doc_keywords(_t(spark, sf_dir, "documents"), k=3)
    return out.select(
        "doc_id", "keyword", F.round("tfidf", 6).alias("tfidf"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_calibration_alpha_sweep(spark, sf_dir):
    """Relational calibration of the scoring model's alpha: consecutive-id
    embedding pairs labeled by class equality, Z-form XE loss summed per
    grid alpha in one shuffle (broadcast grid crossJoin). The full sweep is
    returned — argmin is a trivial driver-side epilogue."""
    from nama_spark.operators.score import alpha_loss_sweep

    # Vectors are quantized to integer milli-units FIRST: a 64-term FLOAT
    # dot product sums in engine-specific order (ulp drift that the XE
    # term's ln(1-exp(-z)) amplifies by 1/z, and that 6-dp rounding can
    # straddle). Integer dot products are exact and order-free, so both
    # engines derive bit-identical cosines. floor(x+0.5), NOT round():
    # engines disagree on exact half-tie rounding, and a single component
    # off by one milli-unit shifts the cosine by ~1e-7 — caught by the
    # sf0.1 attestation as an alpha-linear drift in the loss sums.
    vq = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * 1000 + F.lit(0.5)).cast("long"),
    )
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", vq.alias("v"), "label")
    a = emb.select(F.col("vec_id").alias("i"), F.col("v").alias("v0"),
                   F.col("label").alias("l0"))
    b = emb.select((F.col("vec_id") - 1).alias("i"), F.col("v").alias("v1"),
                   F.col("label").alias("l1"))

    def idot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    dot = idot(F.col("v0"), F.col("v1")).cast("double")
    n0 = F.sqrt(idot(F.col("v0"), F.col("v0")).cast("double"))
    n1 = F.sqrt(idot(F.col("v1"), F.col("v1")).cast("double"))
    pairs = a.join(b, "i").select(
        (dot / (n0 * n1)).alias("cos"),
        (F.col("l0") == F.col("l1")).cast("int").alias("is_match"),
    )
    # integer micro-unit summation: float totals are order-sensitive across
    # engines (observed last-ulp drift straddling any fixed rounding), so
    # the reproducible mode rounds each pair's loss to 1e-6 units and sums
    # exact BIGINTs
    # unit=1e-6 makes the y=1 z-terms EXACT integers (integer alpha x 6-dp
    # cos), so no rounding ties; eps=1e-3 floors z so the y=0 ln(1-exp(-z))
    # term amplifies engine ulp drift by at most 1e3 (far below half-unit)
    out = alpha_loss_sweep(
        pairs, grid=[float(g) for g in range(1, 31)], unit=1e-6, eps=1e-3
    )
    return out.select("alpha", "total_loss_u")


def q_simhash_delta(spark, sf_dir):
    """Incremental SimHash: odd doc_ids arrive as the delta, even ids are the
    persisted band index — pairs touching a delta doc at hamming ≤ 3. The
    16-bit banding is pigeonhole-complete at this radius, so the oracle (true
    hamming over md5-derived bits, restricted to delta-touching pairs)
    matches exactly."""
    from nama_spark.operators.dedup import simhash_band_index, simhash_near_pairs_delta

    docs = _t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    idx = simhash_band_index(old)
    return simhash_near_pairs_delta(new, idx, max_hamming=3)


def q_dedup_blocking_stats(spark, sf_dir):
    """Blocking-quality metrics for the MinHash-LSH blocker vs the exact-dup
    gold (md5(text) groups): pair completeness must be 1.0 — identical texts
    have identical signatures, hence share every band — and the reduction
    ratio says how much of the quadratic scan the bands avoided."""
    from nama_spark.operators.dedup import minhash_lsh_pairs
    from nama_spark.operators.evaluate import blocking_stats
    from nama_spark.operators.matchdata import MatchData

    docs = _t(spark, sf_dir, "documents")
    gold = MatchData(
        docs.select(
            F.col("doc_id").cast("string").alias("string"),
            F.lit(1).cast("long").alias("count"),
            F.md5("text").alias("group"),
        ),
        _relabel=False,
    )
    cand = minhash_lsh_pairs(docs, verify_threshold=None).select(
        F.col("id0").cast("string").alias("s0"),
        F.col("id1").cast("string").alias("s1"),
    )
    s = blocking_stats(cand, gold)
    return spark.createDataFrame(
        [
            (
                s["n_strings"],
                s["n_candidates"],
                s["n_gold_pairs"],
                round(s["pair_completeness"], 6),
                round(s["reduction_ratio"], 6),
            )
        ],
        "n_strings long, n_candidates long, n_gold_pairs long, "
        "pair_completeness double, reduction_ratio double",
    )


def q_text_quality_profile(spark, sf_dir):
    from nama_spark.functions.text import (
        fingerprint,
        lang_id,
        punct_ratio,
        quality_score,
        stopword_ratio,
        token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        lang_id("text").alias("lang_pred"),
        token_count("text").alias("n_tok"),
        F.round(stopword_ratio("text"), 6).alias("sw_ratio"),
        F.round(punct_ratio("text"), 6).alias("p_ratio"),
        quality_score("text").alias("quality"),
        fingerprint("text").alias("fp"),
    )


def q_ann_cosine_topk(spark, sf_dir):
    from nama_spark.operators.ann import cosine_topk_bruteforce

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 8)
    out = cosine_topk_bruteforce(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cos", 5).alias("cos"), "rank"
    )


def q_dedup_paragraphs(spark, sf_dir):
    """CCNet-style paragraph dedup (dedup_paragraphs, dedup.py): documents
    are synthesized as 3-doc sliding windows joined with newlines, so every
    interior text is corpus-boilerplate (appears in ≥2 synthetic docs) and
    only the window-edge paragraphs survive; survivors reassemble in
    original order. Explode → hash-df groupBy → anti join → ordered
    re-assembly, all JVM-side."""
    from nama_spark.operators.dedup import dedup_paragraphs

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select(
        "doc_id", "text"
    )
    b = d.select(F.col("doc_id").alias("did"), F.col("text").alias("t1"))
    c = d.select(F.col("doc_id").alias("did2"), F.col("text").alias("t2"))
    synth = (
        d.join(b, d["doc_id"] + 1 == b["did"])
        .join(c, d["doc_id"] + 2 == c["did2"])
        .select("doc_id", F.concat_ws("\n", "text", "t1", "t2").alias("text"))
    )
    return dedup_paragraphs(synth, min_df=2)


def q_ann_quantized_topk(spark, sf_dir):
    """int8-quantized cosine top-k (quantize_embeddings, embed.py): q_i =
    floor(v_i·127 + 0.5); integer dot products are exact and order-free, so
    both engines derive bit-identical cosines (the calibration_alpha_sweep
    cross-engine-float lesson applied to vectors). 4× narrower vectors at
    100 TB; labeled bruteforce candidate shape like ann_cosine_topk."""
    from nama_spark.operators.embed import (
        quantize_vec_expr,
        quantized_cosine_expr,
    )
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", quantize_vec_expr("embedding").alias("qvec")
    )
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("q0")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("qvec").alias("q1"))
    cand = c.crossJoin(F.broadcast(q)).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("cos", quantized_cosine_expr(F.col("q0"), F.col("q1")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", F.round("cos", 5).alias("cos"), "rank")
    )


def q_embedding_threshold_pairs(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    from nama_spark.operators.ann import cosine_sim_expr

    a = emb.select(F.col("vec_id").alias("id0"), F.col("embedding").alias("v0"))
    b = emb.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
    pairs = a.join(b, F.col("id0") < F.col("id1"))
    cos = cosine_sim_expr(F.col("v0"), F.col("v1"))
    return (
        pairs.withColumn("cos", cos)
        .where(F.col("cos") >= 0.5)
        .select("id0", "id1", F.round("cos", 5).alias("cos"))
    )


def q_pipeline_cluster_flagship(spark, sf_dir):
    """Two-pass flagship (exact-key + token-sim, fused CC) — fully
    oracle-checked: the DuckDB side replicates both edge sets and closes them
    with a recursive CTE."""
    from nama_spark.plans.pipeline import ExactKeyPass, MatchPipeline, TokenSimPass

    records = _variants(spark, sf_dir).withColumnRenamed("string", "repo")
    pipe = MatchPipeline(
        passes=[ExactKeyPass(key="simplify_corp"), TokenSimPass(threshold=0.7)]
    )
    md, _ = pipe.run(records, string_col="repo")
    return md.df


def q_pipeline_cluster_flagship_3pass(spark, sf_dir):
    """Full three-pass flagship (B1 exact-key + B2 token-sim + B3 embedding),
    fully oracle-checked: the embedding pass runs the engine-portable md5
    feature-hashing embedder (embed_strings_md5 — the SAME mapInPandas Arrow
    path as the rp embedder, but md5 bit math DuckDB recomputes exactly, like
    the simhash/multimodal oracles) with candidate_mode="bruteforce" so LSH
    approximation cannot diverge from the SQL-exact edge set at this ~64-norm
    scale. Oracle = exact-key ∪ token-sim ∪ embedding-cos≥0.75 edges →
    recursive-CTE closure (reference semantics embeddings.py:144-174). The
    production rp-embedder + LSH path stays exercised by entry() and the
    recall pytests."""
    import math

    from nama_spark.plans.pipeline import (
        EmbeddingPass,
        ExactKeyPass,
        MatchPipeline,
        TokenSimPass,
    )

    records = _variants(spark, sf_dir).withColumnRenamed("string", "repo")
    pipe = MatchPipeline(
        passes=[
            ExactKeyPass(key="simplify_corp"),
            TokenSimPass(threshold=0.7),
            # calibrated p = exp(−α(1−cos_t)) with α=20, cos_t=0.75
            EmbeddingPass(
                threshold=math.exp(-20.0 * (1.0 - 0.75)),
                model="md5",
                dim=16,
                candidate_mode="bruteforce",
            ),
        ]
    )
    md, _ = pipe.run(records, string_col="repo")
    return md.df


def q_near_dup_clusters_cc(spark, sf_dir):
    from nama_spark.operators.dedup import near_dup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = _doc_shingle_pairs(spark, sf_dir, threshold=0.5)
    return near_dup_clusters(pairs, docs.select("doc_id"))


def q_select_canonical_docs(spark, sf_dir):
    """dedup.select_canonical_docs: one survivor per shingle-jaccard ≥ 0.5
    near-dup cluster — the LONGEST member (priority = n_chars, ties →
    min doc_id), the FineWeb keep-the-best policy instead of the arbitrary
    min-id default. Cluster-key aggs only (no windows), so a giant cluster
    never lands in one task's sort."""
    from nama_spark.operators.dedup import near_dup_clusters, select_canonical_docs

    docs = _t(spark, sf_dir, "documents")
    pairs = _doc_shingle_pairs(spark, sf_dir, threshold=0.5)
    clusters = near_dup_clusters(pairs, docs.select("doc_id"))
    return select_canonical_docs(docs, clusters, priority_col="n_chars").select(
        "doc_id", "lang", "source", "n_chars"
    )


def q_ngram_lm_surprisal(spark, sf_dir):
    """lm.ngram_lm_surprisal (CCNet perplexity gate, integer-exact twin):
    a bigram count model fit on the doc_id % 3 != 0 slice scores the
    held-out slice by whole-bit Laplace surprisal (floor-log2 of exact
    integer counts — bit-identical cross-engine where float log-prob sums
    are not). Fit = one explode + groupBy on the reference; scoring is two
    equi-joins on the context key."""
    from nama_spark.operators.lm import ngram_lm_fit, ngram_lm_surprisal

    d = _t(spark, sf_dir, "documents")
    model = ngram_lm_fit(d.where(F.col("doc_id") % 3 != 0), n=2)
    return ngram_lm_surprisal(d.where(F.col("doc_id") % 3 == 0), model, n=2)


def q_lm_perplexity_buckets(spark, sf_dir):
    """lm.perplexity_buckets — the canonical CCNet head/middle/tail cut
    (Wenzek et al. 2020 §4.3) on the ngram_lm_surprisal setup: rank the
    held-out slice by integer milli-bits-per-token via the distributed
    global_rank (no Exchange SinglePartition) and tertile by integer
    rank arithmetic — no percentile interpolation, engine-portable."""
    from nama_spark.operators.lm import ngram_lm_fit, perplexity_buckets

    d = _t(spark, sf_dir, "documents")
    model = ngram_lm_fit(d.where(F.col("doc_id") % 3 != 0), n=2)
    return perplexity_buckets(d.where(F.col("doc_id") % 3 == 0), model, n=2)


def q_url_dedup(spark, sf_dir):
    """dedup.url_dedup over deterministic synthetic URLs (fixture has no
    URL column): five variants per doc-group — default-port + tracking
    params, www + pre-sorted params, fragment + unsorted params, a distinct
    https host, and an unparseable string. The first three canonicalize
    identically (case/port/www/fragment/utm/trailing-slash/param-sort
    rules, functions/url.py), so each group of 5 collapses to 3 canonical
    pages. One hash groupBy on the short normalized key — no text moves."""
    from nama_spark.operators.dedup import url_dedup

    d = _t(spark, sf_dir, "documents")
    did, k = F.col("doc_id"), (F.col("doc_id") / 5).cast("long").cast("string")
    synth = d.select(
        "doc_id",
        F.when(did % 5 == 0, F.concat(
            F.lit("HTTP://Example.com:80/p/"), k, F.lit("/?utm_source=x&b=2&a=1")
        )).when(did % 5 == 1, F.concat(
            F.lit("http://www.example.com/p/"), k, F.lit("?a=1&b=2")
        )).when(did % 5 == 2, F.concat(
            F.lit("http://example.com/p/"), k, F.lit("/?b=2&a=1#s")
        )).when(did % 5 == 3, F.concat(
            F.lit("https://Shop.example.com:443/item/"), k
        )).otherwise(F.concat(F.lit("plain text "), k)).alias("url"),
    )
    return url_dedup(synth)


def q_semdedup_embeddings(spark, sf_dir):
    """embed.semdedup (Abbas et al. 2023): semantic dedup over the
    embeddings table with a deterministic 8-cell quantizer (cells = the
    first 8 vectors, the oracle-replayable injection seam; production fits
    sampled k-means). int8-quantized cosines throughout — every similarity
    is integer-dot/sqrt, bit-identical cross-engine — cell equi-join
    candidates, CC duplicate groups, keep-the-boundary-member election."""
    from nama_spark.operators.embed import semdedup

    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.col("embedding").alias("centroid"),
    )
    return semdedup(emb, threshold=0.4, centroids=cents)


def q_corpus_split_leakfree(spark, sf_dir):
    """Dedup-aware train/val split: near-dup clusters (shingle-jaccard ≥ 0.5
    CC) land wholly in one split via an md5 hash of the cluster id —
    documents never leak near-duplicates across the boundary."""
    from nama_spark.operators.dedup import split_documents_leakfree

    docs = _t(spark, sf_dir, "documents")
    pairs = _doc_shingle_pairs(spark, sf_dir, threshold=0.5)
    return split_documents_leakfree(docs, pairs, val_fraction=0.2, seed=7)


def q_chunk_documents(spark, sf_dir):
    """Token-window chunking (32-token chunks, 8-token overlap) — training
    example preparation; pure array exprs with the token array materialized
    before the windowing transform."""
    from nama_spark.functions.text import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


def q_pack_chunks(spark, sf_dir):
    """Chunk → pack composition: 32/8 token chunks first-fit-packed into
    512-token training sequences by running count in deterministic
    (doc_id, chunk_seq) order."""
    from nama_spark.functions.text import chunk_documents, pack_chunks

    chunks = chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )
    return pack_chunks(chunks, budget_tokens=512)


def q_dup_span_profile(spark, sf_dir):
    """Duplicated-span profile (dedup.duplicated_span_profile — the
    ExactSubstr signal of Lee et al., ACL 2022, as a relational twin):
    per-doc fraction of k-token windows occurring ≥ 2 times corpus-wide,
    every occurrence counted (within- and cross-doc). k=4 on the
    tiny-vocab synthetic corpus yields a real spread (369/500 docs with
    some duplication, 47 heavy at sf0.01)."""
    from nama_spark.operators.dedup import duplicated_span_profile

    out = duplicated_span_profile(_t(spark, sf_dir, "documents"), k=4)
    return out.select(
        "doc_id", "n_windows", "n_dup", F.round("dup_frac", 6).alias("dup_frac")
    )


def q_drop_dup_span_docs(spark, sf_dir):
    """dedup.drop_duplicated_span_docs end-to-end: documents whose k=4
    duplicated-window fraction exceeds 20% removed (the document-level
    action on the Lee et al. signal — catches mostly-verbatim pages that
    whole-doc MinHash misses). Schema-preserving semi-join."""
    from nama_spark.operators.dedup import drop_duplicated_span_docs

    docs = _t(spark, sf_dir, "documents")
    return drop_duplicated_span_docs(docs, k=4, max_dup_frac=0.2).select(
        "doc_id", "lang", "source", "n_chars"
    )


def q_remove_dup_spans(spark, sf_dir):
    """dedup.remove_duplicated_spans — the span-level ExactSubstr ACTION
    (Lee et al., ACL 2022: the released tool removes EVERY occurrence of
    a duplicated substring): cut each token covered by a duplicated k=4
    window and reassemble survivors in original order. Complements the
    document-level gate (drop_dup_span_docs) the way dedup_paragraphs
    complements exact dedup."""
    from nama_spark.operators.dedup import remove_duplicated_spans

    return remove_duplicated_spans(
        _t(spark, sf_dir, "documents"), k=4, min_occ=2
    )


def q_quality_classifier_score(spark, sf_dir):
    """Model-based quality scoring (operators/classifier.py — the
    fastText / FineWeb-Edu-style filter): NB-share integer weights fit
    on the lang='en' slice vs the rest over md5-hashed bag-of-words
    (n=4096, the engine-portable hash), then the integer-exact
    weight·count dot product for every document. Production training is
    logreg_fit (relational gradient descent, pytest-verified); this
    closed-form twin keeps the whole scoring path in BIGINT arithmetic
    so it verifies bit-for-bit cross-engine."""
    from nama_spark.operators.classifier import (
        hashed_token_features,
        nb_share_score,
        nb_share_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    feats = hashed_token_features(
        docs, n_features=4096, hash="md5"
    ).localCheckpoint(eager=False)
    en = docs.where(F.col("lang") == "en").select("doc_id")
    weights = nb_share_weights(
        feats.join(en, "doc_id", "left_semi"),
        feats.join(en, "doc_id", "left_anti"),
    )
    return nb_share_score(feats, weights)


def q_events_asof_click(spark, sf_dir):
    """temporal.asof_join — the time-series enrichment join Spark lacks
    natively (pandas merge_asof / DuckDB ASOF JOIN semantics): every
    purchase event gets the user's latest click value at-or-before the
    purchase. Realized as union + ONE keyed carry-forward window (no
    range explode, no BNLJ); the right side is pre-aggregated to unique
    (user, ts) so the match is deterministic. Timestamps emitted as
    epoch micros (integer-exact cross-engine)."""
    from nama_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").groupBy(
        "user_id", "ts"
    ).agg(F.max("value").alias("click_value"))
    out = asof_join(purchases, clicks, on="ts", by="user_id")
    return out.select(
        "event_id",
        "user_id",
        # fixture ts is TIMESTAMP_NTZ; cast through TIMESTAMP (session tz
        # pinned UTC) so epoch micros match DuckDB's epoch_us exactly
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.unix_micros(F.col("ts_r").cast("timestamp")).alias("click_ts_us"),
        F.round("click_value_r", 6).alias("click_value"),
    )


def q_events_interval_join(spark, sf_dir):
    """temporal.interval_join — the range-join sibling of as-of: every
    purchase inside the user's first-signup 2-hour window. Buckets the
    time axis (hourly), explodes each interval into its O(1) covered
    buckets, hash equi-join + exact [start, end) filter — never a
    CartesianProduct; DuckDB's planner runs the same statement as a
    native range join, making it the oracle."""
    from nama_spark.operators.temporal import interval_join

    ev = _t(spark, sf_dir, "events")
    sec = lambda c: F.unix_micros(F.col(c).cast("timestamp")) / F.lit(1e6)
    pts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", sec("ts").alias("ts_sec")
    )
    iv = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(sec("ts")).alias("start"))
        .withColumn("end", F.col("start") + F.lit(7200.0))
    )
    out = interval_join(
        pts, iv, on="ts_sec", by="user_id", bucket_sec=3600
    )
    return out.select(
        "event_id",
        "user_id",
        (F.col("ts_sec") * 1e6).cast("long").alias("ts_us"),
        (F.col("start_i") * 1e6).cast("long").alias("start_us"),
    )


def q_lang_id_trained(spark, sf_dir):
    """Trained language identification (classifier.nb_share_multiclass_*
    — the fastText lang-ID shape with the integer-exact NB-share
    weights): fit per-(lang, feature) weights on the doc_id % 4 != 0
    slice, classify the held-out quarter. All-BIGINT scores and a
    (score desc, class asc) winner make predictions deterministic and
    hash-exact cross-engine. (Fixture langs share one vocabulary, so
    accuracy is frequency-driven — the row verifies the computation;
    semantic separation is pytest-verified on a separable fixture.)"""
    from nama_spark.operators.classifier import (
        hashed_token_features,
        nb_share_classify,
        nb_share_multiclass_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    feats = hashed_token_features(
        docs, n_features=4096, hash="md5"
    ).localCheckpoint(eager=False)
    train = docs.where(F.col("doc_id") % 4 != 0).select(
        "doc_id", F.col("lang").alias("class")
    )
    weights = nb_share_multiclass_weights(feats, train)
    held = feats.join(
        docs.where(F.col("doc_id") % 4 == 0).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    return nb_share_classify(held, weights).select(
        "doc_id", F.col("class").alias("pred_lang"), "score_milli"
    )


def q_dsir_hbits_score(spark, sf_dir):
    """DSIR importance scores (classifier.dsir_weights/dsir_score — Xie
    et al., NeurIPS 2023): hashed-unigram LM log-ratio of the lang='en'
    target slice vs the rest, scored per document. The board row hashes
    the integer HALF-BIT twin (floor_log2 of squared smoothed counts —
    bit-lengths are engine-independent, the lm.py surprisal trick); the
    float w_log2 path drives dsir_resample and is pytest-verified."""
    from nama_spark.operators.classifier import (
        dsir_score,
        dsir_weights,
        hashed_token_features,
    )

    docs = _t(spark, sf_dir, "documents")
    feats = hashed_token_features(
        docs, n_features=4096, hash="md5"
    ).localCheckpoint(eager=False)
    en = docs.where(F.col("lang") == "en").select("doc_id")
    weights = dsir_weights(
        feats.join(en, "doc_id", "left_semi"),
        feats.join(en, "doc_id", "left_anti"),
    )
    return dsir_score(feats, weights).select(
        "doc_id", "n_toks", "logit_hbits"
    )


def q_bpe_pair_counts(spark, sf_dir):
    """BPE training objective, first iteration (bpe.pair_counts over the
    initial character symbols — Sennrich et al. 2016): adjacent-pair
    frequencies over the word-frequency table, end-of-word marker on the
    last character. The iterative merge loop itself is pytest-verified
    against a from-spec Python oracle (test_bpe.py); this row pins the
    one aggregation every merge iteration repeats."""
    from nama_spark.operators.bpe import (
        _initial_symbols,
        pair_counts,
        word_counts,
    )

    docs = _t(spark, sf_dir, "documents")
    return pair_counts(_initial_symbols(word_counts(docs))).select(
        F.col("left").alias("l_sym"),
        F.col("right").alias("r_sym"),
        "cnt",
    )


def q_repetition_profile(spark, sf_dir):
    """Gopher repetition signals (corpus.repetition_profile — Rae et al.
    2021, Table A1): per-doc char-mass of the most repeated 2-/3-gram and
    of all duplicated 2-/5-grams, plus the normalized char count. Emitted
    as exact integers (fractions are chars/n_chars_norm) so the oracle
    compares without float rounding-tie hazards."""
    from nama_spark.operators.corpus import repetition_profile

    return repetition_profile(
        _t(spark, sf_dir, "documents"), top_ns=(2, 3), dup_ns=(2, 5)
    )


def q_gopher_repetition_filter(spark, sf_dir):
    """corpus.gopher_repetition_filter end-to-end: documents failing any
    repetition rule removed (top-2 > 8%, top-3 > 6%, dup-5 > 10% of
    normalized chars — thresholds scaled to the tiny-vocab fixture;
    Gopher's own Table A1 values are the operator defaults). Integer
    arithmetic gate; keeps 182/500 at sf0.01."""
    from nama_spark.operators.corpus import gopher_repetition_filter

    docs = _t(spark, sf_dir, "documents")
    return gopher_repetition_filter(
        docs, top_thresholds={2: 0.08, 3: 0.06}, dup_thresholds={5: 0.10}
    ).select("doc_id", "lang", "source", "n_chars")


def q_cap_per_domain(spark, sf_dir):
    """corpus.cap_per_domain (RefinedWeb-style anti-over-representation):
    at most 70 documents per language, chosen by the seed-keyed u48 hash
    (deterministic random sample the oracle replays). At sf0.01 the cap
    binds en/zh/es (and de exactly) but not fr — 344/500 survive. The
    two-phase salted window keeps any hot domain's final sort bounded at
    n_salts x cap rows."""
    from nama_spark.operators.corpus import cap_per_domain

    return cap_per_domain(
        _t(spark, sf_dir, "documents"), 70, domain_col="lang"
    ).select("doc_id", "lang", "source", "n_chars")


def q_redact_pii_docs(spark, sf_dir):
    """corpus.redact_documents (Dolma/FineWeb-style in-place PII masking):
    fixture text carries no PII, so each doc is dressed with deterministic
    synthetic PII — every doc an email, every 2nd a phone, every 3rd an
    IPv4, every 5th an SSN-shaped id — then counted and redacted with
    typed placeholders. Pure regexp column expressions in the common
    Java-regex ∩ RE2 dialect, so the identical pattern strings drive the
    DuckDB oracle; zero shuffles."""
    from nama_spark.operators.corpus import redact_documents

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    synth = d.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 80),
            F.lit(" contact u"), did.cast("string"), F.lit("@Example-mail.org"),
            F.when(did % 2 == 0, F.lit(" call 555-867-5309 now")).otherwise(F.lit("")),
            F.when(did % 3 == 0, F.concat(
                F.lit(" from 10."), (did % 250).cast("string"), F.lit(".0.42 ok")
            )).otherwise(F.lit("")),
            F.when(did % 5 == 0, F.lit(" id 123-45-6789 end")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_documents(synth).select(
        "doc_id", "text", "n_email", "n_ssn", "n_phone", "n_ipv4"
    )


def _c4_synth_lines(spark, sf_dir):
    """Deterministic multi-line web-page dressing for the C4 line-rule
    queries (fixture text has no newlines): two content sentences built
    from the doc's own text plus bullet / ellipsis / JS boilerplate, a
    lorem-ipsum block on every 7th doc, a code-brace line on every 11th,
    and a degenerate short line replacing the second sentence on every
    13th."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    return d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.substring("text", 1, 60), F.lit(" end.")),
            F.lit("- nav menu item"),
            F.lit("Click here to read more..."),
            F.when(did % 13 == 0, F.lit("tiny.")).otherwise(
                F.concat(F.substring("text", 21, 50), F.lit(" fine!"))
            ),
            F.lit("Please enable JavaScript to continue."),
            F.when(did % 7 == 0, F.lit("the lorem ipsum block sits here.")),
            F.when(did % 11 == 0, F.lit("function() { return 0; }")),
        ).alias("text"),
    )


def q_c4_line_filter(spark, sf_dir):
    """corpus.c4_line_filter (Raffel et al. 2020 §2.2 line rules): keep
    terminal-punctuation lines with ≥ 3 words, drop bullet / ellipsis /
    javascript boilerplate lines, drop lorem-ipsum and curly-brace pages
    whole, and drop pages with < 2 surviving lines. One posexplode, one
    groupBy re-assembly — the dedup_paragraphs shape."""
    from nama_spark.operators.corpus import c4_line_filter

    return c4_line_filter(_c4_synth_lines(spark, sf_dir), min_kept_lines=2)


def q_line_quality_profile(spark, sf_dir):
    """corpus.line_quality_profile: per-document counts of the line shapes
    the C4/Gopher rules gate on (terminal-punct, bullet, ellipsis, short
    lines) — integer counts from string predicates, exact cross-engine."""
    from nama_spark.operators.corpus import line_quality_profile

    return line_quality_profile(_c4_synth_lines(spark, sf_dir))


def q_decontam_overlap(spark, sf_dir):
    """Benchmark-decontamination overlap report (corpus.ngram_overlap —
    Brown et al. 2020 appendix C): the held-out "benchmark" is the
    doc_id % 37 == 0 slice of the corpus, the training side is the rest,
    and each training doc reports the fraction of its distinct 3-word-gram
    set that collides with the benchmark. The eval n-gram set is broadcast;
    the corpus never shuffles wide. n=3 (not the production 8/13) because
    the synthetic corpus draws from a tiny vocabulary — it yields a spread
    of fractions (312 of 486 docs hit) instead of a degenerate all-zero."""
    from nama_spark.operators.corpus import ngram_overlap

    docs = _t(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 37 == 0)
    tr = docs.where(F.col("doc_id") % 37 != 0)
    out = ngram_overlap(tr, ev, n=3)
    return out.select(
        "doc_id", "n_ngrams", "n_hit", F.round("overlap_frac", 6).alias("overlap_frac")
    )


def q_decontaminate_docs(spark, sf_dir):
    """corpus.decontaminate end-to-end: the training slice with docs whose
    3-gram overlap against the doc_id % 37 == 0 benchmark exceeds 5%
    REMOVED (left-semi join through the overlap gate; schema-preserving)."""
    from nama_spark.operators.corpus import decontaminate

    docs = _t(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 37 == 0)
    tr = docs.where(F.col("doc_id") % 37 != 0)
    return decontaminate(tr, ev, n=3, max_overlap=0.05).select(
        "doc_id", "lang", "source", "n_chars"
    )


def q_mixture_rates_lang(spark, sf_dir):
    """Temperature-based domain mixture rates (corpus.mixture_rates,
    Arivazhagan et al. 2019) over the naturally-skewed lang column
    (en 218 / zh 75 / es 73 / de 70 / fr 64 at sf0.01): rate ∝ n^(1/T−1),
    max-normalized. Rounded to 9 dp — pow() may differ by an ulp between
    libm implementations; 9 dp absorbs it (the calibration-oracle lesson)."""
    from nama_spark.operators.corpus import mixture_rates

    docs = _t(spark, sf_dir, "documents")
    out = mixture_rates(docs, temperature=2.0, domain_col="lang")
    return out.select("domain", "n_docs", F.round("rate", 9).alias("rate"))


def q_mixture_sample_docs(spark, sf_dir):
    """Deterministic mixture down-sample (corpus.sample_mixture) at hand-set
    per-lang rates — exact literals so the keep decision u48(doc_id, seed) <
    rate is bit-replayable by the oracle (no pow in the comparison). The
    missing domains (zh, es) exercise the drop-unknown-domain rule."""
    from nama_spark.operators.corpus import sample_mixture

    docs = _t(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [("en", 0.25), ("de", 0.5), ("fr", 1.0)], ["domain", "rate"]
    )
    out = sample_mixture(docs, rates, seed=0, domain_col="lang")
    return out.select("doc_id", "lang", "source")


def q_shuffle_shard_docs(spark, sf_dir):
    """Deterministic shuffle-shard (corpus.shuffle_shard): seed-keyed u48
    permutation realized through block.global_rank (range partition +
    offset prefix sum — no Exchange SinglePartition), dealt round-robin
    into 4 exactly-balanced shards. The oracle replays the permutation
    from the same md5 math."""
    from nama_spark.operators.corpus import shuffle_shard

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return shuffle_shard(docs, n_shards=4, seed=1)


def q_corpus_profile(spark, sf_dir):
    """Per-language corpus profile: doc counts, exact char totals, exact
    median/p90 lengths (Spark `percentile` and DuckDB `quantile_cont` share
    linear-interpolation semantics — verified exact on integer inputs),
    distinct sources."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.percentile("n_chars", 0.5), 4).alias("median_chars"),
        F.round(F.percentile("n_chars", 0.9), 4).alias("p90_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


def q_simhash_near_pairs(spark, sf_dir):
    """SimHash near-pairs — oracle-checked: the 16-bit banding is
    pigeonhole-complete for hamming ≤ 3 (4 bands, ≤3 differing bits → ≥1 band
    equal), so the banded result equals the exact all-pairs set the DuckDB
    oracle computes from the same md5 bit math."""
    from nama_spark.operators.dedup import simhash_near_pairs

    out = simhash_near_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)
    return out.select("id0", "id1", F.col("hamming").cast("long").alias("hamming"))


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed top-k — oracle-checked against the exact top-k: at these
    parameters (12 tables, bucket_length 3.0, max_distance 50, seed 42) the
    bucketed join has measured recall 1.0 on this dataset, deterministically
    (fixed seed), so the approximate result IS the exact result. The
    recall-1.0 assumption is pinned by tests/test_dataops.py."""
    from nama_spark.operators.ann import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    out = lsh_topk(emb, queries, k=5, num_hash_tables=12, bucket_length=3.0,
                   max_distance=50.0)
    return out.select(
        "query_id", "neighbor_id", F.round("cos", 5).alias("cos"), "rank"
    )


def q_ann_ivf_topk(spark, sf_dir):
    """IVF top-k with nprobe = n_cells (all cells probed) — oracle-checked
    against the exact top-k: probing every cell makes the result exact by
    construction, so the oracle verifies the IVF machinery end-to-end
    (k-means cell assignment, centroid probe ranking, per-cell re-rank).
    The genuinely-approximate nprobe < n_cells path is recall-tested in
    tests/test_dataops.py."""
    from nama_spark.operators.ann import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    out = ivf_topk(emb, queries, k=5, n_cells=8, nprobe=8)
    return out.select(
        "query_id", "neighbor_id", F.round("cos", 5).alias("cos"), "rank"
    )


def q_ann_ivf2_topk(spark, sf_dir):
    """TWO-LEVEL IVF top-k (coarse quantizer: ann.ivf2_fit_centroids +
    two-stage ivf_assign) with every cell probed — exact by construction,
    so the same bruteforce oracle verifies the whole two-level machinery:
    coarse k-means, per-coarse fine k-means (applyInPandas numpy Lloyd),
    derived coarse routing, two-stage probe, per-cell re-rank. The
    approximate partial-probe path and the constant-occupancy claim are
    tested in tests/test_dataops.py."""
    from nama_spark.operators.ann import (
        ivf2_fit_centroids,
        ivf_assign,
        ivf_topk_delta,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    centers = ivf2_fit_centroids(emb, n_coarse=3, fine_per_coarse=3)
    centers = centers.localCheckpoint(eager=False)
    assigned = ivf_assign(emb, centers)
    total = centers.count()
    out = ivf_topk_delta(queries, centers, assigned, k=5, nprobe=total)
    return out.select(
        "query_id", "neighbor_id", F.round("cos", 5).alias("cos"), "rank"
    )


def q_ann_pq_topk(spark, sf_dir):
    """Product-quantization top-k (pq_fit_codebooks → pq_encode → pq_topk;
    Jégou et al., TPAMI 2011) with the exact-refine shortlist covering the
    WHOLE corpus (refine_factor·k ≥ n) — exact by construction, so the
    bruteforce oracle verifies the full PQ machinery end-to-end: the
    per-subspace codebook fit (applyInPandas numpy Lloyd), the Arrow batch
    encoder, the per-query ADC lookup table, the codes-only candidate scan,
    and the exact-cosine refine re-rank. The genuinely-approximate
    bounded-shortlist path is recall-tested in tests/test_dataops.py."""
    from nama_spark.operators.ann import pq_encode, pq_fit_codebooks, pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    books = pq_fit_codebooks(emb, m=8, k=16).localCheckpoint(eager=False)
    encoded = pq_encode(emb, books)
    # shortlist must cover the corpus at ANY sf for the exactness anchor:
    # refine_factor*k >= n (caught by the sf0.1 attestation at a fixed 100)
    rf = (emb.count() + 4) // 5
    out = pq_topk(queries, books, encoded, k=5, refine=emb, refine_factor=rf)
    return out.select(
        "query_id", "neighbor_id", F.round("cos", 5).alias("cos"), "rank"
    )


def q_ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composition (ivf_fit_centroids + ivf_assign + pq_encode →
    ivfpq_topk) with every cell probed and the refine shortlist covering the
    whole corpus — exact by construction, so the bruteforce oracle verifies
    the composed index end-to-end: cell assignment, the (cell, id, codes)
    index join, the broadcast ADC LUT, cross-cell dedupe, and the exact
    refine. Partial-probe recall is tested in tests/test_dataops.py."""
    from nama_spark.operators.ann import (
        ivf_assign,
        ivf_fit_centroids,
        ivfpq_topk,
        pq_encode,
        pq_fit_codebooks,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    centers = ivf_fit_centroids(emb, n_cells=8).localCheckpoint(eager=False)
    books = pq_fit_codebooks(emb, m=8, k=16).localCheckpoint(eager=False)
    encoded = ivf_assign(emb, centers).join(pq_encode(emb, books), "vec_id")
    out = ivfpq_topk(
        queries, centers, encoded, books,
        k=5, nprobe=8, refine=emb, refine_factor=(emb.count() + 4) // 5,
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cos", 5).alias("cos"), "rank"
    )


def q_embedding_unite_similar(spark, sf_dir):
    """Fast-path unite_similar (_fast_unite_similar, embeddings.py:144-174)
    over the fixed embeddings table — oracle-checked: the result partition is
    exactly the connected components of the dot ≥ 0.3 graph (threshold
    pushdown p=exp(−α(1−cos_t)) with α=20 → cos_t=0.3). Vectors are stored
    unit-norm, so the raw dot is the cosine; both sides sum the same doubles
    in array order. The LSH candidate path is exercised by
    pipeline_cluster_flagship_3pass and the recall pytest."""
    import math

    from nama_spark.operators.embed import unite_similar
    from nama_spark.operators.matchdata import MatchData

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("string"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    base = (
        emb.select("string")
        .withColumn("count", F.lit(1).cast("long"))
        .withColumn("group", F.col("string"))
    )
    md = MatchData(base, _relabel=False)
    out = unite_similar(
        md, emb, threshold=math.exp(-20.0 * (1.0 - 0.3)), candidate_mode="bruteforce"
    )
    return out.df


def q_assign_records(spark, sf_dir):
    """assign_records: the name-scale→file-scale join-back (pipeline.py) —
    cluster labels from the 2-pass flagship joined onto the record rows.
    Oracle = the flagship oracle joined back to the variant universe."""
    from nama_spark.plans.pipeline import (
        ExactKeyPass,
        MatchPipeline,
        TokenSimPass,
        assign_records,
    )

    records = _variants(spark, sf_dir).withColumnRenamed("string", "repo")
    pipe = MatchPipeline(
        passes=[ExactKeyPass(key="simplify_corp"), TokenSimPass(threshold=0.7)]
    )
    md, _ = pipe.run(records, string_col="repo")
    return assign_records(records, md, string_col="repo").select(
        "repo", "entity_group"
    )


def q_unite_nearest_voronoi(spark, sf_dir):
    """unite_nearest (voronoi seed assignment, embeddings.py:461-514) over
    the fixed embeddings table: every vector joins its nearest of 5 seed
    vectors (cos desc, seed asc tie-break); labels re-elected as the group's
    min string."""
    from nama_spark.operators.embed import unite_nearest
    from nama_spark.operators.matchdata import MatchData

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("string"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    base = (
        emb.select("string")
        .withColumn("count", F.lit(1).cast("long"))
        .withColumn("group", F.col("string"))
    )
    md = MatchData(base, _relabel=False)
    seeds = [str(i) for i in range(5)]
    out = unite_nearest(md, emb, seeds, threshold=0.0)
    return out.df


def q_events_dedup_first(spark, sf_dir):
    """streaming_dedup_key (earliest event per key — the batch equivalent of
    dropDuplicates-with-watermark) keyed on (user_id, event_type)."""
    from nama_spark.streaming.windows import streaming_dedup_key

    out = streaming_dedup_key(
        _t(spark, sf_dir, "events"),
        key_cols=("user_id", "event_type"),
        tie_cols=("event_id",),
    )
    return out.select(
        "user_id", "event_type", "event_id", F.round("value", 6).alias("value")
    )


def q_winnow_near_pairs(spark, sf_dir):
    """Winnowed-fingerprint near-dup pairs (MOSS sketch) over documents —
    pure array exprs, md5 domain so the oracle recomputes identically."""
    from nama_spark.operators.dedup import winnow_near_pairs

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 250)
    out = winnow_near_pairs(docs, k=8, window=4, threshold=0.2, max_df=1000)
    return out.select("id0", "id1", F.round("jaccard", 5).alias("jaccard"))


def q_prefix_join_pairs(spark, sf_dir):
    """PPJoin-style prefix-filtered EXACT set-similarity self-join — no
    doc-frequency cap, no O(n²): every pair with weighted jaccard ≥ 0.25
    including pairs whose only shared tokens are hot. Oracle = full
    enumeration over shared-token pairs. (Threshold 0.25: the sf0.01 word
    universe scores shared-token pairs at exactly 1/3.)"""
    from nama_spark.functions.tokenize import token_weights, tokens_table
    from nama_spark.operators.block import prefix_filtered_pairs

    toks = tokens_table(_name_universe(spark, sf_dir), tokenizer="words")
    w = token_weights(toks, weighting="tf-idf")
    out = prefix_filtered_pairs(toks, w, threshold=0.25)
    return out.select("s0", "s1", F.round("score", 5).alias("score"))


def q_pair_losses(spark, sf_dir):
    """iter_scores assembled end-to-end (embeddings.py:536-625): scored pair
    stream over the embeddings table with the `label` column as the current
    partition — calibrated score + XE loss (count-weighted form; counts are 1
    so the weight is 1 and loss = plain-loss², the reference's
    loss *= weights*loss). min_score pushes the cos ≥ 0.3 threshold into the
    candidate join."""
    import math

    from nama_spark.operators.embed import iter_scores
    from nama_spark.operators.matchdata import MatchData

    emb = _t(spark, sf_dir, "embeddings")
    vecs = emb.select(
        F.col("vec_id").cast("string").alias("string"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    md = MatchData(
        emb.select(
            F.col("vec_id").cast("string").alias("string"),
            F.lit(1).cast("long").alias("count"),
            F.col("label").cast("string").alias("group"),
        ),
        _relabel=False,
    )
    out = iter_scores(md, vecs, min_score=math.exp(-20.0 * (1.0 - 0.3)))
    return out.select(
        "string0",
        "string1",
        "group0",
        "group1",
        F.round("cos", 5).alias("cos"),
        F.round("score", 6).alias("score"),
        F.round("loss", 6).alias("loss"),
        "is_match",
    )


def q_multimodal_image_features(spark, sf_dir):
    """Multimodal decode plumbing, oracle-checked: the fake decoder derives
    width/height/luma from sha256 bytes of the payload (multimodal.py
    _decode_image_fake), which DuckDB recomputes with its own sha256 — so the
    mapInPandas Arrow path is verified end-to-end against SQL. The seeded
    feature VECTOR (numpy RNG) is not SQL-expressible; its shape/determinism
    is pinned by tests/test_dataops.py::test_multimodal_plumbing."""
    from nama_spark.operators.multimodal import (
        extract_image_features,
        media_from_documents,
    )

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    feats = extract_image_features(media, fake=True, dim=8)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("mean_luma").cast("double"), 5).alias("mean_luma"),
    )


def q_sorted_neighborhood_pairs(spark, sf_dir):
    """Sorted-neighborhood blocking (Hernández & Stolfo SIGMOD'95) over the
    name universe keyed by simplify_corp, window 3 — every string paired with
    its 2 successors in (key, string) sort order. The Spark side ranks via
    range partitioning + offset prefix-sum (never Exchange SinglePartition —
    plan-tested); the oracle is the plain global row_number, which must agree
    because the composite (key, string) order is total."""
    from nama_spark.functions.normalize import simplify_corp
    from nama_spark.operators.block import sorted_neighborhood_pairs

    u = _name_universe(spark, sf_dir)
    out = sorted_neighborhood_pairs(u, simplify_corp, window=3)
    return out.select("s0", "s1", "rank_distance")


def q_multimodal_video_frames(spark, sf_dir):
    """Video frame-sampling plumbing (sample_video_frames): one row per
    sampled frame index, indices derived from the media meta JSON
    (n_frames = n_chars) — pure F.sequence math, fully SQL-expressible, so
    the explode shape is oracle-checked end to end. The decode step stays the
    declared stub (no video libs in this container)."""
    from nama_spark.operators.multimodal import (
        media_from_documents,
        sample_video_frames,
    )

    media = media_from_documents(_t(spark, sf_dir, "documents"), kind="video")
    out = sample_video_frames(media, every_n=10, fake=True)
    return out.select("media_id", "frame_idx", "decoded")


def q_multimodal_audio_features(spark, sf_dir):
    """Audio decode plumbing, oracle-checked like the image path: the fake
    decoder derives sample_rate / n_samples / duration / rms from sha256
    bytes of the payload (multimodal.py _decode_audio_fake), which DuckDB
    recomputes with its own sha256. The seeded feature VECTOR is pinned by
    pytest."""
    from nama_spark.operators.multimodal import (
        extract_audio_features,
        media_from_documents,
    )

    media = media_from_documents(_t(spark, sf_dir, "documents"), kind="audio")
    feats = extract_audio_features(media, fake=True, dim=8)
    return feats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        # floor-scaled integer µs, not round(…, 6): n/sr ties exactly at
        # rounding boundaries (e.g. 32513/16000 = 2.0320625) and the two
        # engines break round-half ties differently; floor of the identical
        # IEEE double is tie-free
        F.floor(F.col("duration_sec") * 1e6).cast("long").alias("duration_us"),
        F.round("rms", 5).alias("rms"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict ORDER is the driver's attestation order and its correctness board
    # caps at 50 rows. Policy (per VERDICT r4): NET-NEW queries enter at the
    # HEAD in the round they are born; rows touched by this round's code
    # changes stay inside the window; long-stable rows rotate to the tail
    # and are re-verified by the local oracle replica
    # (tools/check_correctness.py) each round, re-entering the window on a
    # later rotation.
    return {
        # --- NEW this round (r05, fourth session) ---
        "cc_delta_clusters": q_cc_delta_clusters,
        "monge_elkan_scores": q_monge_elkan_scores,
        "soft_tfidf_scores": q_soft_tfidf_scores,
        "rule_cascade_links": q_rule_cascade_links,
        "fs_null_weights": q_fs_null_weights,
        "bloom_dice_pairs": q_bloom_dice_pairs,
        "one_to_one_links": q_one_to_one_links,
        "blocking_scheme_stats": q_blocking_scheme_stats,
        "cluster_cohesion": q_cluster_cohesion,
        "stable_entity_ids": q_stable_entity_ids,
        "fs_gamma_patterns": q_fs_gamma_patterns,
        "fs_match_weights": q_fs_match_weights,
        "bcubed_eval": q_bcubed_eval,
        "ari_metric": q_ari_metric,
        "metablock_wep_pairs": q_metablock_wep_pairs,
        "metablock_cnp_pairs": q_metablock_cnp_pairs,
        "golden_records": q_golden_records,
        "golden_records_delta": q_golden_records_delta,
        "fs_tf_adjusted": q_fs_tf_adjusted,
        # --- NEW this round (r05) ---
        "quality_classifier_score": q_quality_classifier_score,
        "dsir_hbits_score": q_dsir_hbits_score,
        "lang_id_trained": q_lang_id_trained,
        "events_asof_click": q_events_asof_click,
        "events_interval_join": q_events_interval_join,
        "explain_pairs": q_explain_pairs,
        "partition_diff": q_partition_diff,
        "uncertain_pairs": q_uncertain_pairs,
        "bpe_pair_counts": q_bpe_pair_counts,
        "containment_pairs": q_containment_pairs,
        "lm_perplexity_buckets": q_lm_perplexity_buckets,
        "remove_dup_spans": q_remove_dup_spans,
        "repetition_profile": q_repetition_profile,
        "gopher_repetition_filter": q_gopher_repetition_filter,
        "cap_per_domain": q_cap_per_domain,
        "select_canonical_docs": q_select_canonical_docs,
        "redact_pii_docs": q_redact_pii_docs,
        "c4_line_filter": q_c4_line_filter,
        "line_quality_profile": q_line_quality_profile,
        "semdedup_embeddings": q_semdedup_embeddings,
        "url_dedup": q_url_dedup,
        "ngram_lm_surprisal": q_ngram_lm_surprisal,
        "dup_span_profile": q_dup_span_profile,
        "drop_dup_span_docs": q_drop_dup_span_docs,
        "decontam_overlap": q_decontam_overlap,
        "decontaminate_docs": q_decontaminate_docs,
        "mixture_rates_lang": q_mixture_rates_lang,
        "mixture_sample_docs": q_mixture_sample_docs,
        "shuffle_shard_docs": q_shuffle_shard_docs,
        "ann_pq_topk": q_ann_pq_topk,
        "ann_ivfpq_topk": q_ann_ivfpq_topk,
        "ann_ivf2_topk": q_ann_ivf2_topk,
        # --- new r04, never driver-attested (were beyond the window) ---
        "ann_quantized_topk": q_ann_quantized_topk,
        "dedup_paragraphs": q_dedup_paragraphs,
        # --- rotated out in r04, re-attest now ---
        "normalize_simplify": q_normalize_simplify,
        "normalize_simplify_corp": q_normalize_simplify_corp,
        "token_doc_counts": q_token_doc_counts,
        "tokens_tfidf_weights": q_tokens_tfidf_weights,
        "token_block_pairs": q_token_block_pairs,
        "pair_jaccard_scores": q_pair_jaccard_scores,
        "group_stats": q_group_stats,
        "merge_dfs_group_join": q_merge_dfs_group_join,
        "confusion_cells": q_confusion_cells,
        "tpch_q1_pricing_summary": q_tpch_q1_pricing_summary,
        "top_customers_by_revenue": q_top_customers_by_revenue,
        "events_hourly": q_events_hourly,
        # --- r04-green rows kept in-window (several touched by r05 code:
        # --- link_tables tie-break, ann_ivf sampled fit, dedup sep) ---
        "normalize_remove_stopwords": q_normalize_remove_stopwords,
        "matchdata_add_strings": q_matchdata_add_strings,
        "matchdata_split": q_matchdata_split,
        "prefix_join_pairs": q_prefix_join_pairs,
        "winnow_near_pairs": q_winnow_near_pairs,
        "matchdata_from_unmatched": q_matchdata_from_unmatched,
        "predict_incremental": q_predict_incremental,
        "link_tables_mutual": q_link_tables_mutual,
        "link_tables_best": q_link_tables_best,
        "dedup_exact_docs": q_dedup_exact_docs,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "minhash_lsh_dedup": q_minhash_lsh_dedup,
        "minhash_dedup_delta": q_minhash_dedup_delta,
        "dedup_blocking_stats": q_dedup_blocking_stats,
        "simhash_delta": q_simhash_delta,
        "phonetic_soundex_keys": q_phonetic_soundex_keys,
        "fingerprint_key_clusters": q_fingerprint_key_clusters,
        "doc_keywords": q_doc_keywords,
        "calibration_alpha_sweep": q_calibration_alpha_sweep,
        "corpus_split_leakfree": q_corpus_split_leakfree,
        "chunk_documents": q_chunk_documents,
        "pack_chunks": q_pack_chunks,
        "corpus_profile": q_corpus_profile,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "text_quality_profile": q_text_quality_profile,
        "ann_cosine_topk": q_ann_cosine_topk,
        "embedding_threshold_pairs": q_embedding_threshold_pairs,
        # oracle-checked via recursive-CTE connected components / bit math
        "pipeline_cluster_flagship": q_pipeline_cluster_flagship,
        "pipeline_cluster_flagship_3pass": q_pipeline_cluster_flagship_3pass,
        "near_dup_clusters_cc": q_near_dup_clusters_cc,
        "simhash_near_pairs": q_simhash_near_pairs,
        "embedding_unite_similar": q_embedding_unite_similar,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "pair_losses": q_pair_losses,
        # --- tail (beyond the 50-row window): long-stable rows attested
        # --- green by the driver in r04 (and earlier); re-verified by the
        # --- local replica each round, rotated back in on a later round ---
        "sorted_neighborhood_pairs": q_sorted_neighborhood_pairs,
        "multimodal_video_frames": q_multimodal_video_frames,
        "multimodal_audio_features": q_multimodal_audio_features,
        "multimodal_image_features": q_multimodal_image_features,
        "unite_nearest_voronoi": q_unite_nearest_voronoi,
        "events_dedup_first": q_events_dedup_first,
        "assign_records": q_assign_records,
        "exact_key_clusters": q_exact_key_clusters,
        "blocking_stats": q_blocking_stats,
        "score_metrics": q_score_metrics,
        "top_scored_pairs": q_top_scored_pairs,
        "fallback_scores": q_fallback_scores,
        "events_sessionize": q_events_sessionize,
        "events_sessionize_window": q_events_sessionize_window,
        "events_sessionize_capped": q_events_sessionize_capped,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; views pre-registered)
# ---------------------------------------------------------------------------

# simplify() in RE2 (no lookarounds): the inner-punct pass becomes a
# capture-group replace applied twice (covers alternating runs, enough for
# these columns), then the punct-run collapse. Mirrors utils.py:6-26.
_INNER = r"(\S)['’´\.](\S)"
_PUNCT = r"""[\s\.,!@#$%^&*:;/'"`´‘’“”\(\)_—\-]+"""


def _sql_simplify(col: str) -> str:
    inner = _INNER.replace("'", "''")
    punct = _PUNCT.replace("'", "''")
    s = f"lower({col})"
    s = f"regexp_replace({s}, ' & ', ' and ', 'g')"
    s = f"regexp_replace({s}, '{inner}', '\\1\\2', 'g')"
    s = f"regexp_replace({s}, '{inner}', '\\1\\2', 'g')"
    s = f"regexp_replace({s}, '{punct}', ' ', 'g')"
    return f"trim({s})"


_CORP_SUFFIX = (
    "( (group|holding(s)?( co)?|inc(orporated)?|ltd|l ?l? ?[cp]"
    "|co(rp(oration)?|mpany)?|s[ae]|plc))+$"
)


def _sql_simplify_corp(col: str) -> str:
    s = _sql_simplify(col)
    s = f"regexp_replace({s}, '^the ', '')"
    return f"regexp_replace({s}, '{_CORP_SUFFIX}', '')"


_SQL_VARIANTS = """
    SELECT DISTINCT string FROM (
        SELECT p_name AS string FROM part
        UNION SELECT upper(p_name) FROM part
        UNION SELECT p_name || ', Inc.' FROM part
    )
"""

_SQL_WORD_TOKENS = """
    SELECT string, tok AS token FROM (
        SELECT string, unnest(list_filter(
            string_split_regex(string, '[^A-Za-z0-9]+'), x -> x != '')) AS tok
        FROM (SELECT DISTINCT p_name AS string FROM part)
    )
"""

# (string, token, tf) + per-token f (reference doc-count quirk: d == f)
_SQL_TOKEN_BASE = f"""
    toks_all AS ({_SQL_WORD_TOKENS}),
    tf AS (SELECT string, token, count(*) AS tf FROM toks_all GROUP BY 1, 2),
    tok_agg AS (SELECT token, cast(sum(tf) AS BIGINT) AS f, count(*) AS n_strings
                FROM tf GROUP BY 1),
    weights AS (SELECT token, f, f AS d, f / ln(1 + f) AS weight FROM tok_agg),
    elig AS (SELECT token FROM weights WHERE d BETWEEN 2 AND 100),
    pairs AS (
        SELECT DISTINCT a.string AS s0, b.string AS s1
        FROM (SELECT DISTINCT string, token FROM tf) a
        JOIN (SELECT DISTINCT string, token FROM tf) b USING (token)
        JOIN elig USING (token)
        WHERE a.string < b.string
    ),
    norms AS (
        SELECT string, sum(weight) AS w_sum
        FROM (SELECT DISTINCT string, token FROM tf) t JOIN weights USING (token)
        GROUP BY 1
    ),
    inter AS (
        SELECT p.s0, p.s1, sum(w.weight) AS iw_sum
        FROM pairs p
        JOIN (SELECT DISTINCT string, token FROM tf) t0 ON t0.string = p.s0
        JOIN (SELECT DISTINCT string, token FROM tf) t1
          ON t1.string = p.s1 AND t1.token = t0.token
        JOIN weights w ON w.token = t0.token
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT p.s0, p.s1,
               coalesce(i.iw_sum, 0) /
               (n0.w_sum + n1.w_sum - coalesce(i.iw_sum, 0)) AS score
        FROM pairs p
        LEFT JOIN inter i ON i.s0 = p.s0 AND i.s1 = p.s1
        JOIN norms n0 ON n0.string = p.s0
        JOIN norms n1 ON n1.string = p.s1
    )
"""

# documents → 3-word shingles (mirrors operators/dedup.word_shingles)
_SQL_SHINGLES = r"""
    words AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x != '') AS ws
        FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, CASE WHEN len(ws) >= 3
                THEN unnest(list_transform(range(1, len(ws) - 1),
                                           i -> array_to_string(ws[i:i+2], ' ')))
                ELSE array_to_string(ws, ' ') END AS shingle
            FROM words
        )
    ),
    sh_sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY 1)
"""

_SQL_JACCARD_PAIRS = f"""
    {_SQL_SHINGLES},
    dfreq AS (SELECT shingle, count(*) AS df FROM shingles GROUP BY 1),
    selig AS (SELECT shingle FROM dfreq WHERE df BETWEEN 2 AND 1000),
    cand AS (
        SELECT DISTINCT a.doc_id AS id0, b.doc_id AS id1
        FROM (SELECT s.* FROM shingles s JOIN selig USING (shingle)) a
        JOIN (SELECT s.* FROM shingles s JOIN selig USING (shingle)) b
          USING (shingle)
        WHERE a.doc_id < b.doc_id
    ),
    sinter AS (
        SELECT c.id0, c.id1, count(*) AS n_inter
        FROM cand c
        JOIN shingles s0 ON s0.doc_id = c.id0
        JOIN shingles s1 ON s1.doc_id = c.id1 AND s1.shingle = s0.shingle
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT i.id0, i.id1,
               i.n_inter * 1.0 / (z0.n_sh + z1.n_sh - i.n_inter) AS jaccard
        FROM sinter i
        JOIN sh_sizes z0 ON z0.doc_id = i.id0
        JOIN sh_sizes z1 ON z1.doc_id = i.id1
    )
"""

# Recursive-CTE connected components (test-scale oracle only — the engine's
# own CC is the large-star/small-star pass): reach(node, r) enumerates every
# node reachable from `node`; min(r) is the component label, the same min-id
# label the distributed CC elects (cluster.py:107).
def _sql_cc_reach(nodes_cte: str, edges_cte: str) -> str:
    return f"""
    bi AS (SELECT u, v FROM {edges_cte} UNION SELECT v, u FROM {edges_cte}),
    reach(node, r) AS (
        SELECT node, node FROM {nodes_cte}
        UNION
        SELECT reach.node, bi.v FROM reach JOIN bi ON bi.u = reach.r
    )"""


# nmgrams(2,3) token-similarity scoring over a universe CTE `u(string)` —
# mirrors tokens_table(nmgrams23) + tf-idf weights (d == f quirk) + eligible
# [2,100] blocking + weighted set-jaccard (functions/tokenize.py,
# operators/score.py). DuckDB string slicing is 1-based inclusive.
_SQL_NMGRAM_TOKSIM = """
    grams AS (
        SELECT string, unnest(list_concat(
            CASE WHEN len(string) >= 2
                 THEN list_transform(range(1, len(string)), i -> string[i:i+1])
                 ELSE []::VARCHAR[] END,
            CASE WHEN len(string) >= 3
                 THEN list_transform(range(1, len(string) - 1), i -> string[i:i+2])
                 ELSE []::VARCHAR[] END)) AS token
        FROM u
    ),
    gtf AS (SELECT string, token, count(*) AS tf FROM grams GROUP BY 1, 2),
    gagg AS (SELECT token, cast(sum(tf) AS BIGINT) AS f FROM gtf GROUP BY 1),
    gweights AS (SELECT token, f AS d, f / ln(1 + f) AS weight FROM gagg),
    gelig AS (SELECT token FROM gweights WHERE d BETWEEN 2 AND 100),
    gsets AS (SELECT DISTINCT string, token FROM gtf),
    gpairs AS (
        SELECT DISTINCT a.string AS s0, b.string AS s1
        FROM gsets a JOIN gsets b USING (token) JOIN gelig USING (token)
        WHERE a.string < b.string
    ),
    gnorms AS (
        SELECT string, sum(weight) AS w_sum
        FROM gsets JOIN gweights USING (token) GROUP BY 1
    ),
    ginter AS (
        SELECT p.s0, p.s1, sum(wt.weight) AS iw
        FROM gpairs p
        JOIN gsets t0 ON t0.string = p.s0
        JOIN gsets t1 ON t1.string = p.s1 AND t1.token = t0.token
        JOIN gweights wt ON wt.token = t0.token
        GROUP BY 1, 2
    ),
    gscored AS (
        SELECT p.s0, p.s1,
               coalesce(i.iw, 0) / (n0.w_sum + n1.w_sum - coalesce(i.iw, 0)) AS score
        FROM gpairs p
        LEFT JOIN ginter i ON i.s0 = p.s0 AND i.s1 = p.s1
        JOIN gnorms n0 ON n0.string = p.s0
        JOIN gnorms n1 ON n1.string = p.s1
    )
"""

_STOPWORDS_SQL = None  # built lazily below


def _sql_stopword_array() -> str:
    from nama_spark.functions.normalize import ENGLISH_STOPWORDS

    global _STOPWORDS_SQL
    if _STOPWORDS_SQL is None:
        items = ", ".join("'" + w.replace("'", "''") + "'" for w in ENGLISH_STOPWORDS)
        _STOPWORDS_SQL = f"[{items}]"
    return _STOPWORDS_SQL


def _sql_lang_markers(lang: str) -> str:
    markers = {
        "en": ["the", "and", "of", "to", "in", "is", "that", "for", "it", "with"],
        "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
        "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"],
        "es": ["el", "la", "los", "y", "es", "no", "una", "por", "que", "con"],
    }[lang]
    return "[" + ", ".join(f"'{m}'" for m in markers) + "]"


def oracle_sql() -> dict[str, str]:
    simplify_c = _sql_simplify("c_name")
    corp_raw = (
        "CASE WHEN p_partkey % 5 = 0 THEN 'The ' ELSE '' END || p_name || ' ' || "
        "CASE p_partkey % 4 WHEN 0 THEN 'Inc' WHEN 1 THEN 'Holding Co LLC' "
        "WHEN 2 THEN 'Ltd' ELSE 'Group' END"
    )
    sw = _sql_stopword_array()
    q = {}

    q["normalize_simplify"] = f"""
        SELECT c_custkey, {simplify_c} AS name_simplified FROM customer
    """

    q["normalize_simplify_corp"] = f"""
        WITH raw AS (SELECT p_partkey, {corp_raw} AS raw_name FROM part)
        SELECT p_partkey, raw_name, {_sql_simplify_corp('raw_name')} AS corp_key
        FROM raw
    """

    # Fellegi–Sunter fixture: blocked customer pairs + integer agreement
    # levels; milli weights are the SAME Python-computed literals the Spark
    # side sums (fellegi_sunter.milli_weights over _FS_PARAMS)
    from nama_spark.operators.fellegi_sunter import milli_weights

    _w = milli_weights(_FS_PARAMS)
    _fs_base = """
        c AS (
            SELECT c_custkey, right(c_name, 3) AS blk, c_nationkey,
                   c_mktsegment,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer
        ),
        g AS (
            SELECT a.c_custkey AS c0, b.c_custkey AS c1,
                   CAST(CASE WHEN a.c_nationkey = b.c_nationkey
                        THEN 1 ELSE 0 END AS INT) AS g_nation,
                   CAST(CASE WHEN a.c_mktsegment = b.c_mktsegment
                        THEN 1 ELSE 0 END AS INT) AS g_segment,
                   CAST(CASE WHEN a.cents = b.cents THEN 2
                        WHEN abs(a.cents - b.cents) <= 10000 THEN 1
                        ELSE 0 END AS INT) AS g_bal
            FROM c a JOIN c b
              ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        )
    """

    q["fs_tf_adjusted"] = f"""
        WITH {_fs_base},
        gs AS (
            SELECT a.c_custkey AS c0, b.c_custkey AS c1,
                   CAST(CASE WHEN a.c_mktsegment = b.c_mktsegment
                        THEN 1 ELSE 0 END AS INT) AS g_segment,
                   (CASE WHEN a.c_nationkey = b.c_nationkey
                         THEN {_w['g_nation'][1]}
                         ELSE {_w['g_nation'][0]} END)
                 + (CASE WHEN a.c_mktsegment = b.c_mktsegment
                         THEN {_w['g_segment'][1]}
                         ELSE {_w['g_segment'][0]} END)
                 + (CASE WHEN a.cents = b.cents THEN {_w['g_bal'][2]}
                         WHEN abs(a.cents - b.cents) <= 10000
                         THEN {_w['g_bal'][1]}
                         ELSE {_w['g_bal'][0]} END) AS w_milli,
                   a.c_mktsegment AS seg0, b.c_mktsegment AS seg1
            FROM c a JOIN c b
              ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        ),
        tf AS (
            SELECT c_mktsegment AS v,
                   count(*) * 1.0 / (SELECT count(*) FROM customer) AS tf
            FROM customer GROUP BY 1
        ),
        ubar AS (SELECT sum(tf * tf) AS ub FROM tf)
        SELECT gs.c0, gs.c1, gs.g_segment,
               CAST(CASE WHEN gs.seg0 = gs.seg1
                    THEN round(1000 * log2(ubar.ub / tf.tf))
                    ELSE 0 END AS BIGINT) AS tf_adj_milli,
               CAST(gs.w_milli + CASE WHEN gs.seg0 = gs.seg1
                    THEN round(1000 * log2(ubar.ub / tf.tf))
                    ELSE 0 END AS BIGINT) AS weight_tf_milli
        FROM gs
        LEFT JOIN tf ON tf.v = gs.seg0
        CROSS JOIN ubar
    """

    q["fs_gamma_patterns"] = f"""
        WITH {_fs_base}
        SELECT g_nation, g_segment, g_bal,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM g GROUP BY 1, 2, 3
    """

    q["fs_match_weights"] = f"""
        WITH {_fs_base}
        SELECT c0, c1, g_nation, g_segment, g_bal,
               CAST(
                 (CASE g_nation WHEN 0 THEN {_w['g_nation'][0]}
                                ELSE {_w['g_nation'][1]} END)
               + (CASE g_segment WHEN 0 THEN {_w['g_segment'][0]}
                                 ELSE {_w['g_segment'][1]} END)
               + (CASE g_bal WHEN 0 THEN {_w['g_bal'][0]}
                             WHEN 1 THEN {_w['g_bal'][1]}
                             ELSE {_w['g_bal'][2]} END)
               AS BIGINT) AS weight_milli
        FROM g
    """

    # B-cubed per-record rows over the brand/type partitions (same base as
    # the confusion fixture; window sums mirror the groupBy+join aggregates)
    q["bcubed_eval"] = """
        WITH base AS (
            SELECT cast(p_partkey AS VARCHAR) AS string,
                   coalesce(n, 0) + 1 AS cnt, p_brand AS gp, p_type AS gg
            FROM part LEFT JOIN (
                SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1
            ) li ON part.p_partkey = li.l_partkey
        ),
        cells AS (
            SELECT string, cnt, gp, gg,
                   CAST(sum(cnt) OVER (PARTITION BY gp) AS BIGINT) AS na,
                   CAST(sum(cnt) OVER (PARTITION BY gg) AS BIGINT) AS ng,
                   CAST(sum(cnt) OVER (PARTITION BY gp, gg) AS BIGINT) AS nab
            FROM base
        )
        SELECT string, CAST(cnt AS BIGINT) AS count,
               gp AS group_pred, gg AS group_gold, na, ng, nab,
               round(CAST(nab AS DOUBLE) / CAST(na AS DOUBLE), 6) AS p,
               round(CAST(nab AS DOUBLE) / CAST(ng AS DOUBLE), 6) AS r
        FROM cells
    """

    # meta-blocking WEP over word-token blocks: distinct (string, token)
    # sets, block purge outside [2, 100], CBS edges, exact-integer mean cut
    q["metablock_wep_pairs"] = f"""
        WITH toks AS ({_SQL_WORD_TOKENS}),
        sets AS (SELECT DISTINCT string, token FROM toks),
        bs AS (SELECT token, count(*) AS bsz FROM sets GROUP BY 1),
        kept AS (
            SELECT s.string, s.token FROM sets s JOIN bs USING (token)
            WHERE bsz BETWEEN 2 AND 100
        ),
        edges AS (
            SELECT a.string AS s0, b.string AS s1,
                   CAST(count(*) AS BIGINT) AS cbs
            FROM kept a JOIN kept b USING (token)
            WHERE a.string < b.string
            GROUP BY 1, 2
        ),
        nb AS (SELECT string, CAST(count(*) AS BIGINT) AS nbl
               FROM kept GROUP BY 1),
        tot AS (SELECT CAST(sum(cbs) AS BIGINT) AS tw,
                       CAST(count(*) AS BIGINT) AS ne FROM edges)
        SELECT e.s0, e.s1, e.cbs, n0.nbl AS nb0, n1.nbl AS nb1
        FROM edges e
        CROSS JOIN tot
        JOIN nb n0 ON n0.string = e.s0
        JOIN nb n1 ON n1.string = e.s1
        WHERE e.cbs * tot.ne >= tot.tw
    """


    # golden records: per-cluster survivorship — longest name (tie: max),
    # max balance, deterministic segment vote (count desc, value asc)
    q["golden_records"] = """
        WITH c AS (
            SELECT right(c_name, 2) AS grp, c_name, c_acctbal, c_mktsegment
            FROM customer
        ),
        base AS (
            SELECT grp AS "group", CAST(count(*) AS BIGINT) AS n_members,
                   round(max(c_acctbal), 2) AS c_acctbal
            FROM c GROUP BY 1
        ),
        longest AS (
            SELECT grp AS "group", c_name FROM (
                SELECT grp, c_name,
                       row_number() OVER (PARTITION BY grp
                           ORDER BY length(c_name) DESC, c_name DESC) AS rk
                FROM c
            ) WHERE rk = 1
        ),
        vote AS (
            SELECT grp AS "group", c_mktsegment FROM (
                SELECT grp, c_mktsegment,
                       row_number() OVER (PARTITION BY grp
                           ORDER BY count(*) DESC, c_mktsegment ASC) AS rk
                FROM c GROUP BY grp, c_mktsegment
            ) WHERE rk = 1
        )
        SELECT b."group", b.n_members, l.c_name, b.c_acctbal, v.c_mktsegment
        FROM base b JOIN longest l USING ("group") JOIN vote v USING ("group")
    """

    # golden_records_delta: the delta fold must be INDISTINGUISHABLE from
    # a full re-fuse of today's records, so its oracle IS the full golden
    # recompute — the yesterday/arrivals split exists only Spark-side.
    q["golden_records_delta"] = q["golden_records"]

    q["metablock_cnp_pairs"] = f"""
        WITH toks AS ({_SQL_WORD_TOKENS}),
        sets AS (SELECT DISTINCT string, token FROM toks),
        bs AS (SELECT token, count(*) AS bsz FROM sets GROUP BY 1),
        kept AS (
            SELECT s.string, s.token FROM sets s JOIN bs USING (token)
            WHERE bsz BETWEEN 2 AND 100
        ),
        edges AS (
            SELECT a.string AS s0, b.string AS s1,
                   CAST(count(*) AS BIGINT) AS cbs
            FROM kept a JOIN kept b USING (token)
            WHERE a.string < b.string
            GROUP BY 1, 2
        ),
        nb AS (SELECT string, CAST(count(*) AS BIGINT) AS nbl
               FROM kept GROUP BY 1),
        dirs AS (
            SELECT s0 AS node, s1 AS partner, cbs, s0, s1 FROM edges
            UNION ALL
            SELECT s1 AS node, s0 AS partner, cbs, s0, s1 FROM edges
        ),
        ranked AS (
            SELECT s0, s1,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY cbs DESC, partner ASC) AS rk
            FROM dirs
        ),
        keep AS (SELECT DISTINCT s0, s1 FROM ranked WHERE rk <= 3)
        SELECT e.s0, e.s1, e.cbs, n0.nbl AS nb0, n1.nbl AS nb1
        FROM edges e
        JOIN keep USING (s0, s1)
        JOIN nb n0 ON n0.string = e.s0
        JOIN nb n1 ON n1.string = e.s1
    """

    q["matchdata_from_unmatched"] = """

        SELECT p_name AS string, count(*) AS count, p_name AS "group"
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p_name
    """

    q["exact_key_clusters"] = f"""
        WITH v AS ({_SQL_VARIANTS}),
        k AS (SELECT string, {_sql_simplify_corp('string')} AS key FROM v)
        SELECT string,
               CASE WHEN key = '' THEN string
                    ELSE min(string) OVER (PARTITION BY key) END AS "group"
        FROM k
    """

    q["normalize_remove_stopwords"] = f"""
        WITH raw AS (
            SELECT p_partkey,
                   'The ' || p_name || ' of the Day and more' AS raw_name
            FROM part
        )
        SELECT p_partkey, raw_name,
               array_to_string(
                   list_filter(
                       string_split_regex(trim(raw_name), '\\s+'),
                       w -> w != '' AND NOT list_contains({sw}, lower(w))
                   ), ' ') AS cleaned
        FROM raw
    """

    q["matchdata_add_strings"] = """
        WITH base AS (
            SELECT p_name AS string, cast(count(*) AS BIGINT) AS count
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1
        ),
        inc AS (
            SELECT string, cast(count(*) AS BIGINT) AS count FROM (
                SELECT p_name AS string FROM part WHERE p_partkey % 3 = 0
                UNION ALL
                SELECT p_name || ' redux' FROM part WHERE p_partkey % 5 = 0
            ) GROUP BY 1
        )
        SELECT coalesce(b.string, i.string) AS string,
               cast(coalesce(b.count, 0) + coalesce(i.count, 0) AS BIGINT)
                   AS count,
               coalesce(b.string, i.string) AS "group"
        FROM base b FULL OUTER JOIN inc i ON b.string = i.string
    """

    # unite-by-first-word cells, length%4==0 strings split back out as
    # singletons; labels = min string per cell (all counts equal)
    q["matchdata_split"] = """
        WITH v AS (SELECT DISTINCT p_name AS string FROM part),
        keyed AS (
            SELECT string,
                   CASE WHEN length(string) % 4 = 0 THEN 's|' || string
                        ELSE 'g|' || string_split(string, ' ')[1] END AS cell
            FROM v
        )
        SELECT string, min(string) OVER (PARTITION BY cell) AS "group"
        FROM keyed
    """

    q["token_doc_counts"] = f"""
        WITH toks AS ({_SQL_WORD_TOKENS})
        SELECT token, count(*) AS f, count(DISTINCT string) AS n_strings
        FROM toks GROUP BY token
    """

    q["tokens_tfidf_weights"] = f"""
        WITH {_SQL_TOKEN_BASE}
        SELECT token, f, d, round(weight, 6) AS weight FROM weights
    """

    q["token_block_pairs"] = f"""
        WITH {_SQL_TOKEN_BASE}
        SELECT s0, s1 FROM pairs
    """

    q["pair_jaccard_scores"] = f"""
        WITH {_SQL_TOKEN_BASE}
        SELECT s0, s1, round(score, 5) AS score FROM scored
    """

    # the match debugger's evidence table: union the two sides' token
    # rows, group to per-(pair, token) side flags, attach tf-idf weights
    q["explain_pairs"] = f"""
        WITH {_SQL_TOKEN_BASE},
        sets AS (SELECT DISTINCT string, token FROM tf),
        ab AS (
            SELECT p.s0, p.s1, t.token, 1 AS c0, 0 AS c1
            FROM pairs p JOIN sets t ON t.string = p.s0
            UNION ALL
            SELECT p.s0, p.s1, t.token, 0 AS c0, 1 AS c1
            FROM pairs p JOIN sets t ON t.string = p.s1
        ),
        m AS (
            SELECT s0, s1, token,
                   CAST(max(c0) AS INT) AS in_s0,
                   CAST(max(c1) AS INT) AS in_s1
            FROM ab GROUP BY 1, 2, 3
        )
        SELECT m.s0, m.s1, m.token, m.in_s0, m.in_s1,
               CAST(m.in_s0 * m.in_s1 AS INT) AS shared,
               round(w.weight, 5) AS weight
        FROM m JOIN weights w USING (token)
    """

    # uncertainty-band labeling batch: round first, band-filter on the
    # rounded score, md5(seed||pair) draw — fully deterministic
    q["uncertain_pairs"] = f"""
        WITH {_SQL_TOKEN_BASE},
        r AS (SELECT s0, s1, round(score, 5) AS score FROM scored),
        band AS (
            SELECT s0, s1, score, 0.4 - abs(score - 0.5) AS uncertainty
            FROM r WHERE abs(score - 0.5) <= 0.4
        )
        SELECT s0, s1, score, round(uncertainty, 5) AS uncertainty
        FROM band
        ORDER BY md5('r05' || chr(31) || s0 || chr(31) || s1)
        LIMIT 30
    """

    # partition diff: full outer membership join + three cardinality
    # tables decide the per-string status
    q["partition_diff"] = """
        WITH pa AS (SELECT p_name AS string, min(p_brand) AS group_a
                    FROM part WHERE p_partkey % 5 != 0 GROUP BY 1),
        pb AS (SELECT p_name AS string, min(p_type) AS group_b
               FROM part WHERE p_partkey % 7 != 0 GROUP BY 1),
        j AS (
            SELECT coalesce(pa.string, pb.string) AS string,
                   group_a, group_b
            FROM pa FULL JOIN pb ON pa.string = pb.string
        ),
        na AS (SELECT group_a, count(*) AS na FROM j
               WHERE group_a IS NOT NULL GROUP BY 1),
        nb AS (SELECT group_b, count(*) AS nb FROM j
               WHERE group_b IS NOT NULL GROUP BY 1),
        nab AS (SELECT group_a, group_b, count(*) AS nab FROM j
                WHERE group_a IS NOT NULL AND group_b IS NOT NULL
                GROUP BY 1, 2)
        SELECT j.string, j.group_a, j.group_b,
               CAST(na.na AS BIGINT) AS na,
               CAST(nb.nb AS BIGINT) AS nb,
               CAST(nab.nab AS BIGINT) AS nab,
               CASE WHEN j.group_a IS NULL THEN 'only_b'
                    WHEN j.group_b IS NULL THEN 'only_a'
                    WHEN na.na = nab.nab AND nb.nb = nab.nab THEN 'stable'
                    WHEN na.na > nab.nab AND nb.nb = nab.nab THEN 'split'
                    WHEN na.na = nab.nab AND nb.nb > nab.nab THEN 'merged'
                    ELSE 'regrouped' END AS status
        FROM j
        LEFT JOIN na ON na.group_a = j.group_a
        LEFT JOIN nb ON nb.group_b = j.group_b
        LEFT JOIN nab ON nab.group_a = j.group_a AND nab.group_b = j.group_b
    """

    q["group_stats"] = """
        SELECT p_brand, count(DISTINCT p_name) AS n_members, count(*) AS count_sum
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p_brand
    """

    q["merge_dfs_group_join"] = """
        WITH g0 AS (SELECT p_name AS string, min(p_brand) AS grp FROM part GROUP BY 1),
        g AS (SELECT string, min(string) OVER (PARTITION BY grp) AS match_group FROM g0),
        l AS (SELECT p_name AS name_l, cast(sum(p_size) AS BIGINT) AS size_sum
              FROM part GROUP BY 1),
        r AS (SELECT p_name AS name_r, round(sum(p_retailprice), 4) AS retail_sum
              FROM part GROUP BY 1)
        SELECT ga.match_group, l.name_l, r.name_r, l.size_sum, r.retail_sum
        FROM l JOIN g ga ON ga.string = l.name_l
        JOIN g gb ON gb.match_group = ga.match_group
        JOIN r ON r.name_r = gb.string
    """

    confusion_base = """
        base AS (
            SELECT cast(p_partkey AS VARCHAR) AS string,
                   coalesce(n, 0) + 1 AS cnt, p_brand AS gp, p_type AS gg
            FROM part LEFT JOIN (
                SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1
            ) li ON part.p_partkey = li.l_partkey
        ),
        cells AS (
            SELECT string, cnt,
                (sum(cnt) OVER (PARTITION BY gp, gg) - cnt) * cnt AS tp_c,
                (sum(cnt) OVER (PARTITION BY gp) - cnt) * cnt AS p_c,
                (sum(cnt) OVER (PARTITION BY gg) - cnt) * cnt AS g_c,
                (sum(cnt) OVER () - cnt) * cnt AS a_c
            FROM base
        ),
        summed AS (
            SELECT cast(sum(tp_c) / 2 AS BIGINT) AS TP,
                   cast(sum(p_c - tp_c) / 2 AS BIGINT) AS FP,
                   cast(sum(g_c - tp_c) / 2 AS BIGINT) AS FN,
                   cast(sum(a_c - p_c - g_c + tp_c) / 2 AS BIGINT) AS TN
            FROM cells
        )
    """

    q["confusion_cells"] = f"WITH {confusion_base} SELECT TP, FP, FN, TN FROM summed"

    # Rand / Adjusted-Rand from the same pair-counting cells; the ARI
    # numerator/denominator products exceed int64 → HUGEINT, emitted as
    # exact DECIMAL(38,0) to match the Spark side's Python bigints
    q["ari_metric"] = f"""
        WITH {confusion_base},
        h AS (
            SELECT CAST(TP AS HUGEINT) AS tp, CAST(FP AS HUGEINT) AS fp,
                   CAST(FN AS HUGEINT) AS fn, CAST(TN AS HUGEINT) AS tn
            FROM summed
        ),
        a AS (
            SELECT tp, fp, fn, tn,
                   2 * (tp * tn - fn * fp) AS ari_num,
                   (tp + fn) * (fn + tn) + (tp + fp) * (fp + tn) AS ari_den
            FROM h
        )
        SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
               CAST(ari_num AS DECIMAL(38,0)) AS ari_num,
               CAST(ari_den AS DECIMAL(38,0)) AS ari_den,
               round(CAST(tp + tn AS DOUBLE)
                     / CAST(tp + tn + fp + fn AS DOUBLE), 6) AS ri,
               round(CAST(ari_num AS DOUBLE) / CAST(ari_den AS DOUBLE), 6)
                   AS ari
        FROM a
    """

    # cross-table linkage: union-universe weights, left-tokens × right-tokens
    # candidates, jaccard ≥ 0.4, mutual best match ranked on round(score, 9)
    q["link_tables_mutual"] = r"""
        WITH
        l AS (SELECT DISTINCT p_name AS string FROM part),
        r AS (SELECT DISTINCT 'the ' || p_name AS string FROM part),
        uni AS (SELECT string FROM l UNION SELECT string FROM r),
        toks_all AS (
            SELECT string, unnest(list_filter(
                string_split_regex(string, '[^A-Za-z0-9]+'), x -> x != ''))
                AS token
            FROM uni
        ),
        tf AS (SELECT string, token, count(*) AS tf FROM toks_all GROUP BY 1, 2),
        agg AS (SELECT token, cast(sum(tf) AS BIGINT) AS f FROM tf GROUP BY 1),
        weights AS (SELECT token, f AS d, f / ln(1 + f) AS weight FROM agg),
        elig AS (SELECT token FROM weights WHERE d BETWEEN 2 AND 100),
        sets AS (SELECT DISTINCT string, token FROM tf),
        pairs AS (
            SELECT DISTINCT a.string AS s0, b.string AS s1
            FROM (SELECT s.* FROM sets s JOIN elig USING (token)
                  WHERE s.string IN (SELECT string FROM l)) a
            JOIN (SELECT s.* FROM sets s JOIN elig USING (token)
                  WHERE s.string IN (SELECT string FROM r)) b
              USING (token)
            WHERE a.string != b.string
        ),
        norms AS (
            SELECT string, sum(weight) AS w_sum
            FROM sets JOIN weights USING (token) GROUP BY 1
        ),
        inter AS (
            SELECT p.s0, p.s1, sum(w.weight) AS iw
            FROM pairs p
            JOIN sets t0 ON t0.string = p.s0
            JOIN sets t1 ON t1.string = p.s1 AND t1.token = t0.token
            JOIN weights w ON w.token = t0.token
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT p.s0, p.s1,
                   coalesce(i.iw, 0)
                   / (n0.w_sum + n1.w_sum - coalesce(i.iw, 0)) AS score
            FROM pairs p
            LEFT JOIN inter i ON i.s0 = p.s0 AND i.s1 = p.s1
            JOIN norms n0 ON n0.string = p.s0
            JOIN norms n1 ON n1.string = p.s1
        ),
        with_exact AS (
            -- verbatim cross-table equality links at score 1.0, independent
            -- of blocking (mirrors link_candidates' exact-pair union)
            SELECT * FROM scored
            UNION ALL
            SELECT l.string AS s0, r.string AS s1, 1.0 AS score
            FROM l JOIN r ON l.string = r.string
        ),
        thr AS (SELECT * FROM with_exact WHERE score >= 0.4),
        ranked AS (
            SELECT s0, s1, score,
                   row_number() OVER (PARTITION BY s0
                       ORDER BY round(score, 9) DESC, (s1 <> s0), s1) AS rl,
                   row_number() OVER (PARTITION BY s1
                       ORDER BY round(score, 9) DESC, (s1 <> s0), s0) AS rr
            FROM thr
        )
        SELECT s0, s1, round(score, 5) AS score
        FROM ranked WHERE rl = 1 AND rr = 1
    """
    # best-left mode: same candidate/scoring CTEs, only the selection rule
    # differs (drop the right-side rank filter)
    q["link_tables_best"] = q["link_tables_mutual"].replace(
        "WHERE rl = 1 AND rr = 1", "WHERE rl = 1"
    )

    # union-universe refit (d == f quirk), pairs restricted to new-touching,
    # weighted word-jaccard ≥ 0.5, recursive-CTE closure, min-string labels
    q["predict_incremental"] = r"""
        WITH RECURSIVE
        old AS (SELECT DISTINCT p_name AS string FROM part),
        newer AS (
            -- NOT IN, not EXCEPT: set ops other than UNION are rejected
            -- inside a WITH RECURSIVE block by DuckDB's parser
            SELECT DISTINCT p_name || 's' AS string FROM part
            WHERE p_partkey % 7 = 0
              AND p_name || 's' NOT IN (SELECT p_name FROM part)
        ),
        uni AS (SELECT string FROM old UNION SELECT string FROM newer),
        toks_all AS (
            SELECT string, unnest(list_filter(
                string_split_regex(string, '[^A-Za-z0-9]+'), x -> x != ''))
                AS token
            FROM uni
        ),
        tf AS (SELECT string, token, count(*) AS tf FROM toks_all GROUP BY 1, 2),
        agg AS (SELECT token, cast(sum(tf) AS BIGINT) AS f FROM tf GROUP BY 1),
        weights AS (SELECT token, f AS d, f / ln(1 + f) AS weight FROM agg),
        elig AS (SELECT token FROM weights WHERE d BETWEEN 2 AND 100),
        sets AS (SELECT DISTINCT string, token FROM tf),
        pairs AS (
            SELECT DISTINCT least(a.string, b.string) AS s0,
                            greatest(a.string, b.string) AS s1
            FROM (SELECT s.* FROM sets s JOIN elig USING (token)
                  WHERE s.string IN (SELECT string FROM newer)) a
            JOIN (SELECT s.* FROM sets s JOIN elig USING (token)) b
              USING (token)
            WHERE a.string != b.string
        ),
        norms AS (
            SELECT string, sum(weight) AS w_sum
            FROM sets JOIN weights USING (token) GROUP BY 1
        ),
        inter AS (
            SELECT p.s0, p.s1, sum(w.weight) AS iw
            FROM pairs p
            JOIN sets t0 ON t0.string = p.s0
            JOIN sets t1 ON t1.string = p.s1 AND t1.token = t0.token
            JOIN weights w ON w.token = t0.token
            GROUP BY 1, 2
        ),
        edges AS (
            SELECT p.s0 AS u, p.s1 AS v
            FROM pairs p
            LEFT JOIN inter i ON i.s0 = p.s0 AND i.s1 = p.s1
            JOIN norms n0 ON n0.string = p.s0
            JOIN norms n1 ON n1.string = p.s1
            WHERE coalesce(i.iw, 0)
                  / (n0.w_sum + n1.w_sum - coalesce(i.iw, 0)) >= 0.5
        ),
        nodes AS (SELECT string AS node FROM uni),
        bi AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
        reach(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT reach.node, bi.v FROM reach JOIN bi ON bi.u = reach.r
        )
        SELECT node AS string, 1::BIGINT AS count, min(r) AS "group"
        FROM reach GROUP BY node
    """

    q["blocking_stats"] = f"""
        WITH {_SQL_TOKEN_BASE},
        g0 AS (SELECT p_name AS string, min(p_brand) AS grp
               FROM part GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM g0),
        gp AS (SELECT cast(sum(s * (s - 1) / 2) AS BIGINT) AS gold_pairs
               FROM (SELECT count(*) AS s FROM g0 GROUP BY grp)),
        nc AS (SELECT count(*) AS n_cand FROM pairs),
        ret AS (
            SELECT count(*) AS retained
            FROM pairs p
            JOIN g0 a ON a.string = p.s0
            JOIN g0 b ON b.string = p.s1
            WHERE a.grp = b.grp
        )
        SELECT n AS n_strings, n_cand AS n_candidates,
               gold_pairs AS n_gold_pairs,
               round(retained * 1.0 / gold_pairs, 6) AS pair_completeness,
               round(1.0 - n_cand * 1.0 / (n * (n - 1) / 2.0), 6)
                   AS reduction_ratio
        FROM nn, gp, nc, ret
    """

    q["score_metrics"] = f"""
        WITH {confusion_base},
        np AS (SELECT (sum(cnt)*sum(cnt) - sum(cnt*cnt)) / 2.0 AS n_predicted FROM base)
        SELECT
            round((TP + TN) * 1.0 / (TP + TN + FP + FN), 6) AS accuracy,
            round(TP * 1.0 / (TP + FP), 6) AS precision,
            round(TP * 1.0 / (TP + FN), 6) AS recall,
            round(2.0 * (TP * 1.0 / (TP + FP)) * (TP * 1.0 / (TP + FN))
                  / (TP * 1.0 / (TP + FP) + TP * 1.0 / (TP + FN)), 6) AS F1,
            round((TP + TN + FP + FN) / n_predicted, 6) AS coverage
        FROM summed, np
    """

    q["top_scored_pairs"] = f"""
        WITH {_SQL_TOKEN_BASE},
        counts AS (
            SELECT p_name AS string, count(*) AS cnt
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1
        )
        SELECT s0, s1, round(score, 5) AS score, c0.cnt * c1.cnt AS impact
        FROM scored
        JOIN counts c0 ON c0.string = s0
        JOIN counts c1 ON c1.string = s1
        ORDER BY impact DESC, score DESC, s0, s1
        LIMIT 20
    """

    q["fallback_scores"] = """
        SELECT a.p_partkey AS k, a.p_name AS s0, b.p_name AS s1,
               round(jaro_winkler_similarity(a.p_name, b.p_name), 5) AS jw,
               round(CASE WHEN greatest(length(a.p_name), length(b.p_name)) > 0
                     THEN 1.0 - levenshtein(a.p_name, b.p_name) * 1.0
                          / greatest(length(a.p_name), length(b.p_name))
                     ELSE 1.0 END, 5) AS lev_sim
        FROM part a JOIN part b ON a.p_partkey = b.p_partkey - 1
    """

    q["tpch_q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               count(*) AS count_order
        FROM lineitem GROUP BY 1, 2
    """

    q["top_customers_by_revenue"] = """
        SELECT c_custkey, c_name, round(sum(o_totalprice), 4) AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
        ORDER BY sum(o_totalprice) DESC, c_custkey
        LIMIT 10
    """

    q["events_hourly"] = """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events, round(sum(value), 6) AS value_sum
        FROM events GROUP BY 1, 2
    """

    # sub-second gap precision (sessionize casts ts to double seconds;
    # epoch() is fractional in DuckDB — both µs-exact in double)
    q["events_sessionize"] = """
        WITH flags AS (
            SELECT user_id,
                CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        )
        SELECT user_id, cast(sum(is_new) AS BIGINT) AS n_sessions FROM flags GROUP BY 1
    """

    # session_window parity: sessions merge while the inter-event gap < 30
    # min (no exact-gap ties in this data at µs precision); window end =
    # last event + gap
    q["events_sessionize_window"] = """
        WITH flags AS (
            SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM flags
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events,
               round(sum(value), 6) AS value_sum
        FROM sess GROUP BY user_id, sid
    """

    # capped sessionize: the session split depends on the RUNNING event
    # count, so the oracle steps events one rank at a time (recursive CTE,
    # all users advance in lockstep; depth = max events per user)
    q["events_sessionize_capped"] = """
        WITH RECURSIVE ev AS (
            SELECT user_id, event_id, ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        step AS (
            SELECT user_id, rn, ts, 1 AS n_in, 1 AS seq
            FROM ev WHERE rn = 1
            UNION ALL
            SELECT e.user_id, e.rn, e.ts,
                   CASE WHEN date_diff('microsecond', s.ts, e.ts) > 1800000000
                             OR s.n_in >= 2
                        THEN 1 ELSE s.n_in + 1 END,
                   CASE WHEN date_diff('microsecond', s.ts, e.ts) > 1800000000
                             OR s.n_in >= 2
                        THEN s.seq + 1 ELSE s.seq END
            FROM step s JOIN ev e
              ON e.user_id = s.user_id AND e.rn = s.rn + 1
        )
        SELECT user_id, CAST(seq AS BIGINT) AS session_seq,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events
        FROM step GROUP BY user_id, seq
    """

    q["dedup_exact_docs"] = """
        SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_dups
        FROM documents GROUP BY text
    """

    q["dedup_ngram_jaccard"] = f"""
        WITH {_SQL_JACCARD_PAIRS}
        SELECT id0, id1, round(jaccard, 5) AS jaccard FROM jac
        WHERE jaccard >= 0.5
    """

    # asymmetric containment on the same shingle blocks: n0/n1 are the
    # per-doc distinct shingle-set sizes, statistic = n_inter/min
    q["containment_pairs"] = f"""
        WITH {_SQL_JACCARD_PAIRS.replace('jac AS (', 'jac_unused AS (')}
        SELECT i.id0, i.id1,
               CAST(z0.n_sh AS BIGINT) AS n0,
               CAST(z1.n_sh AS BIGINT) AS n1,
               round(i.n_inter * 1.0 / least(z0.n_sh, z1.n_sh), 5)
                   AS containment
        FROM sinter i
        JOIN sh_sizes z0 ON z0.doc_id = i.id0
        JOIN sh_sizes z1 ON z1.doc_id = i.id1
        WHERE i.n_inter * 1.0 / least(z0.n_sh, z1.n_sh) >= 0.5
    """

    minhash_cols = ", ".join(
        f"min(md5(shingle || ':{i}')) AS h{i}" for i in range(16)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || '|' || ".join(f"h{b * 4 + i}" for i in range(4))
        + " AS bsig FROM sig"
        for b in range(4)
    )
    q["minhash_lsh_dedup"] = f"""
        WITH {_SQL_SHINGLES},
        sig AS (SELECT doc_id, {minhash_cols} FROM shingles GROUP BY doc_id),
        banded AS ({band_selects}),
        cand AS (
            SELECT DISTINCT a.doc_id AS id0, b.doc_id AS id1
            FROM banded a JOIN banded b USING (band, bsig)
            WHERE a.doc_id < b.doc_id
        ),
        sinter AS (
            SELECT c.id0, c.id1, count(*) AS n_inter
            FROM cand c
            JOIN shingles s0 ON s0.doc_id = c.id0
            JOIN shingles s1 ON s1.doc_id = c.id1 AND s1.shingle = s0.shingle
            GROUP BY 1, 2
        )
        SELECT i.id0, i.id1,
               round(i.n_inter * 1.0 / (z0.n_sh + z1.n_sh - i.n_inter), 5) AS jaccard
        FROM sinter i
        JOIN sh_sizes z0 ON z0.doc_id = i.id0
        JOIN sh_sizes z1 ON z1.doc_id = i.id1
        WHERE i.n_inter * 1.0 / (z0.n_sh + z1.n_sh - i.n_inter) >= 0.5
    """
    q["dedup_blocking_stats"] = f"""
        WITH {_SQL_SHINGLES},
        sig AS (SELECT doc_id, {minhash_cols} FROM shingles GROUP BY doc_id),
        banded AS ({band_selects}),
        cand AS (
            SELECT DISTINCT a.doc_id AS id0, b.doc_id AS id1
            FROM banded a JOIN banded b USING (band, bsig)
            WHERE a.doc_id < b.doc_id
        ),
        gold AS (SELECT doc_id, md5(text) AS grp FROM documents),
        gp AS (
            SELECT CAST(coalesce(sum(s * (s - 1) / 2), 0) AS BIGINT) AS gold_pairs
            FROM (SELECT count(*) AS s FROM gold GROUP BY grp)
        ),
        ret AS (
            SELECT CAST(count(*) AS BIGINT) AS retained
            FROM cand c
            JOIN gold g0 ON g0.doc_id = c.id0
            JOIN gold g1 ON g1.doc_id = c.id1
            WHERE g0.grp = g1.grp
        ),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand)
        SELECT nn.n AS n_strings, nc.n_cand AS n_candidates,
               gp.gold_pairs AS n_gold_pairs,
               round(CASE WHEN gp.gold_pairs > 0
                          THEN ret.retained * 1.0 / gp.gold_pairs
                          ELSE 1.0 END, 6) AS pair_completeness,
               round(1.0 - nc.n_cand * 1.0 / (nn.n * (nn.n - 1) / 2.0), 6)
                   AS reduction_ratio
        FROM nn, nc, gp, ret
    """

    # delta dedup = the full pair set restricted to pairs touching an odd
    # (delta) doc_id — band-sharing is symmetric, so the incremental
    # band-index join finds exactly these
    q["minhash_dedup_delta"] = (
        q["minhash_lsh_dedup"]
        + " AND (i.id0 % 2 = 1 OR i.id1 % 2 = 1)"
    )

    lang_cases = []
    for lang in ["en", "de", "fr", "es"]:
        lang_cases.append(
            f"len(list_filter(ws, x -> list_contains({_sql_lang_markers(lang)}, x)))"
            f" AS n_{lang}"
        )
    q["text_quality_profile"] = f"""
        WITH w AS (
            SELECT doc_id, text,
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               x -> x != '') AS ws
            FROM documents
        ),
        feats AS (
            SELECT doc_id, text, ws, len(ws) AS n_tok,
                   {', '.join(lang_cases)},
                   len(list_filter(ws, x -> list_contains({sw}, x))) AS n_stop,
                   length(text) AS n_ch,
                   length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_clean
            FROM w
        ),
        scored AS (
            SELECT doc_id,
                CASE WHEN greatest(n_en, n_de, n_fr, n_es) = 0 THEN 'und'
                     WHEN n_en = greatest(n_en, n_de, n_fr, n_es) THEN 'en'
                     WHEN n_de = greatest(n_en, n_de, n_fr, n_es) THEN 'de'
                     WHEN n_fr = greatest(n_en, n_de, n_fr, n_es) THEN 'fr'
                     ELSE 'es' END AS lang_pred,
                n_tok,
                CASE WHEN n_tok > 0 THEN n_stop * 1.0 / n_tok ELSE 0.0 END AS swr,
                CASE WHEN n_ch > 0 THEN (n_ch - n_clean) * 1.0 / n_ch ELSE 0.0 END AS pr,
                text
            FROM feats
        )
        SELECT doc_id, lang_pred, n_tok,
               round(swr, 6) AS sw_ratio, round(pr, 6) AS p_ratio,
               (CASE WHEN n_tok = 0 THEN 0.0 ELSE round(
                   0.4 * (CASE WHEN n_tok BETWEEN 10 AND 10000 THEN 1.0
                               WHEN n_tok > 0 THEN 0.5 ELSE 0.0 END)
                 + 0.3 * (CASE WHEN swr BETWEEN 0.05 AND 0.7 THEN 1.0 ELSE 0.0 END)
                 + 0.3 * (CASE WHEN pr <= 0.2 THEN 1.0
                               WHEN pr <= 0.4 THEN 0.5 ELSE 0.0 END), 6) END)::DOUBLE
                 AS quality,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM scored
    """

    q["ann_cosine_topk"] = """
        WITH ranked AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))
                   AS cos
            FROM embeddings q, embeddings c
            WHERE q.vec_id < 8 AND q.vec_id != c.vec_id
        ),
        topk AS (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM ranked
        )
        SELECT query_id, neighbor_id, round(cos, 5) AS cos, rank
        FROM topk WHERE rank <= 5
    """

    # paragraph dedup over deterministic 3-doc sliding-window synth docs;
    # oracle groups by the normalized paragraph itself (Spark groups by its
    # md5 — injective, same partition)
    q["dedup_paragraphs"] = """
        WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        synth AS (
            SELECT a.doc_id,
                   a.text || chr(10) || b.text || chr(10) || c.text AS text
            FROM d a
            JOIN d b ON b.doc_id = a.doc_id + 1
            JOIN d c ON c.doc_id = a.doc_id + 2
        ),
        paras AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, chr(10)), 1) AS pos,
                   unnest(string_split(text, chr(10))) AS para
            FROM synth
        ),
        pdf AS (
            SELECT doc_id, pos, para, lower(trim(para)) AS np
            FROM paras WHERE lower(trim(para)) != ''
        ),
        hot AS (
            SELECT np FROM pdf GROUP BY np HAVING count(DISTINCT doc_id) >= 2
        ),
        kept AS (SELECT * FROM pdf WHERE np NOT IN (SELECT np FROM hot)),
        reasm AS (
            SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text_clean,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        ),
        totals AS (SELECT doc_id, count(*) AS n_total FROM pdf GROUP BY doc_id)
        SELECT t.doc_id, coalesce(r.text_clean, '') AS text_clean,
               CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(t.n_total - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
        FROM totals t LEFT JOIN reasm r ON r.doc_id = t.doc_id
    """

    # int8 quantization: floor(v·127 + 0.5) (floor-plus-half, not round —
    # HALF_UP vs banker's rounding differ on exact half-ties); integer dot
    # products are exact in both engines, so cosines match bit-for-bit
    q["ann_quantized_topk"] = """
        WITH qv AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 127 + 0.5) AS BIGINT))
                       AS qvec
            FROM embeddings
        ),
        ranked AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   list_dot_product(q.qvec, c.qvec)
                   / (sqrt(list_dot_product(q.qvec, q.qvec))
                      * sqrt(list_dot_product(c.qvec, c.qvec))) AS cos
            FROM qv q, qv c
            WHERE q.vec_id < 8 AND q.vec_id != c.vec_id
        ),
        topk AS (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM ranked
        )
        SELECT query_id, neighbor_id, round(cos, 5) AS cos, rank
        FROM topk WHERE rank <= 5
    """

    # lsh (measured recall 1.0 at fixed seed) and ivf (nprobe = n_cells →
    # exact by construction) both reproduce the exact top-k — same oracle
    q["ann_lsh_topk"] = q["ann_cosine_topk"]
    q["ann_ivf_topk"] = q["ann_cosine_topk"]
    # two-level coarse quantizer, all cells probed → exact by construction
    q["ann_ivf2_topk"] = q["ann_cosine_topk"]
    # PQ with the refine shortlist sized off the corpus count (rf·k ≥ n at
    # any sf) → the exact-cosine re-rank IS the result; same oracle.
    # IVF-PQ additionally probes every cell → same anchor.
    q["ann_pq_topk"] = q["ann_cosine_topk"]
    q["ann_ivfpq_topk"] = q["ann_cosine_topk"]

    # Gopher repetition signals: per-doc n-gram char-mass integers.
    # DuckDB list slicing is 1-based inclusive; range(0, greatest(m, 0))
    # yields no windows for docs shorter than n (left join -> coalesce 0)
    _rep_branches = r"""
        WITH w AS (SELECT doc_id,
                          list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                      x -> x <> '') AS ws
                   FROM documents),
        base AS (SELECT doc_id,
                        CAST(length(array_to_string(ws, ' ')) AS BIGINT) AS n_chars_norm,
                        ws
                 FROM w),
        a2 AS (SELECT doc_id, max(occ*l) AS top2,
                      sum(CASE WHEN occ >= 2 THEN occ*l ELSE 0 END) AS dup2
               FROM (SELECT doc_id, g, count(*) AS occ, max(length(g)) AS l
                     FROM (SELECT doc_id, array_to_string(ws[i+1:i+2], ' ') AS g
                           FROM (SELECT doc_id, ws,
                                        unnest(range(0, greatest(len(ws)-1, 0))) AS i
                                 FROM base))
                     GROUP BY doc_id, g)
               GROUP BY doc_id),
        a3 AS (SELECT doc_id, max(occ*l) AS top3
               FROM (SELECT doc_id, g, count(*) AS occ, max(length(g)) AS l
                     FROM (SELECT doc_id, array_to_string(ws[i+1:i+3], ' ') AS g
                           FROM (SELECT doc_id, ws,
                                        unnest(range(0, greatest(len(ws)-2, 0))) AS i
                                 FROM base))
                     GROUP BY doc_id, g)
               GROUP BY doc_id),
        a5 AS (SELECT doc_id,
                      sum(CASE WHEN occ >= 2 THEN occ*l ELSE 0 END) AS dup5
               FROM (SELECT doc_id, g, count(*) AS occ, max(length(g)) AS l
                     FROM (SELECT doc_id, array_to_string(ws[i+1:i+5], ' ') AS g
                           FROM (SELECT doc_id, ws,
                                        unnest(range(0, greatest(len(ws)-4, 0))) AS i
                                 FROM base))
                     GROUP BY doc_id, g)
               GROUP BY doc_id),
        prof AS (SELECT b.doc_id, b.n_chars_norm,
                        CAST(coalesce(a2.top2, 0) AS BIGINT) AS top2_gram_chars,
                        CAST(coalesce(a3.top3, 0) AS BIGINT) AS top3_gram_chars,
                        CAST(coalesce(a2.dup2, 0) AS BIGINT) AS dup2_gram_chars,
                        CAST(coalesce(a5.dup5, 0) AS BIGINT) AS dup5_gram_chars
                 FROM base b
                 LEFT JOIN a2 USING (doc_id)
                 LEFT JOIN a3 USING (doc_id)
                 LEFT JOIN a5 USING (doc_id))
    """
    q["repetition_profile"] = _rep_branches + r"""
        SELECT doc_id, n_chars_norm, top2_gram_chars, top3_gram_chars,
               dup2_gram_chars, dup5_gram_chars
        FROM prof
    """
    # the gate: integer-arithmetic thresholds (x1000 milli-units) — keep
    # iff every rule passes; 8% top-2, 6% top-3, 10% dup-5
    q["gopher_repetition_filter"] = _rep_branches + r"""
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d
        JOIN prof p ON p.doc_id = d.doc_id
        WHERE p.top2_gram_chars * 1000 <= 80 * p.n_chars_norm
          AND p.top3_gram_chars * 1000 <= 60 * p.n_chars_norm
          AND p.dup5_gram_chars * 1000 <= 100 * p.n_chars_norm
    """

    # duplicated-span profile: k=4 token windows WITH multiplicity; a
    # window is duplicated when its exact text occurs >= 2 times anywhere
    # (Spark groups by the window's md5 — injective, same partition)
    q["dup_span_profile"] = r"""
        WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
                   FROM documents),
        win AS (
            SELECT doc_id,
                   CASE WHEN len(ws) >= 4 THEN array_to_string(ws[i+1:i+4], ' ')
                        ELSE array_to_string(ws, ' ') END AS wtext
            FROM (SELECT doc_id, ws,
                         unnest(CASE WHEN len(ws) >= 4 THEN range(0, len(ws)-3)
                                     ELSE [0] END) AS i
                  FROM w)
        ),
        occ AS (SELECT wtext, count(*) AS occ FROM win GROUP BY wtext)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               round(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS dup_frac
        FROM win JOIN occ USING (wtext)
        GROUP BY doc_id
    """

    # the document-level gate on the same profile (unrounded fraction)
    q["drop_dup_span_docs"] = r"""
        WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
                   FROM documents),
        win AS (
            SELECT doc_id,
                   CASE WHEN len(ws) >= 4 THEN array_to_string(ws[i+1:i+4], ' ')
                        ELSE array_to_string(ws, ' ') END AS wtext
            FROM (SELECT doc_id, ws,
                         unnest(CASE WHEN len(ws) >= 4 THEN range(0, len(ws)-3)
                                     ELSE [0] END) AS i
                  FROM w)
        ),
        occ AS (SELECT wtext, count(*) AS occ FROM win GROUP BY wtext),
        prof AS (
            SELECT doc_id,
                   sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE) AS frac
            FROM win JOIN occ USING (wtext)
            GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d JOIN prof p ON p.doc_id = d.doc_id
        WHERE p.frac <= 0.2
    """

    # span-level removal on the same signal: every token position covered
    # by a duplicated k=4 window is cut; survivors reassemble in original
    # order (original case; duplication test is case-folded like Spark's
    # md5(lower(...)) window hash)
    q["remove_dup_spans"] = r"""
        WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
                   FROM documents),
        win AS (
            SELECT doc_id, i,
                   CASE WHEN len(ws) >= 4
                        THEN lower(array_to_string(ws[i+1:i+4], ' '))
                        ELSE lower(array_to_string(ws, ' ')) END AS wtext,
                   CASE WHEN len(ws) >= 4 THEN 4 ELSE len(ws) END AS clen
            FROM (SELECT doc_id, ws,
                         unnest(CASE WHEN len(ws) >= 4 THEN range(0, len(ws)-3)
                                     ELSE [0] END) AS i
                  FROM w)
        ),
        occ AS (SELECT wtext, count(*) AS occ FROM win GROUP BY wtext),
        dup AS (SELECT doc_id, i, clen FROM win JOIN occ USING (wtext)
                WHERE occ >= 2),
        cov AS (SELECT DISTINCT doc_id, unnest(range(i, i + clen)) AS pos
                FROM dup),
        tokpos AS (
            SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos,
                   unnest(ws) AS tok
            FROM w
        ),
        kept AS (
            SELECT t.* FROM tokpos t
            ANTI JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
        ),
        reasm AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        ),
        totals AS (SELECT doc_id, count(*) AS n_tokens FROM tokpos
                   GROUP BY doc_id)
        SELECT t.doc_id, coalesce(r.text_clean, '') AS text_clean,
               CAST(t.n_tokens AS BIGINT) AS n_tokens,
               CAST(t.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
        FROM totals t LEFT JOIN reasm r ON r.doc_id = t.doc_id
    """

    # NB-share quality classifier: md5-hashed bag-of-words (first 4 hex
    # digits mod 4096 — DuckDB parses the '0x' cast), Laplace-smoothed
    # target-share weights in integer milli-units (integer division
    # floors identically in both engines), integer dot-product score
    q["quality_classifier_score"] = r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
            FROM documents
        ),
        feats AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) % 4096 AS f,
                   count(*) AS x
            FROM toks WHERE tok != ''
            GROUP BY doc_id, f
        ),
        en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
        tc AS (SELECT f, sum(x) AS ct FROM feats
               WHERE doc_id IN (SELECT doc_id FROM en) GROUP BY f),
        rc AS (SELECT f, sum(x) AS cr FROM feats
               WHERE doc_id NOT IN (SELECT doc_id FROM en) GROUP BY f),
        w AS (
            SELECT coalesce(tc.f, rc.f) AS f,
                   (1000 * (coalesce(ct, 0) + 1))
                   // (coalesce(ct, 0) + coalesce(cr, 0) + 2) - 500 AS w_milli
            FROM tc FULL JOIN rc ON tc.f = rc.f
        )
        SELECT feats.doc_id,
               CAST(sum(x) AS BIGINT) AS n_toks,
               CAST(sum(x * coalesce(w_milli, 0)) AS BIGINT) AS logit_milli
        FROM feats LEFT JOIN w USING (f)
        GROUP BY feats.doc_id
    """

    # BPE first-iteration pair counts: per-CHARACTER symbols (substr is
    # character-based like Spark's split-by-empty), end-of-word marker
    # appended to the last char, counts weighted by word frequency
    q["bpe_pair_counts"] = r"""
        WITH w AS (
            SELECT word, count(*) AS n
            FROM (SELECT unnest(string_split_regex(trim(lower(text)),
                                                   '\s+')) AS word
                  FROM documents)
            WHERE word != ''
            GROUP BY word
        ),
        pos AS (
            SELECT word, n, unnest(range(1, length(word))) AS i
            FROM w WHERE length(word) >= 2
        )
        SELECT substr(word, i, 1) AS l_sym,
               CASE WHEN i + 1 = length(word)
                    THEN substr(word, i + 1, 1) || chr(9601)
                    ELSE substr(word, i + 1, 1) END AS r_sym,
               CAST(sum(n) AS BIGINT) AS cnt
        FROM pos
        GROUP BY l_sym, r_sym
    """

    # as-of join: DuckDB's native ASOF LEFT JOIN is the oracle for the
    # union + carry-forward window realization; right side unique per
    # (user, ts) by the same pre-aggregation
    q["events_asof_click"] = r"""
        WITH purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT user_id, ts, max(value) AS click_value FROM events
            WHERE event_type = 'click'
            GROUP BY user_id, ts
        )
        SELECT p.event_id, p.user_id,
               epoch_us(p.ts) AS ts_us,
               epoch_us(c.ts) AS click_ts_us,
               round(c.click_value, 6) AS click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """

    # range join: purchases inside the first-signup 2h window; same
    # epoch-seconds doubles (micros/1e6) on both sides so the exact
    # [start, end) comparison is bit-identical
    q["events_interval_join"] = r"""
        WITH pts AS (
            SELECT event_id, user_id,
                   epoch_us(ts) / 1e6 AS ts_sec
            FROM events WHERE event_type = 'purchase'
        ),
        iv AS (
            SELECT user_id, min(epoch_us(ts) / 1e6) AS start
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id
        )
        SELECT p.event_id, p.user_id,
               CAST(p.ts_sec * 1e6 AS BIGINT) AS ts_us,
               CAST(i.start * 1e6 AS BIGINT) AS start_us
        FROM pts p JOIN iv i ON i.user_id = p.user_id
          AND p.ts_sec >= i.start AND p.ts_sec < i.start + 7200.0
    """

    # trained lang-ID: per-(lang, feature) NB-share integer weights fit
    # on 3/4 of the docs, integer argmax with (score desc, class asc)
    # winner on the held-out quarter
    q["lang_id_trained"] = r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
            FROM documents
        ),
        feats AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) % 4096 AS f,
                   count(*) AS x
            FROM toks WHERE tok != ''
            GROUP BY doc_id, f
        ),
        train AS (SELECT doc_id, lang FROM documents WHERE doc_id % 4 != 0),
        ccf AS (
            SELECT t.lang, f.f, sum(f.x) AS ccf
            FROM feats f JOIN train t USING (doc_id)
            GROUP BY t.lang, f.f
        ),
        cf AS (SELECT f, sum(ccf) AS cf FROM ccf GROUP BY f),
        w AS (
            SELECT ccf.lang, ccf.f,
                   (1000 * (ccf + 1)) // (cf + 2) - 500 AS w_milli
            FROM ccf JOIN cf USING (f)
        ),
        held AS (
            SELECT f.* FROM feats f
            WHERE f.doc_id % 4 = 0
        ),
        scores AS (
            SELECT h.doc_id, w.lang,
                   sum(h.x * w.w_milli) AS score_milli
            FROM held h JOIN w USING (f)
            GROUP BY h.doc_id, w.lang
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id
                ORDER BY score_milli DESC, lang) AS rn
            FROM scores
        )
        SELECT doc_id, lang AS pred_lang,
               CAST(score_milli AS BIGINT) AS score_milli
        FROM ranked WHERE rn = 1
    """

    # DSIR half-bit importance twin: same md5 feature hash; w_hbits =
    # flog2((ct+1)^2) - flog2((cr+1)^2) via binary-string lengths
    q["dsir_hbits_score"] = r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
            FROM documents
        ),
        feats AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) % 4096 AS f,
                   count(*) AS x
            FROM toks WHERE tok != ''
            GROUP BY doc_id, f
        ),
        en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
        tc AS (SELECT f, sum(x) AS ct FROM feats
               WHERE doc_id IN (SELECT doc_id FROM en) GROUP BY f),
        rc AS (SELECT f, sum(x) AS cr FROM feats
               WHERE doc_id NOT IN (SELECT doc_id FROM en) GROUP BY f),
        w AS (
            SELECT coalesce(tc.f, rc.f) AS f,
                   (length(bin((coalesce(ct, 0) + 1)
                               * (coalesce(ct, 0) + 1))) - 1)
                   - (length(bin((coalesce(cr, 0) + 1)
                                 * (coalesce(cr, 0) + 1))) - 1) AS w_hbits
            FROM tc FULL JOIN rc ON tc.f = rc.f
        )
        SELECT feats.doc_id,
               CAST(sum(x) AS BIGINT) AS n_toks,
               CAST(sum(x * coalesce(w_hbits, 0)) AS BIGINT) AS logit_hbits
        FROM feats LEFT JOIN w USING (f)
        GROUP BY feats.doc_id
    """

    # decontamination: distinct 3-word-gram overlap of each training doc
    # (doc_id % 37 != 0) against the benchmark slice (doc_id % 37 == 0);
    # word_shingles' short-doc rule = whole text as a single shingle
    q["decontam_overlap"] = r"""
        WITH tr AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
                    FROM documents WHERE doc_id % 37 != 0),
        ev AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
               FROM documents WHERE doc_id % 37 = 0),
        trg AS (
            SELECT DISTINCT doc_id,
                   CASE WHEN len(ts) >= 3 THEN array_to_string(ts[i+1:i+3], ' ')
                        ELSE array_to_string(ts, ' ') END AS shingle
            FROM (SELECT doc_id, ts,
                         unnest(CASE WHEN len(ts) >= 3 THEN range(0, len(ts)-2)
                                     ELSE [0] END) AS i
                  FROM tr)
        ),
        evg AS (
            SELECT DISTINCT
                   CASE WHEN len(ts) >= 3 THEN array_to_string(ts[i+1:i+3], ' ')
                        ELSE array_to_string(ts, ' ') END AS shingle
            FROM (SELECT doc_id, ts,
                         unnest(CASE WHEN len(ts) >= 3 THEN range(0, len(ts)-2)
                                     ELSE [0] END) AS i
                  FROM ev)
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_ngrams,
               CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM evg)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               round(sum(CASE WHEN shingle IN (SELECT shingle FROM evg)
                              THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS overlap_frac
        FROM trg GROUP BY doc_id
    """

    # decontaminate = the overlap gate as a semi-join (unrounded fraction)
    q["decontaminate_docs"] = r"""
        WITH tr AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
                    FROM documents WHERE doc_id % 37 != 0),
        ev AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
               FROM documents WHERE doc_id % 37 = 0),
        trg AS (
            SELECT DISTINCT doc_id,
                   CASE WHEN len(ts) >= 3 THEN array_to_string(ts[i+1:i+3], ' ')
                        ELSE array_to_string(ts, ' ') END AS shingle
            FROM (SELECT doc_id, ts,
                         unnest(CASE WHEN len(ts) >= 3 THEN range(0, len(ts)-2)
                                     ELSE [0] END) AS i
                  FROM tr)
        ),
        evg AS (
            SELECT DISTINCT
                   CASE WHEN len(ts) >= 3 THEN array_to_string(ts[i+1:i+3], ' ')
                        ELSE array_to_string(ts, ' ') END AS shingle
            FROM (SELECT doc_id, ts,
                         unnest(CASE WHEN len(ts) >= 3 THEN range(0, len(ts)-2)
                                     ELSE [0] END) AS i
                  FROM ev)
        ),
        ov AS (
            SELECT doc_id,
                   sum(CASE WHEN shingle IN (SELECT shingle FROM evg)
                            THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE) AS frac
            FROM trg GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d JOIN ov ON ov.doc_id = d.doc_id
        WHERE ov.frac <= 0.05
    """

    # temperature mixture: rate = n^(1/T - 1) max-normalized, T=2; 9 dp
    # rounding absorbs libm pow ulp differences
    q["mixture_rates_lang"] = """
        WITH c AS (SELECT lang AS domain, CAST(count(*) AS BIGINT) AS n_docs
                   FROM documents GROUP BY lang),
        r AS (SELECT domain, n_docs,
                     pow(CAST(n_docs AS DOUBLE), -0.5) AS raw FROM c),
        m AS (SELECT max(raw) AS m FROM r)
        SELECT domain, n_docs, round(raw / m, 9) AS rate FROM r, m
    """

    # per-domain cap: top-70 per lang by the seed-keyed u48 DESC (exact in
    # a double: 48 bits), ties (impossible in practice) on doc_id
    q["cap_per_domain"] = """
        WITH k AS (
            SELECT doc_id, lang, source, n_chars,
                   CAST(CONCAT('0x', substr(
                       md5(CONCAT(CAST(doc_id AS VARCHAR), ':0')), 1, 12))
                       AS BIGINT) / 281474976710656.0 AS kk
            FROM documents
        ),
        r AS (SELECT doc_id, lang, source, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY kk DESC, doc_id ASC) AS rk
              FROM k)
        SELECT doc_id, lang, source, n_chars FROM r WHERE rk <= 70
    """

    # C4 line rules over the same deterministic multi-line dressing the
    # Spark query synthesizes; keep-predicate and re-assembly replayed in
    # list/window SQL
    _c4_synth_sql = """
        synth AS (
            SELECT doc_id,
                   concat_ws(chr(10),
                       substr(text, 1, 60) || ' end.',
                       '- nav menu item',
                       'Click here to read more...',
                       CASE WHEN doc_id % 13 = 0 THEN 'tiny.'
                            ELSE substr(text, 21, 50) || ' fine!' END,
                       'Please enable JavaScript to continue.',
                       CASE WHEN doc_id % 7 = 0
                            THEN 'the lorem ipsum block sits here.' END,
                       CASE WHEN doc_id % 11 = 0
                            THEN 'function() {{ return 0; }}' END
                   ) AS text
            FROM documents
        ),
        lines AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, chr(10)), 1) AS pos,
                   unnest(string_split(text, chr(10))) AS line
            FROM {src}
        ),
        nz AS (
            SELECT doc_id, pos, line, trim(line) AS l
            FROM lines WHERE trim(line) != ''
        )
    """

    q["c4_line_filter"] = (
        "WITH "
        + _c4_synth_sql.format(src="gated").replace(
            "FROM documents\n        ),",
            """FROM documents
        ),
        gated AS (
            SELECT * FROM synth
            WHERE NOT contains(lower(text), 'lorem ipsum')
              AND NOT contains(lower(text), '{')
        ),""",
            1,
        )
        + r""",
        marked AS (
            SELECT doc_id, pos, line,
                   (right(l, 1) IN ('.', '!', '?', '"')
                    AND length(regexp_extract_all(l, '\S+')) >= 3
                    AND left(l, 1) NOT IN ('-', '*', '•')
                    AND NOT l LIKE '%...'
                    AND NOT contains(lower(l), 'javascript')) AS keep
            FROM nz
        )
        SELECT doc_id,
               coalesce(
                   string_agg(CASE WHEN keep THEN line END, chr(10)
                              ORDER BY pos),
                   '') AS text_clean,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_dropped
        FROM marked GROUP BY doc_id
        HAVING sum(CASE WHEN keep THEN 1 ELSE 0 END) >= 2
    """
    )

    q["line_quality_profile"] = (
        "WITH "
        + _c4_synth_sql.format(src="synth")
        + r"""
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN right(l, 1) IN ('.', '!', '?', '"')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_terminal,
               CAST(sum(CASE WHEN left(l, 1) IN ('-', '*', '•')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet,
               CAST(sum(CASE WHEN l LIKE '%...' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ellipsis,
               CAST(sum(CASE WHEN length(regexp_extract_all(l, '\S+')) < 3
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_short
        FROM nz GROUP BY doc_id
    """
    )

    # PII masking: identical pattern strings (Java-regex ∩ RE2 dialect),
    # identical application order (email → ssn → phone → ipv4); counts are
    # pre-redaction
    q["redact_pii_docs"] = r"""
        WITH synth AS (
            SELECT doc_id,
                   substr(text, 1, 80) || ' contact u'
                   || CAST(doc_id AS VARCHAR) || '@Example-mail.org'
                   || CASE WHEN doc_id % 2 = 0
                           THEN ' call 555-867-5309 now' ELSE '' END
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' from 10.' || CAST(doc_id % 250 AS VARCHAR)
                                || '.0.42 ok' ELSE '' END
                   || CASE WHEN doc_id % 5 = 0
                           THEN ' id 123-45-6789 end' ELSE '' END AS text
            FROM documents
        ),
        counted AS (
            SELECT doc_id, text,
                   CAST(length(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS BIGINT) AS n_email,
                   CAST(length(regexp_extract_all(text,
                       '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
                   CAST(length(regexp_extract_all(text,
                       '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phone,
                   CAST(length(regexp_extract_all(text,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                       AS BIGINT) AS n_ipv4
            FROM synth
        )
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                   '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g')
                   AS text,
               n_email, n_ssn, n_phone, n_ipv4
        FROM counted
    """

    # deterministic mixture sample: keep iff u48(doc_id, seed=0) < rate(lang);
    # langs absent from the rate table (zh, es) drop
    q["mixture_sample_docs"] = """
        SELECT doc_id, lang, source FROM documents
        WHERE CAST(CONCAT('0x', substr(
                  md5(CONCAT(CAST(doc_id AS VARCHAR), ':0')), 1, 12))
                  AS BIGINT) / 281474976710656.0
              < CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5
                          WHEN 'fr' THEN 1.0 ELSE NULL END
    """

    # shuffle-shard: rank by the seed-keyed u48, deal round-robin into 4
    q["shuffle_shard_docs"] = """
        WITH u AS (
            SELECT doc_id, lang,
                   CAST(CONCAT('0x', substr(
                       md5(CONCAT(CAST(doc_id AS VARCHAR), ':1')), 1, 12))
                       AS BIGINT) / 281474976710656.0 AS uu
            FROM documents
        ),
        r AS (SELECT doc_id, lang,
                     row_number() OVER (ORDER BY uu, doc_id) - 1 AS rk
              FROM u)
        SELECT CAST(rk % 4 AS INTEGER) AS shard, CAST(rk // 4 AS BIGINT) AS pos,
               doc_id, lang
        FROM r
    """

    # prefix join: exact ≥-threshold set-similarity — oracle enumerates ALL
    # shared-token pairs (no df cap) and filters on the exact score
    q["prefix_join_pairs"] = f"""
        WITH {_SQL_TOKEN_BASE},
        tsets AS (SELECT DISTINCT string, token FROM tf),
        allpairs AS (
            SELECT DISTINCT a.string AS s0, b.string AS s1
            FROM tsets a JOIN tsets b USING (token)
            WHERE a.string < b.string
        ),
        ainter AS (
            SELECT p.s0, p.s1, sum(w.weight) AS iw_sum
            FROM allpairs p
            JOIN tsets t0 ON t0.string = p.s0
            JOIN tsets t1 ON t1.string = p.s1 AND t1.token = t0.token
            JOIN weights w ON w.token = t0.token
            GROUP BY 1, 2
        ),
        ascored AS (
            SELECT p.s0, p.s1,
                   coalesce(i.iw_sum, 0) /
                   (n0.w_sum + n1.w_sum - coalesce(i.iw_sum, 0)) AS score
            FROM allpairs p
            LEFT JOIN ainter i ON i.s0 = p.s0 AND i.s1 = p.s1
            JOIN norms n0 ON n0.string = p.s0
            JOIN norms n1 ON n1.string = p.s1
        )
        SELECT s0, s1, round(score, 5) AS score FROM ascored WHERE score >= 0.25
    """

    q["unite_nearest_voronoi"] = """
        WITH assign AS (
            SELECT cast(e.vec_id AS VARCHAR) AS string,
                   cast(s.vec_id AS VARCHAR) AS seed,
                   list_dot_product(e.embedding::DOUBLE[], s.embedding::DOUBLE[]) AS cos
            FROM embeddings e, embeddings s
            WHERE s.vec_id < 5
        ),
        best AS (
            SELECT string, seed,
                   row_number() OVER (PARTITION BY string
                                      ORDER BY cos DESC, seed) AS rn
            FROM assign
        ),
        grp AS (SELECT string, seed FROM best WHERE rn = 1)
        SELECT string, 1::BIGINT AS count,
               min(string) OVER (PARTITION BY seed) AS "group"
        FROM grp
    """

    q["events_dedup_first"] = """
        SELECT user_id, event_type, event_id, round(value, 6) AS value FROM (
            SELECT user_id, event_type, event_id, value,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """

    # winnowing (k=8, window=4): md5 k-gram hashes, per-window lexicographic
    # min, distinct; then the standard block→intersect→jaccard over fp sets
    q["winnow_near_pairs"] = r"""
        WITH w0 AS (SELECT doc_id, lower(trim(text)) AS s FROM documents
                    WHERE doc_id < 250),
        g AS (
            SELECT doc_id, s,
                   CASE WHEN len(s) >= 8
                        THEN list_transform(range(1, len(s) - 6), i -> md5(s[i:i+7]))
                        ELSE []::VARCHAR[] END AS grams
            FROM w0
        ),
        m AS (
            SELECT doc_id,
                   CASE WHEN len(grams) >= 4
                        THEN list_transform(range(1, len(grams) - 2),
                                            j -> list_aggregate(grams[j:j+3], 'min'))
                        WHEN len(grams) > 0 THEN grams
                        ELSE [md5(s)] END AS mins
            FROM g
        ),
        fps AS (SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m),
        fsizes AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY 1),
        fdfreq AS (SELECT fp, count(*) AS df FROM fps GROUP BY 1),
        felig AS (SELECT fp FROM fdfreq WHERE df BETWEEN 2 AND 1000),
        fcand AS (
            SELECT DISTINCT a.doc_id AS id0, b.doc_id AS id1
            FROM (SELECT f.* FROM fps f JOIN felig USING (fp)) a
            JOIN (SELECT f.* FROM fps f JOIN felig USING (fp)) b USING (fp)
            WHERE a.doc_id < b.doc_id
        ),
        finter AS (
            SELECT c.id0, c.id1, count(*) AS n_inter
            FROM fcand c
            JOIN fps f0 ON f0.doc_id = c.id0
            JOIN fps f1 ON f1.doc_id = c.id1 AND f1.fp = f0.fp
            GROUP BY 1, 2
        )
        SELECT i.id0, i.id1,
               round(i.n_inter * 1.0 / (z0.n_fp + z1.n_fp - i.n_inter), 5) AS jaccard
        FROM finter i
        JOIN fsizes z0 ON z0.doc_id = i.id0
        JOIN fsizes z1 ON z1.doc_id = i.id1
        WHERE i.n_inter * 1.0 / (z0.n_fp + z1.n_fp - i.n_inter) >= 0.2
    """

    q["sorted_neighborhood_pairs"] = f"""
        WITH u AS (SELECT DISTINCT p_name AS string FROM part),
        k AS (SELECT string, {_sql_simplify_corp('string')} AS key FROM u),
        r AS (SELECT string,
                     row_number() OVER (ORDER BY key, string) - 1 AS rnk
              FROM k)
        SELECT a.string AS s0, b.string AS s1,
               cast(b.rnk - a.rnk AS INT) AS rank_distance
        FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 2
    """

    # multimodal fake decoder byte math: payload = utf-8 text; h = sha256;
    # width = 16 + h[4] % 240, height = 16 + h[5] % 240, luma = h[6]/255
    # (byte k = hex chars 2k+1..2k+2, 1-based)
    def _sha_byte(k: int) -> str:
        hx = "sha256(text)"
        return (
            f"(16 * (instr('0123456789abcdef', substr({hx}, {2*k+1}, 1)) - 1)"
            f" + (instr('0123456789abcdef', substr({hx}, {2*k+2}, 1)) - 1))"
        )

    q["multimodal_image_features"] = f"""
        SELECT doc_id AS media_id,
               16 + {_sha_byte(4)} % 240 AS width,
               16 + {_sha_byte(5)} % 240 AS height,
               round({_sha_byte(6)} / 255.0, 5) AS mean_luma
        FROM documents
    """

    # frame indices = F.sequence(0, n_frames-1, step) over meta n_frames
    # (= n_chars) — DuckDB range(0, n, step) enumerates the same set
    q["multimodal_video_frames"] = """
        SELECT doc_id AS media_id,
               unnest(range(0, coalesce(n_chars, 30), 10)) AS frame_idx,
               true AS decoded
        FROM documents
    """

    # audio fake decoder byte math (multimodal.py _decode_audio_fake):
    # sample_rate from byte 7 % 4; n_samples = 1000 + (b8·256 + b9) % 100000;
    # duration = n_samples / sample_rate (exact-int double division both
    # engines); rms = b10 / 255
    q["multimodal_audio_features"] = f"""
        WITH a AS (
            SELECT doc_id AS media_id,
                   CASE ({_sha_byte(7)}) % 4
                        WHEN 0 THEN 8000 WHEN 1 THEN 16000
                        WHEN 2 THEN 22050 ELSE 44100 END AS sample_rate,
                   1000 + (256 * ({_sha_byte(8)}) + ({_sha_byte(9)}))
                        % 100000 AS n_samples,
                   {_sha_byte(10)} / 255.0 AS rms0
            FROM documents
        )
        SELECT media_id, sample_rate, cast(n_samples AS BIGINT) AS n_samples,
               cast(floor(n_samples * 1.0 / sample_rate * 1000000.0)
                    AS BIGINT) AS duration_us,
               round(rms0, 5) AS rms
        FROM a
    """

    # iter_scores: Z = max(α(1−dot), ε); loss = Y·Z − xlogy(1−Y, 1−e^(−Z)),
    # then the reference's weighted form squares it (weights are 1 here)
    q["pair_losses"] = """
        WITH pairs AS (
            SELECT cast(a.vec_id AS VARCHAR) AS string0,
                   cast(b.vec_id AS VARCHAR) AS string1,
                   cast(a.label AS VARCHAR) AS group0,
                   cast(b.label AS VARCHAR) AS group1,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS dot,
                   (a.label = b.label) AS is_match
            FROM embeddings a, embeddings b
            -- pair orientation follows the STRING universe (s0 < s1 on the
            -- stringified ids), not the numeric ids
            WHERE cast(a.vec_id AS VARCHAR) < cast(b.vec_id AS VARCHAR)
              AND list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
        ),
        scored AS (
            SELECT *,
                   least(1.0, exp(-20.0 * (1.0 - dot))) AS score,
                   greatest(20.0 * (1.0 - dot), 1e-6) AS z
            FROM pairs
        ),
        lossed AS (
            SELECT *,
                   CASE WHEN is_match THEN z ELSE -ln(1.0 - exp(-z)) END AS loss0
            FROM scored
        )
        SELECT string0, string1, group0, group1,
               round(dot, 5) AS cos, round(score, 6) AS score,
               round(loss0 * loss0, 6) AS loss, is_match
        FROM lossed
        WHERE score >= exp(-20.0 * (1.0 - 0.3))
    """

    q["embedding_threshold_pairs"] = """
        SELECT a.vec_id AS id0, b.vec_id AS id1,
               round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
               / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 5)
               AS cos
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                 * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
              >= 0.5
    """

    flagship_prefix = f"""
        WITH RECURSIVE
        v AS ({_SQL_VARIANTS}),
        kk AS (SELECT string, {_sql_simplify_corp('string')} AS norm FROM v),
        keyed AS (SELECT * FROM kk WHERE norm != ''),
        exact_edges AS (
            SELECT a.string AS u, b.string AS v
            FROM keyed a JOIN keyed b ON a.norm = b.norm AND a.string < b.string
        ),
        u AS (SELECT DISTINCT norm AS string FROM keyed),
        {_SQL_NMGRAM_TOKSIM},
        tok_edges AS (
            SELECT k0.string AS u, k1.string AS v
            FROM (SELECT s0, s1 FROM gscored WHERE score >= 0.7) e
            JOIN keyed k0 ON k0.norm = e.s0
            JOIN keyed k1 ON k1.norm = e.s1
        )
    """

    flagship_cte = flagship_prefix + f""",
        all_edges AS (
            SELECT u, v FROM exact_edges UNION SELECT u, v FROM tok_edges
        ),
        nodes AS (SELECT string AS node FROM v),
        {_sql_cc_reach('nodes', 'all_edges')}
    """

    q["pipeline_cluster_flagship"] = flagship_cte + """
        SELECT node AS string, 1::BIGINT AS count, min(r) AS "group"
        FROM reach GROUP BY node
    """

    # B3 embedding edges — embed_strings_md5's exact bit math (embed.py):
    # char 2/3-grams of chr(2)||s||chr(3); dim = 4th md5 hex digit (D = 16),
    # sign = parity of the 5th; signed counts per dim (exact integers), cos =
    # dot / (nrm0·nrm1). Dots/norms are sums of small integers → exact in
    # double on both engines; only the final normalize/divide rounds, leaving
    # ~1e-15 margin at the 0.75 threshold.
    flagship3_cte = flagship_prefix + f""",
        em_grams AS (
            SELECT string, unnest(list_concat(
                list_transform(range(1, len(p)), i -> p[i:i+1]),
                CASE WHEN len(p) >= 3
                     THEN list_transform(range(1, len(p) - 1), i -> p[i:i+2])
                     ELSE []::VARCHAR[] END)) AS g
            FROM (SELECT string, chr(2) || string || chr(3) AS p FROM u)
        ),
        em_feat AS (
            SELECT string,
                   instr('0123456789abcdef', substr(md5(g), 4, 1)) - 1 AS dim,
                   CASE WHEN (instr('0123456789abcdef', substr(md5(g), 5, 1)) - 1)
                             % 2 = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM em_grams
        ),
        em_vec AS (SELECT string, dim, cast(sum(sgn) AS DOUBLE) AS val
                   FROM em_feat GROUP BY 1, 2),
        em_nrm AS (SELECT string, sqrt(sum(val * val)) AS nrm
                   FROM em_vec GROUP BY 1),
        em_sim AS (
            SELECT a.string AS s0, b.string AS s1, sum(a.val * b.val) AS dot
            FROM em_vec a JOIN em_vec b ON a.dim = b.dim AND a.string < b.string
            GROUP BY 1, 2
        ),
        emb_norm_edges AS (
            SELECT s.s0, s.s1
            FROM em_sim s
            JOIN em_nrm n0 ON n0.string = s.s0
            JOIN em_nrm n1 ON n1.string = s.s1
            WHERE n0.nrm > 0 AND n1.nrm > 0
              AND s.dot / (n0.nrm * n1.nrm) >= 0.75
        ),
        emb_edges AS (
            SELECT k0.string AS u, k1.string AS v
            FROM emb_norm_edges e
            JOIN keyed k0 ON k0.norm = e.s0
            JOIN keyed k1 ON k1.norm = e.s1
        ),
        all_edges AS (
            SELECT u, v FROM exact_edges
            UNION SELECT u, v FROM tok_edges
            UNION SELECT u, v FROM emb_edges
        ),
        nodes AS (SELECT string AS node FROM v),
        {_sql_cc_reach('nodes', 'all_edges')}
    """

    q["pipeline_cluster_flagship_3pass"] = flagship3_cte + """
        SELECT node AS string, 1::BIGINT AS count, min(r) AS "group"
        FROM reach GROUP BY node
    """

    # same closure, joined back at record scale (assign_records)
    q["assign_records"] = flagship_cte + """
        SELECT node AS repo, min(r) AS entity_group
        FROM reach GROUP BY node
    """

    # bigram Laplace surprisal in whole bits: floor_log2(x) =
    # length(bin(x)) - 1 on exact integer counts — engine-portable where
    # float log sums are not; fit slice doc_id % 3 != 0, scored slice == 0
    q["ngram_lm_surprisal"] = r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> x != '') AS l
            FROM documents
        ),
        ref_u AS (
            SELECT doc_id, l, generate_subscripts(l, 1) AS i,
                   unnest(l) AS token
            FROM toks WHERE doc_id % 3 != 0 AND len(l) > 0
        ),
        ref_rows AS (
            SELECT CASE WHEN i = 1 THEN '<s>' ELSE l[i - 1] END AS context,
                   token
            FROM ref_u
        ),
        model AS (
            SELECT context, token, count(*) AS c
            FROM ref_rows GROUP BY context, token
        ),
        v AS (SELECT count(DISTINCT token) AS v FROM model),
        ctx_tot AS (
            SELECT context, sum(c) AS ctx_c FROM model GROUP BY context
        ),
        cand_u AS (
            SELECT doc_id, l, generate_subscripts(l, 1) AS i,
                   unnest(l) AS token
            FROM toks WHERE doc_id % 3 = 0 AND len(l) > 0
        ),
        cand AS (
            SELECT doc_id,
                   CASE WHEN i = 1 THEN '<s>' ELSE l[i - 1] END AS context,
                   token
            FROM cand_u
        ),
        scored AS (
            SELECT cand.doc_id,
                   coalesce(m.c, 0) AS c,
                   coalesce(ct.ctx_c, 0) AS ctx_c
            FROM cand
            LEFT JOIN model m
              ON m.context = cand.context AND m.token = cand.token
            LEFT JOIN ctx_tot ct ON ct.context = cand.context
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum((length(bin(ctx_c + (SELECT v FROM v))) - 1)
                        - (length(bin(c + 1)) - 1)) AS BIGINT)
                   AS surprisal_bits
        FROM scored GROUP BY doc_id
    """

    # CCNet head/middle/tail over the surprisal scores: integer milli-
    # bits-per-token, total-order row_number rank, tertile by integer
    # rank arithmetic (the surprisal oracle nests as a subquery)
    q["lm_perplexity_buckets"] = f"""
        WITH surp AS ({q["ngram_lm_surprisal"]}),
        m AS (
            SELECT doc_id, n_tokens, surprisal_bits,
                   (surprisal_bits * 1000) // n_tokens AS milli_bits_per_tok
            FROM surp
        ),
        r AS (
            SELECT *, row_number() OVER (
                ORDER BY milli_bits_per_tok, doc_id) - 1 AS rnk
            FROM m
        ),
        c AS (SELECT count(*) AS n FROM m)
        SELECT doc_id, n_tokens, surprisal_bits, milli_bits_per_tok,
               CASE WHEN rnk * 3 < (SELECT n FROM c) THEN 'head'
                    WHEN rnk * 3 < 2 * (SELECT n FROM c) THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM r
    """

    # URL canonicalization replayed step-by-step (regexp_extract groups,
    # split_part fragment strip, first-'?' split, list_filter + list_sort
    # params, www/port/trailing-slash rules) — no capture-group replaces
    q["url_dedup"] = r"""
        WITH synth AS (
            SELECT doc_id,
                   CASE CAST(doc_id % 5 AS INTEGER)
                       WHEN 0 THEN 'HTTP://Example.com:80/p/'
                                   || CAST(doc_id // 5 AS VARCHAR)
                                   || '/?utm_source=x&b=2&a=1'
                       WHEN 1 THEN 'http://www.example.com/p/'
                                   || CAST(doc_id // 5 AS VARCHAR)
                                   || '?a=1&b=2'
                       WHEN 2 THEN 'http://example.com/p/'
                                   || CAST(doc_id // 5 AS VARCHAR)
                                   || '/?b=2&a=1#s'
                       WHEN 3 THEN 'https://Shop.example.com:443/item/'
                                   || CAST(doc_id // 5 AS VARCHAR)
                       ELSE 'plain text ' || CAST(doc_id // 5 AS VARCHAR)
                   END AS url
            FROM documents
        ),
        parsed AS (
            SELECT doc_id, trim(url) AS u,
                   lower(regexp_extract(trim(url),
                       '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$', 1))
                       AS scheme,
                   lower(regexp_extract(trim(url),
                       '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$', 2))
                       AS host0,
                   regexp_extract(trim(url),
                       '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$', 3)
                       AS rest
            FROM synth
        ),
        hosted AS (
            SELECT *, CASE WHEN host0 LIKE 'www.%' THEN substr(host0, 5)
                           ELSE host0 END AS host1
            FROM parsed
        ),
        pieces AS (
            SELECT doc_id, u, scheme,
                   CASE WHEN scheme = 'http' AND host1 LIKE '%:80'
                        THEN substr(host1, 1, length(host1) - 3)
                        WHEN scheme = 'https' AND host1 LIKE '%:443'
                        THEN substr(host1, 1, length(host1) - 4)
                        ELSE host1 END AS host,
                   split_part(rest, '#', 1) AS nofrag,
                   strpos(split_part(rest, '#', 1), '?') AS qpos
            FROM hosted
        ),
        pq AS (
            SELECT doc_id, u, scheme, host,
                   CASE WHEN qpos > 0 THEN substr(nofrag, 1, qpos - 1)
                        ELSE nofrag END AS path0,
                   CASE WHEN qpos > 0 THEN substr(nofrag, qpos + 1)
                        ELSE '' END AS qs
            FROM pieces
        ),
        canon AS (
            SELECT doc_id,
                   CASE WHEN scheme != '' THEN
                       scheme || '://' || host
                       || (CASE WHEN path0 LIKE '%/'
                                THEN substr(path0, 1, length(path0) - 1)
                                ELSE path0 END)
                       || (CASE WHEN len(params) > 0
                                THEN '?' || array_to_string(params, '&')
                                ELSE '' END)
                   ELSE u END AS url_norm
            FROM (
                SELECT *, list_sort(list_filter(string_split(qs, '&'),
                           p -> p != '' AND NOT starts_with(p, 'utm_')
                                AND NOT starts_with(p, 'fbclid')
                                AND NOT starts_with(p, 'gclid'))) AS params
                FROM pq)
        )
        SELECT c.doc_id, c.url_norm, m.canonical_id
        FROM canon c
        JOIN (SELECT url_norm, min(doc_id) AS canonical_id
              FROM canon GROUP BY url_norm) m
          ON m.url_norm = c.url_norm
    """

    # SemDeDup: deterministic 8-cell quantizer (cells = first 8 vectors),
    # int8-quantized cosines (integer dots → identical doubles), cell
    # equi-join edges at τ=0.4, CC reach, keep the member LEAST similar to
    # its centroid (ties → min id); csim reported as exact ppm ints
    q["semdedup_embeddings"] = f"""
        WITH RECURSIVE
        qv AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 127 + 0.5)
                                 AS BIGINT)) AS q
            FROM embeddings
        ),
        cents AS (
            SELECT CAST(vec_id AS INTEGER) AS cell, q AS cq
            FROM qv WHERE vec_id < 8
        ),
        scored AS (
            SELECT v.vec_id, c.cell,
                   CASE WHEN list_dot_product(v.q, v.q) > 0
                             AND list_dot_product(c.cq, c.cq) > 0
                        THEN list_dot_product(v.q, c.cq)
                             / (sqrt(list_dot_product(v.q, v.q))
                                * sqrt(list_dot_product(c.cq, c.cq)))
                        ELSE 0.0 END AS csim
            FROM qv v, cents c
        ),
        assign AS (
            SELECT vec_id, cell, csim FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                             ORDER BY csim DESC, cell ASC) AS rk
                FROM scored)
            WHERE rk = 1
        ),
        p AS (
            SELECT a.vec_id AS id0, b.vec_id AS id1
            FROM assign a
            JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
            JOIN qv qa ON qa.vec_id = a.vec_id
            JOIN qv qb ON qb.vec_id = b.vec_id
            WHERE list_dot_product(qa.q, qb.q)
                  / (sqrt(list_dot_product(qa.q, qa.q))
                     * sqrt(list_dot_product(qb.q, qb.q))) >= 0.4
        ),
        edges AS (
            SELECT cast(id0 AS VARCHAR) AS u, cast(id1 AS VARCHAR) AS v
            FROM p
        ),
        nodes AS (SELECT cast(vec_id AS VARCHAR) AS node FROM embeddings),
        {_sql_cc_reach('nodes', 'edges')},
        cl AS (
            SELECT cast(node AS BIGINT) AS vec_id,
                   cast(min(r) AS BIGINT) AS cluster_id
            FROM reach GROUP BY node
        ),
        memb AS (
            SELECT cl.vec_id, cl.cluster_id, a.cell, a.csim
            FROM cl JOIN assign a ON a.vec_id = cl.vec_id
        ),
        mn AS (SELECT cluster_id, min(csim) AS csim FROM memb
               GROUP BY cluster_id),
        bestk AS (
            SELECT m.cluster_id, min(m.vec_id) AS k
            FROM memb m
            JOIN mn ON mn.cluster_id = m.cluster_id AND mn.csim = m.csim
            GROUP BY m.cluster_id
        )
        SELECT m.vec_id, m.cell, m.cluster_id,
               CAST(floor(m.csim * 1000000 + 0.5) AS BIGINT)
                   AS centroid_sim_ppm,
               m.vec_id = b.k AS is_kept
        FROM memb m JOIN bestk b ON b.cluster_id = m.cluster_id
    """

    q["near_dup_clusters_cc"] = f"""
        WITH RECURSIVE {_SQL_JACCARD_PAIRS},
        edges AS (
            SELECT cast(id0 AS VARCHAR) AS u, cast(id1 AS VARCHAR) AS v
            FROM jac WHERE jaccard >= 0.5
        ),
        nodes AS (SELECT cast(doc_id AS VARCHAR) AS node FROM documents),
        {_sql_cc_reach('nodes', 'edges')}
        SELECT cast(node AS BIGINT) AS doc_id, cast(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    """

    # Monge–Elkan: same integer-milli arithmetic via DuckDB list lambdas;
    # the only floats are the two floor(int/int) divisions, IEEE-identical
    # cross-engine at these magnitudes.
    q["monge_elkan_scores"] = """
        WITH p AS (
            SELECT a.p_partkey AS k, a.p_name AS s0, b.p_name AS s1
            FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
        ),
        t AS (
            SELECT k, s0, s1,
                list_filter(string_split_regex(lower(s0), '[^A-Za-z0-9]+'),
                            x -> x <> '') AS t0,
                list_filter(string_split_regex(lower(s1), '[^A-Za-z0-9]+'),
                            x -> x <> '') AS t1
            FROM p
        ),
        d AS (
            SELECT k, s0, s1,
                CASE WHEN len(t0) > 0 THEN cast(floor(list_sum(list_transform(
                    t0, a -> coalesce(list_max(list_transform(t1,
                        b -> 1000 - cast(floor(levenshtein(a, b) * 1000.0
                                 / greatest(len(a), len(b))) AS BIGINT))), 0)
                )) * 1.0 / len(t0)) AS BIGINT) ELSE 0 END AS me01_milli,
                CASE WHEN len(t1) > 0 THEN cast(floor(list_sum(list_transform(
                    t1, a -> coalesce(list_max(list_transform(t0,
                        b -> 1000 - cast(floor(levenshtein(a, b) * 1000.0
                                 / greatest(len(a), len(b))) AS BIGINT))), 0)
                )) * 1.0 / len(t1)) AS BIGINT) ELSE 0 END AS me10_milli
            FROM t
        )
        SELECT k, s0, s1, me01_milli, me10_milli,
               cast(floor((me01_milli + me10_milli) / 2.0) AS BIGINT)
                   AS me_sym_milli
        FROM d
    """

    # blocking_scheme_stats: one CTE chain per scheme (block-size groupBy →
    # 1-row agg; labeled pairs joined onto the key map), assembled by a
    # python loop so all four schemes share the exact template.
    _schemes = {
        "name3": "right(c_name, 3)",
        "nation": "CAST(c_nationkey AS VARCHAR)",
        "segment": "c_mktsegment",
        "balband": "CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR)",
    }
    _parts = []
    for _nm, _expr in _schemes.items():
        _parts.append(f"""
        k_{_nm} AS (
            SELECT id, {_expr} AS k FROM c WHERE {_expr} IS NOT NULL
        ),
        b_{_nm} AS (
            SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                   CAST(max(nb) AS BIGINT) AS max_block,
                   CAST(sum(nb * (nb - 1) / 2) AS BIGINT) AS cand
            FROM (SELECT k, count(*) AS nb FROM k_{_nm} GROUP BY 1)
        ),
        g_{_nm} AS (
            SELECT CAST(count(*) AS BIGINT) AS n_gold,
                   CAST(coalesce(sum(CASE WHEN ka.k = kb.k THEN 1 ELSE 0 END),
                        0) AS BIGINT) AS covered
            FROM gold
            JOIN k_{_nm} ka ON ka.id = gold.id0
            JOIN k_{_nm} kb ON kb.id = gold.id1
        ),
        r_{_nm} AS (
            SELECT '{_nm}' AS scheme, n_blocks, max_block,
                   cand AS cand_pairs, covered AS covered_matches, n_gold,
                   CASE WHEN n_gold > 0 THEN (1000 * covered) // n_gold
                        ELSE 1000 END AS pc_milli,
                   CASE WHEN t > 0 THEN 1000 - (1000 * cand) // t
                        ELSE 0 END AS rr_milli
            FROM b_{_nm}, g_{_nm}, tot
        )""")
    q["blocking_scheme_stats"] = (
        """
        WITH c AS (
            SELECT c_custkey AS id, c_name, c_nationkey, c_mktsegment,
                   c_acctbal
            FROM customer
        ),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        tot AS (SELECT (n * (n - 1)) // 2 AS t FROM nn),
        gold AS (
            SELECT a.id AS id0, b.id AS id1
            FROM c a JOIN c b ON b.id = a.id + 1
        ),"""
        + ",".join(_parts)
        + """
        SELECT * FROM r_name3
        UNION ALL SELECT * FROM r_nation
        UNION ALL SELECT * FROM r_segment
        UNION ALL SELECT * FROM r_balband
    """
    )

    # one_to_one_links: the 3-round mutual-best peel unrolled — each round
    # is two row_numbers (score desc, partner asc), the mutual cut, and a
    # NOT IN pool shrink; md5-derived scores use the portable hash idiom.
    q["one_to_one_links"] = """
        WITH cand AS (
            SELECT a.p_partkey AS id0, b.p_partkey AS id1,
                   CAST('0x' || substr(md5(a.p_partkey || ':' || b.p_partkey),
                        1, 4) AS BIGINT) % 1000 AS score
            FROM part a
            JOIN (SELECT unnest([-2, -1, 0, 1, 2]) AS off) o ON true
            JOIN part b ON b.p_partkey = a.p_partkey + o.off
        ),
        r1 AS (
            SELECT *,
                   row_number() OVER (PARTITION BY id0
                       ORDER BY score DESC, id1) AS rl,
                   row_number() OVER (PARTITION BY id1
                       ORDER BY score DESC, id0) AS rr
            FROM cand
        ),
        m1 AS (SELECT id0, id1, score, 1 AS round
               FROM r1 WHERE rl = 1 AND rr = 1),
        rem1 AS (
            SELECT id0, id1, score FROM cand
            WHERE id0 NOT IN (SELECT id0 FROM m1)
              AND id1 NOT IN (SELECT id1 FROM m1)
        ),
        r2 AS (
            SELECT *,
                   row_number() OVER (PARTITION BY id0
                       ORDER BY score DESC, id1) AS rl,
                   row_number() OVER (PARTITION BY id1
                       ORDER BY score DESC, id0) AS rr
            FROM rem1
        ),
        m2 AS (SELECT id0, id1, score, 2 AS round
               FROM r2 WHERE rl = 1 AND rr = 1),
        rem2 AS (
            SELECT id0, id1, score FROM rem1
            WHERE id0 NOT IN (SELECT id0 FROM m2)
              AND id1 NOT IN (SELECT id1 FROM m2)
        ),
        r3 AS (
            SELECT *,
                   row_number() OVER (PARTITION BY id0
                       ORDER BY score DESC, id1) AS rl,
                   row_number() OVER (PARTITION BY id1
                       ORDER BY score DESC, id0) AS rr
            FROM rem2
        ),
        m3 AS (SELECT id0, id1, score, 3 AS round
               FROM r3 WHERE rl = 1 AND rr = 1)
        SELECT id0, id1, score, CAST(round AS INTEGER) AS round FROM m1
        UNION ALL
        SELECT id0, id1, score, CAST(round AS INTEGER) AS round FROM m2
        UNION ALL
        SELECT id0, id1, score, CAST(round AS INTEGER) AS round FROM m3
    """

    # bloom_dice_pairs: the CLK encoding re-expressed in DuckDB list
    # lambdas — char bigrams of the lowercased name, 3 md5-derived hash
    # positions per gram (first 6 hex digits mod 256, the repo's portable
    # hash idiom), distinct-sorted position lists, exact integer-milli
    # Dice via list_intersect.
    q["bloom_dice_pairs"] = """
        WITH p0 AS (
            SELECT a.p_partkey AS k, a.p_name AS s0, b.p_name AS s1
            FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
        ),
        strs AS (
            SELECT s0 AS s FROM p0 UNION SELECT s1 FROM p0
        ),
        enc AS (
            SELECT s,
                   list_sort(list_distinct(flatten(list_transform(
                       list_transform(range(1, length(lower(s))),
                                      j -> substr(lower(s), j, 2)),
                       g -> [
                           CAST('0x' || substr(md5(g || '|1'), 1, 6)
                                AS BIGINT) % 256,
                           CAST('0x' || substr(md5(g || '|2'), 1, 6)
                                AS BIGINT) % 256,
                           CAST('0x' || substr(md5(g || '|3'), 1, 6)
                                AS BIGINT) % 256
                       ])))) AS bits
            FROM strs
        )
        SELECT k, s0, s1,
               CAST(CASE WHEN len(e0.bits) + len(e1.bits) > 0
                    THEN (2000 * len(list_intersect(e0.bits, e1.bits)))
                         // (len(e0.bits) + len(e1.bits))
                    ELSE 1000 END AS BIGINT) AS dice_milli
        FROM p0
        JOIN enc e0 ON e0.s = p0.s0
        JOIN enc e1 ON e1.s = p0.s1
    """

    # fs_null_weights: the null-level convention in SQL — gamma = -1 when
    # either side is NULL, and the weight CASE maps -1 to 0. Milli weights
    # are the same driver-side literals the Spark expression embeds.
    _wn = milli_weights(_FS_NULL_PARAMS)
    q["fs_null_weights"] = f"""
        WITH c AS (
            SELECT c_custkey, c_nationkey,
                   CASE WHEN c_custkey % 7 = 0 THEN NULL
                        ELSE c_mktsegment END AS seg,
                   CASE WHEN c_custkey % 5 = 0 THEN NULL
                        ELSE right(c_name, 2) END AS pre
            FROM customer
        ),
        g AS (
            SELECT a.c_custkey AS c0, b.c_custkey AS c1,
                   CASE WHEN a.c_nationkey IS NULL OR b.c_nationkey IS NULL
                        THEN -1
                        WHEN a.c_nationkey = b.c_nationkey THEN 1
                        ELSE 0 END AS g_nation,
                   CASE WHEN a.seg IS NULL OR b.seg IS NULL THEN -1
                        WHEN a.seg = b.seg THEN 1 ELSE 0 END AS g_segment,
                   CASE WHEN a.pre IS NULL OR b.pre IS NULL THEN -1
                        WHEN a.pre = b.pre THEN 1 ELSE 0 END AS g_code
            FROM c a JOIN c b ON b.c_custkey = a.c_custkey + 1
        )
        SELECT c0, c1, g_nation, g_segment, g_code,
               CAST(
                 (CASE g_nation WHEN -1 THEN 0
                                WHEN 0 THEN {_wn['g_nation'][0]}
                                ELSE {_wn['g_nation'][1]} END)
               + (CASE g_segment WHEN -1 THEN 0
                                 WHEN 0 THEN {_wn['g_segment'][0]}
                                 ELSE {_wn['g_segment'][1]} END)
               + (CASE g_code WHEN -1 THEN 0
                               WHEN 0 THEN {_wn['g_code'][0]}
                               ELSE {_wn['g_code'][1]} END)
               AS BIGINT) AS weight_milli
        FROM g
    """

    # rule_cascade_links: one candidate CTE per rule (equi-join on that
    # rule's key), union, first-rule-wins via row_number (rule_idx, id1) —
    # the exact mirror of the Spark window.
    q["rule_cascade_links"] = """
        WITH lft AS (
            SELECT p_partkey AS id0,
                   CASE CAST(p_partkey % 4 AS INTEGER)
                        WHEN 0 THEN p_name
                        WHEN 1 THEN upper(p_name)
                        WHEN 2 THEN 'incorporated ' || p_name
                        ELSE 'the ' || p_name END AS name
            FROM part
        ),
        rgt AS (SELECT p_partkey AS id1, p_name AS name FROM part),
        lk AS (
            SELECT id0, name,
                   list_filter(string_split_regex(lower(name), '[^a-z0-9]+'),
                               x -> x <> '') AS toks
            FROM lft
        ),
        rk AS (
            SELECT id1, name,
                   list_filter(string_split_regex(lower(name), '[^a-z0-9]+'),
                               x -> x <> '') AS toks
            FROM rgt
        ),
        lkeys AS (
            SELECT id0,
                   name AS k_exact,
                   array_to_string(list_slice(toks, 1, 3), ' ') AS k_first3,
                   array_to_string(list_sort(list_distinct(list_filter(toks,
                       x -> x NOT IN ('the', 'incorporated', 'inc')))), ' ')
                       AS k_tokenset
            FROM lk
        ),
        rkeys AS (
            SELECT id1,
                   name AS k_exact,
                   array_to_string(list_slice(toks, 1, 3), ' ') AS k_first3,
                   array_to_string(list_sort(list_distinct(list_filter(toks,
                       x -> x NOT IN ('the', 'incorporated', 'inc')))), ' ')
                       AS k_tokenset
            FROM rk
        ),
        c0 AS (SELECT id0, id1, 0 AS rule_idx, 'exact' AS rule
               FROM lkeys JOIN rkeys USING (k_exact)
               WHERE k_exact IS NOT NULL),
        c1 AS (SELECT id0, id1, 1 AS rule_idx, 'first3' AS rule
               FROM lkeys JOIN rkeys USING (k_first3)
               WHERE k_first3 IS NOT NULL),
        c2 AS (SELECT id0, id1, 2 AS rule_idx, 'tokenset' AS rule
               FROM lkeys JOIN rkeys USING (k_tokenset)
               WHERE k_tokenset IS NOT NULL),
        cands AS (
            SELECT * FROM c0 UNION ALL SELECT * FROM c1
            UNION ALL SELECT * FROM c2
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY id0 ORDER BY rule_idx, id1) AS rn
            FROM cands
        )
        SELECT id0, id1, rule, CAST(rule_idx AS BIGINT) AS rule_idx
        FROM ranked WHERE rn = 1
    """

    # soft_tfidf_scores: the decisions (threshold + argmax) run on
    # round(jw, 5) in BOTH engines — the precision at which this repo's
    # Jaro-Winkler is proven hash-identical to DuckDB's (fallback_scores
    # row); the argmax tie-breaks on (jw5 DESC, token DESC), mirroring the
    # Spark struct max. Weight formulas are ln-based like the green
    # tokens_tfidf_weights row.
    q["soft_tfidf_scores"] = """
        WITH p0 AS (
            SELECT a.p_partkey AS k, a.p_name AS s0, b.p_name AS s1
            FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
        ),
        corpus AS (SELECT DISTINCT lower(p_name) AS string FROM part
                   WHERE p_name IS NOT NULL),
        pstr AS (
            SELECT lower(s0) AS string FROM p0
            UNION SELECT lower(s1) FROM p0
        ),
        allstr AS (SELECT string FROM corpus UNION SELECT string FROM pstr),
        tfc AS (
            SELECT string, w AS token, count(*) AS tf
            FROM (
                SELECT string,
                       unnest(list_filter(
                           string_split_regex(string, '[^A-Za-z0-9]+'),
                           x -> x <> '')) AS w
                FROM corpus
            )
            GROUP BY 1, 2
        ),
        nn AS (SELECT count(*) AS n FROM corpus),
        dfc AS (SELECT token, count(*) AS df FROM tfc GROUP BY 1),
        tf AS (
            SELECT string, w AS token, count(*) AS tf
            FROM (
                SELECT string,
                       unnest(list_filter(
                           string_split_regex(string, '[^A-Za-z0-9]+'),
                           x -> x <> '')) AS w
                FROM allstr
            )
            GROUP BY 1, 2
        ),
        vt AS (
            SELECT string, tf.token,
                   ln(tf + 1.0) * ln((SELECT n FROM nn) * 1.0
                                     / coalesce(df, 1)) AS v
            FROM tf LEFT JOIN dfc USING (token)
        ),
        nrm AS (SELECT string, sqrt(sum(v * v)) AS nrm FROM vt GROUP BY 1),
        wt AS (
            SELECT vt.string, vt.token,
                   CASE WHEN nrm > 0 THEN v / nrm ELSE 0.0 END AS V
            FROM vt JOIN nrm USING (string)
        ),
        pp AS (SELECT DISTINCT lower(s0) AS l0, lower(s1) AS l1 FROM p0),
        t0 AS (SELECT l0, l1, token AS w, V AS v0
               FROM pp JOIN wt ON wt.string = pp.l0),
        t1 AS (SELECT l0, l1, token AS u, V AS v1
               FROM pp JOIN wt ON wt.string = pp.l1),
        tp AS (
            SELECT t0.l0, t0.l1, w, v0, u, v1,
                   round(jaro_winkler_similarity(w, u), 5) AS jw5
            FROM t0 JOIN t1 ON t0.l0 = t1.l0 AND t0.l1 = t1.l1
        ),
        b0 AS (
            SELECT *, row_number() OVER (
                PARTITION BY l0, l1, w ORDER BY jw5 DESC, u DESC) AS rn
            FROM tp
        ),
        c0 AS (
            SELECT l0, l1, sum(v0 * v1 * jw5) AS soft01
            FROM b0 WHERE rn = 1 AND jw5 > 0.9 GROUP BY 1, 2
        ),
        b1 AS (
            SELECT *, row_number() OVER (
                PARTITION BY l0, l1, u ORDER BY jw5 DESC, w DESC) AS rn
            FROM tp
        ),
        c1 AS (
            SELECT l0, l1, sum(v0 * v1 * jw5) AS soft10
            FROM b1 WHERE rn = 1 AND jw5 > 0.9 GROUP BY 1, 2
        ),
        res AS (
            SELECT pp.l0, pp.l1,
                   round(coalesce(soft01, 0.0), 5) AS soft01,
                   round(coalesce(soft10, 0.0), 5) AS soft10,
                   round((coalesce(soft01, 0.0) + coalesce(soft10, 0.0))
                         / 2.0, 5) AS soft_sym
            FROM pp
            LEFT JOIN c0 ON c0.l0 = pp.l0 AND c0.l1 = pp.l1
            LEFT JOIN c1 ON c1.l0 = pp.l0 AND c1.l1 = pp.l1
        )
        SELECT k, s0, s1, soft01, soft10, soft_sym
        FROM p0
        JOIN res ON res.l0 = lower(p0.s0) AND res.l1 = lower(p0.s1)
    """

    # cluster_cohesion: near-dup CC labels + per-cluster within/boundary
    # edge counts. Boundary is counted once per endpoint cluster via two
    # grouped counts summed at the end (UNION ALL is rejected inside a
    # WITH RECURSIVE block by DuckDB's parser, same constraint as EXCEPT).
    q["cluster_cohesion"] = f"""
        WITH RECURSIVE {_SQL_JACCARD_PAIRS},
        edges AS (
            SELECT cast(id0 AS VARCHAR) AS u, cast(id1 AS VARCHAR) AS v
            FROM jac WHERE jaccard >= 0.5
        ),
        nodes AS (SELECT cast(doc_id AS VARCHAR) AS node FROM documents),
        {_sql_cc_reach('nodes', 'edges')},
        lab AS (SELECT node, min(r) AS c FROM reach GROUP BY node),
        le AS (
            SELECT l0.c AS cu, l1.c AS cv
            FROM edges e
            JOIN lab l0 ON l0.node = e.u
            JOIN lab l1 ON l1.node = e.v
        ),
        within AS (
            SELECT cu AS cluster, count(*) AS n_edges_within
            FROM le WHERE cu = cv GROUP BY 1
        ),
        bnd0 AS (
            SELECT cu AS cluster, count(*) AS nb
            FROM le WHERE cu <> cv GROUP BY 1
        ),
        bnd1 AS (
            SELECT cv AS cluster, count(*) AS nb
            FROM le WHERE cu <> cv GROUP BY 1
        ),
        mem AS (SELECT c AS cluster, count(*) AS n_members FROM lab GROUP BY 1)
        SELECT cast(m.cluster AS BIGINT) AS cluster_id,
               m.n_members,
               coalesce(w.n_edges_within, 0) AS n_edges_within,
               coalesce(b0.nb, 0) + coalesce(b1.nb, 0) AS n_boundary_edges,
               CASE WHEN m.n_members > 1
                    THEN (coalesce(w.n_edges_within, 0) * 2000)
                         // (m.n_members * (m.n_members - 1))
                    ELSE 1000 END AS density_milli
        FROM mem m
        LEFT JOIN within w USING (cluster)
        LEFT JOIN bnd0 b0 USING (cluster)
        LEFT JOIN bnd1 b1 USING (cluster)
    """

    # The delta-CC path must be INDISTINGUISHABLE from a full recompute, so
    # its oracle IS the full-edge-set CC — the base/delta split exists only
    # Spark-side (any split converges to the same components).
    q["cc_delta_clusters"] = q["near_dup_clusters_cc"]

    # stable_entity_ids: prev = CC over the md5-split base edges, cur = CC
    # over all edges; plurality inheritance + split-winner via row_number
    # (the Spark side uses min(struct(-n, id)) — same total order). Minted
    # ids are 'n:' || md5(component) in both engines.
    q["stable_entity_ids"] = f"""
        WITH RECURSIVE {_SQL_JACCARD_PAIRS},
        edges AS (
            SELECT cast(id0 AS VARCHAR) AS u, cast(id1 AS VARCHAR) AS v
            FROM jac WHERE jaccard >= 0.5
        ),
        be AS (
            SELECT u, v FROM edges
            WHERE substr(md5(u || ':' || v), 1, 1) NOT IN ('0', '1', '2')
        ),
        nodes AS (SELECT cast(doc_id AS VARCHAR) AS node FROM documents),
        bi0 AS (SELECT u, v FROM be UNION SELECT v, u FROM be),
        reach0(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT reach0.node, bi0.v FROM reach0 JOIN bi0 ON bi0.u = reach0.r
        ),
        prev AS (SELECT node, min(r) AS entity_id FROM reach0 GROUP BY node),
        bi1 AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
        reach1(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT reach1.node, bi1.v FROM reach1 JOIN bi1 ON bi1.u = reach1.r
        ),
        cur AS (SELECT node, min(r) AS component FROM reach1 GROUP BY node),
        votes AS (
            SELECT c.component, p.entity_id, count(*) AS n
            FROM cur c JOIN prev p USING (node)
            GROUP BY 1, 2
        ),
        best AS (
            SELECT component, entity_id AS candidate FROM (
                SELECT component, entity_id,
                       row_number() OVER (
                           PARTITION BY component ORDER BY n DESC, entity_id
                       ) AS rn
                FROM votes
            ) WHERE rn = 1
        ),
        winner AS (
            SELECT entity_id AS candidate, component AS wc FROM (
                SELECT entity_id, component,
                       row_number() OVER (
                           PARTITION BY entity_id ORDER BY n DESC, component
                       ) AS rn
                FROM votes
            ) WHERE rn = 1
        ),
        comp_ids AS (
            SELECT c.component,
                   CASE WHEN b.candidate IS NOT NULL AND w.wc = c.component
                        THEN b.candidate
                        ELSE 'n:' || md5(c.component) END AS entity_id
            FROM (SELECT DISTINCT component FROM cur) c
            LEFT JOIN best b USING (component)
            LEFT JOIN winner w ON w.candidate = b.candidate
        )
        SELECT cast(cur.node AS BIGINT) AS doc_id, comp_ids.entity_id
        FROM cur JOIN comp_ids USING (component)
    """

    # doc_id↔vec_id join, dot ≥ 0.3 edges, CC closure; labels are the
    # LEXICOGRAPHIC min of the stringified ids (the CC operator's min-string
    # label election), hence the VARCHAR reach domain — same as
    # near_dup_clusters_cc
    q["dedup_embedding_cosine"] = f"""
        WITH RECURSIVE
        j AS (
            SELECT d.doc_id, e.embedding
            FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        ),
        sim AS (
            SELECT cast(a.doc_id AS VARCHAR) AS u, cast(b.doc_id AS VARCHAR) AS v
            FROM j a, j b
            WHERE a.doc_id < b.doc_id
              AND list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                  >= 0.3
        ),
        nodes AS (SELECT cast(doc_id AS VARCHAR) AS node FROM j),
        {_sql_cc_reach('nodes', 'sim')}
        SELECT cast(node AS BIGINT) AS doc_id, cast(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    """

    q["embedding_unite_similar"] = f"""
        WITH RECURSIVE
        sim AS (
            SELECT cast(a.vec_id AS VARCHAR) AS u, cast(b.vec_id AS VARCHAR) AS v
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
        ),
        nodes AS (SELECT cast(vec_id AS VARCHAR) AS node FROM embeddings),
        {_sql_cc_reach('nodes', 'sim')}
        SELECT node AS string, 1::BIGINT AS count, min(r) AS "group"
        FROM reach GROUP BY node
    """

    # SimHash: per word, h = first 8 bytes of md5 (big-endian); bit i of h is
    # nibble 16 - i//4 (1-based hex digit), position i%4 — summed ±1 per word
    # occurrence, bit set iff the sum is positive (dedup.py simhash_64).
    q["simhash_near_pairs"] = r"""
        WITH
        w AS (SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                        x -> x != '')) AS word
              FROM documents),
        contrib AS (
            SELECT doc_id, t.i,
                   CASE WHEN ((instr('0123456789abcdef',
                                     substr(md5(word), CAST(16 - (t.i // 4) AS INT), 1)) - 1)
                              >> CAST(t.i % 4 AS INT)) & 1 = 1
                        THEN 1 ELSE -1 END AS c
            FROM w, range(64) t(i)
        ),
        acc AS (SELECT doc_id, i, sum(c) AS s FROM contrib GROUP BY 1, 2),
        b AS (
            SELECT d.doc_id, t.i,
                   CASE WHEN coalesce(a.s, 0) > 0 THEN 1 ELSE 0 END AS bit
            FROM documents d CROSS JOIN range(64) t(i)
            LEFT JOIN acc a ON a.doc_id = d.doc_id AND a.i = t.i
        )
        SELECT p0.doc_id AS id0, p1.doc_id AS id1,
               cast(sum(CASE WHEN p0.bit != p1.bit THEN 1 ELSE 0 END) AS BIGINT)
                   AS hamming
        FROM b p0 JOIN b p1 ON p0.i = p1.i AND p0.doc_id < p1.doc_id
        GROUP BY 1, 2
        HAVING sum(CASE WHEN p0.bit != p1.bit THEN 1 ELSE 0 END) <= 3
    """

    # Soundex from the published algorithm, no backrefs (RE2): translate
    # letters to codes with H/W deleted, collapse adjacent duplicate codes
    # (5 halving passes bound runs <= 32), strip vowel 0s, drop the first
    # letter's own (possibly merged) code iff it is a consonant, pad to 3.
    q["phonetic_soundex_keys"] = r"""
        WITH names AS (SELECT DISTINCT p_name AS string FROM part),
        base AS (
            SELECT string,
                   regexp_replace(upper(
                       list_filter(string_split_regex(trim(string), '\s+'),
                                   x -> x != '')[1]),
                       '[^A-Z]', '', 'g') AS u
            FROM names
        ),
        t AS (SELECT string, u,
                     translate(u, 'ABCDEFGIJKLMNOPQRSTUVXYZHW', '012301202245501262301202') AS raw
              FROM base),
        d AS (SELECT string, u,
                     replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(raw, '00', '0'), '11', '1'), '22', '2'), '33', '3'), '44', '4'), '55', '5'), '66', '6'), '00', '0'), '11', '1'), '22', '2'), '33', '3'), '44', '4'), '55', '5'), '66', '6'), '00', '0'), '11', '1'), '22', '2'), '33', '3'), '44', '4'), '55', '5'), '66', '6'), '00', '0'), '11', '1'), '22', '2'), '33', '3'), '44', '4'), '55', '5'), '66', '6'), '00', '0'), '11', '1'), '22', '2'), '33', '3'), '44', '4'), '55', '5'), '66', '6'), '0', '') AS digits,
                     translate(substr(u, 1, 1), 'ABCDEFGIJKLMNOPQRSTUVXYZHW', '012301202245501262301202') AS fc
              FROM t)
        SELECT string,
               CASE WHEN u = '' THEN NULL
                    ELSE substr(u, 1, 1) ||
                         substr((CASE WHEN fc IN ('1','2','3','4','5','6')
                                      THEN substr(digits, 2)
                                      ELSE digits END) || '000', 1, 3)
               END AS sx
        FROM d
    """

    q["fingerprint_key_clusters"] = r"""
        WITH names AS (SELECT DISTINCT p_name AS string FROM part),
        uni AS (
            SELECT string FROM names
            UNION
            SELECT array_to_string(list_reverse(string_split(string, ' ')), ' ')
            FROM names
        ),
        k AS (
            SELECT string,
                   array_to_string(
                       list_sort(list_distinct(list_filter(
                           string_split_regex(
                               regexp_replace(lower(string),
                                              '[^a-z0-9\s]', ' ', 'g'),
                               '\s+'),
                           x -> x != ''))),
                       ' ') AS key
            FROM uni
        )
        SELECT string,
               CASE WHEN key = '' THEN string
                    ELSE min(string) OVER (PARTITION BY key) END AS "group"
        FROM k
    """

    q["doc_keywords"] = r"""
        WITH w AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(trim(text)), '\s+'),
                       x -> x != '')) AS word
            FROM documents
        ),
        tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
        scored AS (
            SELECT t.doc_id, t.word,
                   t.tf * ln(n.n_docs * 1.0 / d.df) AS tfidf,
                   row_number() OVER (PARTITION BY t.doc_id
                       ORDER BY t.tf * ln(n.n_docs * 1.0 / d.df) DESC,
                                t.word ASC) AS rank
            FROM tf t JOIN dfreq d USING (word) CROSS JOIN n
        )
        SELECT doc_id, word AS keyword, round(tfidf, 6) AS tfidf,
               CAST(rank AS BIGINT) AS rank
        FROM scored WHERE rank <= 3
    """

    q["calibration_alpha_sweep"] = r"""
        WITH e AS (
            SELECT vec_id,
                   list_transform(embedding,
                                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000
                                                  + 0.5) AS BIGINT)) AS v,
                   label
            FROM embeddings
        ),
        p AS (
            SELECT CAST(list_sum(list_transform(range(1, len(a.v) + 1),
                             i -> a.v[i] * b.v[i])) AS DOUBLE)
                   / (sqrt(CAST(list_sum(list_transform(range(1, len(a.v) + 1),
                             i -> a.v[i] * a.v[i])) AS DOUBLE))
                      * sqrt(CAST(list_sum(list_transform(range(1, len(b.v) + 1),
                             i -> b.v[i] * b.v[i])) AS DOUBLE))) AS cos,
                   CASE WHEN a.label = b.label THEN 1.0 ELSE 0.0 END AS y
            FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
        ),
        g AS (SELECT CAST(i AS DOUBLE) AS alpha FROM range(1, 31) t(i)),
        l AS (
            SELECT g.alpha,
                   greatest(g.alpha * (1.0 - p.cos), 1e-3) AS z, p.y
            FROM p CROSS JOIN g
        )
        SELECT alpha,
               CAST(sum(CAST(round((y * z - CASE WHEN y < 1.0
                     THEN (1.0 - y) * ln(1.0 - exp(-z)) ELSE 0.0 END)
                     * 1000000.0) AS BIGINT)) AS BIGINT) AS total_loss_u
        FROM l GROUP BY alpha
    """

    # canonical survivor: same CC reach, then keep the longest member per
    # cluster (n_chars DESC, doc_id ASC tie-break) — single reach reference
    # via a window instead of a second recursive expansion
    q["select_canonical_docs"] = q["near_dup_clusters_cc"].replace(
        """SELECT cast(node AS BIGINT) AS doc_id, cast(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node""",
        """SELECT doc_id, lang, source, n_chars FROM (
            SELECT d.doc_id, d.lang, d.source, d.n_chars,
                   row_number() OVER (PARTITION BY c.cluster_id
                                      ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
            FROM (SELECT cast(node AS BIGINT) AS doc_id,
                         cast(min(r) AS BIGINT) AS cluster_id
                  FROM reach GROUP BY node) c
            JOIN documents d ON d.doc_id = c.doc_id)
        WHERE rk = 1""",
    )

    # leak-free split = the near-dup cluster map + an md5 hash of the
    # cluster id (first 12 hex digits / 2^48 -> uniform [0,1))
    q["corpus_split_leakfree"] = q["near_dup_clusters_cc"].replace(
        """SELECT cast(node AS BIGINT) AS doc_id, cast(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node""",
        """SELECT doc_id, cluster_id,
               CASE WHEN CAST(CONCAT('0x', substr(
                        md5(CONCAT(CAST(cluster_id AS VARCHAR), ':7')), 1, 12))
                        AS BIGINT) / 281474976710656.0 < 0.2
                    THEN 'val' ELSE 'train' END AS split
        FROM (SELECT cast(node AS BIGINT) AS doc_id,
                     cast(min(r) AS BIGINT) AS cluster_id
              FROM reach GROUP BY node)""",
    )

    q["chunk_documents"] = r"""
        WITH w AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS ws
            FROM documents
        ),
        s AS (
            SELECT doc_id, ws,
                   unnest(CASE WHEN len(ws) > 32
                               THEN range(0, len(ws) - 8, 24)
                               ELSE [0] END) AS st
            FROM w
        )
        SELECT doc_id,
               CAST(st // 24 AS BIGINT) AS chunk_seq,
               array_to_string(ws[st + 1 : st + 32], ' ') AS chunk_text,
               CAST(least(len(ws) - st, 32) AS BIGINT) AS n_tokens
        FROM s
    """

    # pack assignment = floor((running token count − n) / budget) over the
    # same chunking CTE in (doc_id, chunk_seq) order
    q["pack_chunks"] = r"""
        WITH w AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS ws
            FROM documents
        ),
        s AS (
            SELECT doc_id, ws,
                   unnest(CASE WHEN len(ws) > 32
                               THEN range(0, len(ws) - 8, 24)
                               ELSE [0] END) AS st
            FROM w
        ),
        c AS (
            SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_seq,
                   CAST(least(len(ws) - st, 32) AS BIGINT) AS n_tokens
            FROM s
        )
        SELECT doc_id, chunk_seq,
               CAST((sum(n_tokens) OVER (ORDER BY doc_id, chunk_seq
                         ROWS UNBOUNDED PRECEDING) - n_tokens) // 512
                    AS BIGINT) AS pack_id
        FROM c
    """

    q["corpus_profile"] = """
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               round(quantile_cont(n_chars, 0.5), 4) AS median_chars,
               round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM documents GROUP BY lang
    """

    # incremental simhash = the same true-hamming pair set restricted to
    # pairs touching an odd (delta) doc_id
    q["simhash_delta"] = q["simhash_near_pairs"].replace(
        "ON p0.i = p1.i AND p0.doc_id < p1.doc_id",
        "ON p0.i = p1.i AND p0.doc_id < p1.doc_id "
        "AND (p0.doc_id % 2 = 1 OR p1.doc_id % 2 = 1)",
    )

    return {k: v.strip() for k, v in q.items()}
