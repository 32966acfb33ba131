"""Scored-pair review operators — the reference's active-learning surface.

``top_scored_pairs`` reproduces MatchData.top_scored_pairs_df
(match_data.py:458-556): the n highest-(impact, score) cross-group candidate
pairs, where impact = group_size(g0) · group_size(g1) (match_data.py:520-521),
optionally deduped to the best pair per unordered group pair
(match_data.py:539-543) and excluding already-reviewed group pairs
(match_data.py:507-533). The reference streams 100k-row buffers and keeps a
running head(n); Spark's TakeOrderedAndProject does the same thing
planner-side from ``orderBy().limit()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nama_spark.operators.matchdata import MatchData


def top_scored_pairs(
    md: MatchData,
    scores: DataFrame,
    n: int = 100,
    best_per_group_pair: bool = True,
    skip_pairs: DataFrame | None = None,
    by: str = "impact",
) -> DataFrame:
    """→ (string0, string1, group0, group1, impact, score), top n.

    ``scores``: (s0, s1, score) candidate pairs. ``skip_pairs``: DataFrame of
    (group0, group1) already-reviewed pairs to exclude (order-insensitive).
    """
    g = md.df.select("string", "group")
    sizes = md.df.groupBy("group").agg(F.count(F.lit(1)).alias("gsize"))

    df = (
        scores.join(g.withColumnRenamed("string", "s0").withColumnRenamed("group", "group0"), "s0")
        .join(g.withColumnRenamed("string", "s1").withColumnRenamed("group", "group1"), "s1")
        .where(F.col("group0") != F.col("group1"))
    )
    df = (
        df.join(sizes.select(F.col("group").alias("group0"), F.col("gsize").alias("n0")), "group0")
        .join(sizes.select(F.col("group").alias("group1"), F.col("gsize").alias("n1")), "group1")
        .withColumn("impact", F.col("n0") * F.col("n1"))
    )
    pair_lo = F.least("group0", "group1")
    pair_hi = F.greatest("group0", "group1")
    df = df.withColumn("__glo", pair_lo).withColumn("__ghi", pair_hi)

    if skip_pairs is not None:
        sk = skip_pairs.select(
            F.least(F.col(skip_pairs.columns[0]), F.col(skip_pairs.columns[1])).alias("__glo"),
            F.greatest(F.col(skip_pairs.columns[0]), F.col(skip_pairs.columns[1])).alias("__ghi"),
        ).distinct()
        df = df.join(sk, ["__glo", "__ghi"], "left_anti")

    order = [F.col("impact").desc(), F.col("score").desc(), F.col("s0"), F.col("s1")] \
        if by == "impact" else [F.col("score").desc(), F.col("impact").desc(), F.col("s0"), F.col("s1")]

    if best_per_group_pair:
        w = Window.partitionBy("__glo", "__ghi").orderBy(*order)
        df = df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)

    return (
        df.orderBy(*order)
        .limit(n)
        .select(
            F.col("s0").alias("string0"),
            F.col("s1").alias("string1"),
            "group0",
            "group1",
            "impact",
            "score",
        )
    )


def select_uncertain_pairs(
    scored: DataFrame,
    threshold: float,
    band: float = 0.1,
    k: int = 100,
    seed: str = "label",
    score_col: str = "score",
    s0: str = "s0",
    s1: str = "s1",
) -> DataFrame:
    """Active-learning batch selection: the k candidate pairs whose
    score falls within ±band of the decision threshold — the region
    where a human label buys the most information — drawn by an
    md5(seed, s0, s1) key so the labeling batch is reproducible,
    append-stable, and independent of partition layout (the
    sample_mixture determinism rule). Pass a new seed per labeling
    round to draw a fresh batch from the same band.

    Global top-k on the key compiles to TakeOrderedAndProject (per-
    partition heaps, driver merge) — no full sort. Returns the selected
    rows plus an ``uncertainty`` column (band − |score − threshold|,
    higher = closer to the boundary)."""
    if band <= 0 or k <= 0:
        raise ValueError("band and k must be positive")
    dist = F.abs(F.col(score_col) - F.lit(float(threshold)))
    key = F.md5(
        F.concat_ws("\x1f", F.lit(seed), F.col(s0), F.col(s1))
    )
    return (
        scored.where(dist <= band)
        .withColumn("uncertainty", F.lit(float(band)) - dist)
        .withColumn("__key", key)
        .orderBy("__key")
        .limit(k)
        .drop("__key")
    )
