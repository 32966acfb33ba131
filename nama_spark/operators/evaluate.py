"""Pairwise evaluation — weighted confusion matrix, F1, group-level splits.

Reference formulas (nama/scoring.py — these define the F1 the north rule
targets). With per-string count c, after an inner join of predicted and gold
partitions on string (scoring.py:25-33):

    TP = (Σ_{same pred∧gold group} c' − c)·c                (scoring.py:38-40)
    FP = (Σ_{same pred group}      c' − c)·c − TP           (scoring.py:41-42)
    FN = (Σ_{same gold group}      c' − c)·c − TP           (scoring.py:43-44)
    TN = (Σ_all c' − c)·c − TP − FP − FN                    (scoring.py:45-46)

summed over strings and halved (each unordered pair counted twice,
scoring.py:72). Self-pairs are excluded by the −c terms.

Spark realization: the three transform-sums are groupBy aggregates joined
back onto the rows (NOT windows — a window over group_pred puts an entire
mega-group into one task, and one giant cluster is the *normal* outcome of
over-merging, so the skewed window is a guaranteed straggler at scale; the
groupBy+join shape lets AQE broadcast the small aggregate sides and split
skewed join partitions). The global Σc is a 1-row aggregate broadcast via
crossJoin. Counts are cast to decimal(38,0) so the (Σc−c)·c products stay
integer-exact at the ~10¹²-count scale where long products overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nama_spark.operators.matchdata import MatchData


def confusion_df(predicted: MatchData, gold: MatchData, use_counts: bool = True) -> DataFrame:
    """Per-string confusion contributions (scoring.py:5-47). Columns:
    string, count, group_pred, group_gold, TP, FP, FN, TN."""
    pred = predicted.df.select(
        "string", "count", F.col("group").alias("group_pred")
    )
    gld = gold.df.select("string", F.col("group").alias("group_gold"))
    j = pred.join(gld, "string", "inner")
    if not use_counts:
        j = j.withColumn("count", F.lit(1).cast("long"))

    c = F.col("count").cast("decimal(38,0)")
    j = j.withColumn("__c", c)
    s_pg = j.groupBy("group_pred", "group_gold").agg(F.sum("__c").alias("__s_pg"))
    s_p = j.groupBy("group_pred").agg(F.sum("__c").alias("__s_p"))
    s_g = j.groupBy("group_gold").agg(F.sum("__c").alias("__s_g"))
    total = j.agg(F.sum("__c").alias("__total"))
    j = (
        j.join(s_pg, ["group_pred", "group_gold"])
        .join(s_p, "group_pred")
        .join(s_g, "group_gold")
        .crossJoin(F.broadcast(total))
    )
    j = j.withColumn("TP", (F.col("__s_pg") - c) * c)
    j = j.withColumn("FP", (F.col("__s_p") - c) * c - F.col("TP"))
    j = j.withColumn("FN", (F.col("__s_g") - c) * c - F.col("TP"))
    j = j.withColumn(
        "TN", (F.col("__total") - c) * c - F.col("TP") - F.col("FP") - F.col("FN")
    )
    return j.drop("__c", "__s_pg", "__s_p", "__s_g", "__total")


def confusion_matrix(predicted: MatchData, gold: MatchData, use_counts: bool = True) -> dict:
    """Summed + halved cells (scoring.py:50-72). Integer-exact: the cell
    columns are decimal(38,0), each sum is even, and the halving is Python
    integer // 2 (no double division anywhere — exact beyond 2^53)."""
    df = confusion_df(predicted, gold, use_counts=use_counts)
    row = df.agg(
        *[F.sum(cell).alias(cell) for cell in ["TP", "FP", "FN", "TN"]]
    ).collect()[0]
    return {cell: int(row[cell] or 0) // 2 for cell in ["TP", "FP", "FN", "TN"]}


def score_predicted(predicted: MatchData, gold: MatchData, use_counts: bool = True) -> dict:
    """accuracy / precision / recall / F1 / coverage (scoring.py:75-126)."""
    scores = dict(confusion_matrix(predicted, gold, use_counts=use_counts))
    n_scored = scores["TP"] + scores["TN"] + scores["FP"] + scores["FN"]

    if use_counts:
        c = F.col("count").cast("decimal(38,0)")
        agg = predicted.df.agg(
            F.sum(c).alias("s"), F.sum(c * c).alias("s2")
        ).collect()[0]
        # exact integer arithmetic up to the final ratio
        n_predicted = float(int(agg["s"]) ** 2 - int(agg["s2"])) / 2
    else:
        n = predicted.df.count()
        n_predicted = (n**2 - n) / 2

    scores["coverage"] = n_scored / n_predicted if n_predicted else 0.0
    if scores["TP"]:
        scores["accuracy"] = (scores["TP"] + scores["TN"]) / n_scored
        scores["precision"] = scores["TP"] / (scores["TP"] + scores["FP"])
        scores["recall"] = scores["TP"] / (scores["TP"] + scores["FN"])
        scores["F1"] = (
            2 * scores["precision"] * scores["recall"]
            / (scores["precision"] + scores["recall"])
        )
    else:
        scores["accuracy"] = scores["precision"] = scores["recall"] = scores["F1"] = 0
    return scores


def split_on_groups(md: MatchData, frac: float = 0.5, seed: int = 0) -> tuple[MatchData, MatchData]:
    """Group-level train/test split — no string of a group leaks across the
    boundary (scoring.py:129-156). Reproducible hash split instead of the
    reference's in-memory shuffle: same distributional semantics, cluster-safe."""
    tagged = md.df.withColumn(
        "__u", (F.pmod(F.xxhash64(F.col("group"), F.lit(seed)), F.lit(1_000_000)))
        / F.lit(1_000_000.0)
    )
    part1 = MatchData(tagged.where(F.col("__u") < frac).drop("__u"), _relabel=False)
    part2 = MatchData(tagged.where(F.col("__u") >= frac).drop("__u"), _relabel=False)
    return part1, part2


def kfold_on_groups(md: MatchData, k: int = 4, seed: int = 0):
    """K-fold over groups (scoring.py:159-194). Yields (train, test) per fold."""
    tagged = md.df.withColumn(
        "__fold", F.pmod(F.xxhash64(F.col("group"), F.lit(seed)), F.lit(k))
    )
    for fold in range(k):
        train = MatchData(tagged.where(F.col("__fold") != fold).drop("__fold"),
                          _relabel=False)
        test = MatchData(tagged.where(F.col("__fold") == fold).drop("__fold"),
                         _relabel=False)
        yield train, test


def blocking_stats(
    pairs: DataFrame,
    gold: MatchData,
    s0: str = "s0",
    s1: str = "s1",
) -> dict:
    """Blocking-quality metrics (standard ER evaluation — e.g. Christen,
    "Data Matching", ch. 7; beyond the reference, which never evaluates its
    blocking):

    - ``pair_completeness``: fraction of gold same-group pairs the candidate
      set retains (recall of the blocker);
    - ``reduction_ratio``: 1 − |candidates| / C(n, 2) over the gold universe
      (how much of the quadratic scan the blocker avoided);
    - raw counts (n_candidates, n_gold_pairs, n_strings).

    All relational: gold pairs are counted per-group via Σ s·(s−1)/2 (never
    materialized), retained pairs via one join of the candidate pairs onto
    the gold (string → group) map. Candidate pairs outside the gold universe
    are ignored for completeness and counted in n_candidates.
    """
    g = gold.df.select("string", "group")
    n = g.count()
    gold_pairs = (
        g.groupBy("group")
        .agg(F.count(F.lit(1)).alias("s"))
        .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2).alias("gp"))
        .collect()[0]["gp"]
    )
    gold_pairs = int(gold_pairs or 0)
    n_cand = pairs.count()
    retained = (
        pairs.join(
            g.select(F.col("string").alias(s0), F.col("group").alias("__g0")), s0
        )
        .join(g.select(F.col("string").alias(s1), F.col("group").alias("__g1")), s1)
        .where(F.col("__g0") == F.col("__g1"))
        .count()
    )
    total = n * (n - 1) / 2
    return {
        "n_strings": n,
        "n_candidates": n_cand,
        "n_gold_pairs": gold_pairs,
        "pair_completeness": retained / gold_pairs if gold_pairs else 1.0,
        "reduction_ratio": 1.0 - n_cand / total if total else 0.0,
    }


def bcubed_df(predicted: MatchData, gold: MatchData, use_counts: bool = False) -> DataFrame:
    """Per-string B-cubed rows (Bagga & Baldwin 1998; the extended
    count-weighted form follows Amigó et al. 2009) — beyond the reference,
    whose scoring is pairwise-only (scoring.py): B-cubed evaluates each
    RECORD's cluster neighborhood, so giant-cluster errors are bounded per
    record instead of quadratically.

    For record r with predicted cluster C(r) and gold cluster G(r):
        na  = Σ counts over C(r),  ng = Σ counts over G(r),
        nab = Σ counts over C(r) ∩ G(r)
        precision(r) = nab / na,  recall(r) = nab / ng

    Same relational shape as confusion_df: membership inner-join, three
    groupBy aggregates joined back (never group-partitioned windows — one
    over-merged mega-cluster would otherwise pin a whole task). The
    na/ng/nab columns stay integer-exact; p/r are emitted per row.
    """
    pred = predicted.df.select(
        "string", "count", F.col("group").alias("group_pred")
    )
    gld = gold.df.select("string", F.col("group").alias("group_gold"))
    j = pred.join(gld, "string", "inner")
    if not use_counts:
        j = j.withColumn("count", F.lit(1).cast("long"))
    c = F.col("count").cast("decimal(38,0)")
    j = j.withColumn("__c", c)
    s_pg = j.groupBy("group_pred", "group_gold").agg(F.sum("__c").alias("nab"))
    s_p = j.groupBy("group_pred").agg(F.sum("__c").alias("na"))
    s_g = j.groupBy("group_gold").agg(F.sum("__c").alias("ng"))
    j = (
        j.join(s_pg, ["group_pred", "group_gold"])
        .join(s_p, "group_pred")
        .join(s_g, "group_gold")
    )
    return j.select(
        "string", "count", "group_pred", "group_gold",
        F.col("na").cast("long").alias("na"),
        F.col("ng").cast("long").alias("ng"),
        F.col("nab").cast("long").alias("nab"),
        # divide in DOUBLE — decimal/decimal division truncates to scale 6
        (F.col("nab").cast("double") / F.col("na").cast("double")).alias("p"),
        (F.col("nab").cast("double") / F.col("ng").cast("double")).alias("r"),
    )


def bcubed(predicted: MatchData, gold: MatchData, use_counts: bool = False) -> dict:
    """B-cubed precision / recall / F1: the (count-weighted) record average
    of the per-record ratios. One extra 1-row aggregate over bcubed_df."""
    df = bcubed_df(predicted, gold, use_counts=use_counts)
    row = df.agg(
        F.sum(F.col("count") * F.col("p")).alias("sp"),
        F.sum(F.col("count") * F.col("r")).alias("sr"),
        F.sum("count").alias("n"),
    ).collect()[0]
    n = float(row["n"] or 0)
    if not n:
        return {"precision": 0.0, "recall": 0.0, "F1": 0.0, "n": 0}
    p = float(row["sp"]) / n
    r = float(row["sr"]) / n
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "F1": f1, "n": int(n)}


def rand_scores(predicted: MatchData, gold: MatchData, use_counts: bool = True) -> dict:
    """Rand index and Adjusted Rand Index (Hubert & Arabie 1985) from the
    pair-counting confusion cells — zero extra passes beyond
    confusion_matrix, and exact integer arithmetic up to the final ratios:

        RI  = (TP + TN) / (TP + FP + FN + TN)
        ARI = 2·(TP·TN − FN·FP) /
              ((TP+FN)·(FN+TN) + (TP+FP)·(FP+TN))
    """
    cells = confusion_matrix(predicted, gold, use_counts=use_counts)
    tp, fp, fn, tn = cells["TP"], cells["FP"], cells["FN"], cells["TN"]
    n = tp + fp + fn + tn
    ri = (tp + tn) / n if n else 0.0
    denom = (tp + fn) * (fn + tn) + (tp + fp) * (fp + tn)
    ari = 2 * (tp * tn - fn * fp) / denom if denom else 0.0
    return {"RI": ri, "ARI": ari, **cells}


def cluster_cohesion(
    clusters: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    cluster_col: str = "component",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-cluster COHESION audit over an ER partition and the match-edge
    set that produced it: how densely is each cluster internally connected,
    and how many near-miss edges straddle its boundary?

    Returns one row per cluster:

        cluster, n_members,
        n_edges_within    distinct canonical edges with both ends inside
        n_boundary_edges  distinct canonical edges with exactly one end
                          inside (each boundary edge counts for BOTH of the
                          two clusters it touches)
        density_milli     floor(2000·E_within / (n·(n−1))) — the realized
                          fraction of the n·(n−1)/2 possible intra-cluster
                          pairs, in exact integer milli units; singletons
                          are vacuously 1000

    Reading the report: transitive closure (CC) unites a cluster through
    ANY connecting path, so low density flags chain-merged clusters that a
    pairwise reviewer would likely split (the classic CC over-merge smell),
    and a high boundary count flags a threshold sitting inside a dense
    score region (many just-cut edges). This is the audit table behind the
    giant-component guard in unite_similar (constrained.py).

    Shape: two label equi-joins onto the edge list + two groupBys — no
    windows, no per-cluster serialization; edge rows carry only (cluster,
    cluster), so nothing wide crosses the shuffle. All-integer output.
    """
    lab = clusters.select(
        F.col(node_col).alias("_n"), F.col(cluster_col).alias("_c")
    )
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(u.alias("u"), v.alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .join(lab.withColumnsRenamed({"_n": "u", "_c": "cu"}), "u")
        .join(lab.withColumnsRenamed({"_n": "v", "_c": "cv"}), "v")
        .select("cu", "cv")
    )
    within = (
        e.where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n_edges_within"))
    )
    boundary = (
        e.where(F.col("cu") != F.col("cv"))
        .select(F.col("cu").alias("cluster"))
        .union(e.where(F.col("cu") != F.col("cv")).select(F.col("cv").alias("cluster")))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_boundary_edges"))
    )
    members = lab.groupBy(F.col("_c").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    out = (
        members.join(within, "cluster", "left")
        .join(boundary, "cluster", "left")
        .select(
            "cluster",
            "n_members",
            F.coalesce("n_edges_within", F.lit(0)).alias("n_edges_within"),
            F.coalesce("n_boundary_edges", F.lit(0)).alias("n_boundary_edges"),
        )
    )
    n = F.col("n_members")
    return out.withColumn(
        "density_milli",
        F.when(n > 1, F.floor((F.col("n_edges_within") * 2000) / (n * (n - 1))))
        .otherwise(F.lit(1000))
        .cast("long"),
    )
