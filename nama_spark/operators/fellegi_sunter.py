"""Fellegi–Sunter probabilistic record linkage — pattern EM + match weights.

The reference scores pairs with a single learned string-similarity model
(nama/embedding_similarity.py); the classical multi-field alternative is the
Fellegi–Sunter model (Fellegi & Sunter, JASA 1969): each candidate pair gets
an agreement vector γ = (γ_1..γ_k) over k field comparisons, and the match
weight is the log-Bayes factor

    w(γ) = Σ_i log2( m_i(γ_i) / u_i(γ_i) )

where m_i(l) = P(γ_i = l | match) and u_i(l) = P(γ_i = l | non-match). The
m/u parameters are estimated without labels by EM over the agreement-pattern
counts (Winkler 1988; the same formulation modern open-source linkers such
as Splink use).

Spark realization — the key scale observation is that EM's sufficient
statistic is the PATTERN-COUNT table, whose size is bounded by
∏_i n_levels_i (a few dozen rows) regardless of corpus size:

- ``pattern_counts``: ONE groupBy shuffle over the candidate pairs → the
  tiny (γ, n) table. This is the only pass that touches pair-scale data.
- ``em_fit``: numpy EM over the collected pattern table on the driver —
  O(iters · patterns), microseconds; a distributed EM would shuffle the
  same aggregate every iteration for nothing.
- ``match_weights``: a pure column expression (chained ``when`` literals
  built from the fitted params — no join, no shuffle, whole-stage codegen).
  Weights are emitted as integer milli-units (round(1000·log2(m/u))) so
  downstream thresholds and cross-engine oracles compare integers, never
  accumulated floats (same convention as the quality classifier's
  milli-unit scores).

At 100 TB: candidate pairs come from any blocker in block.py; the one
groupBy is map-side-combinable (tiny key space), the params are literals in
the task binary, and scoring is embarrassingly parallel.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pattern_counts(gammas: DataFrame, gamma_cols: list[str]) -> DataFrame:
    """(γ_1..γ_k, n_pairs) — EM's sufficient statistic. One map-side-
    combinable groupBy; the result has at most ∏ levels rows."""
    return gammas.groupBy(*gamma_cols).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def em_fit(
    patterns,
    gamma_cols: list[str],
    n_levels: dict[str, int],
    lam: float = 0.1,
    iters: int = 60,
    tol: float = 1e-10,
    floor: float = 1e-6,
):
    """EM over the pattern-count table → (lambda, params).

    ``patterns``: the ``pattern_counts`` DataFrame (collected here — it is
    aggregate-sized by construction) or an already-collected list of rows.
    ``params[comp][level] = (m, u)``. Probabilities are floored at ``floor``
    so a level never seen among matches keeps a finite log weight.

    Standard pattern-EM updates (Winkler 1988):
      E:  p_γ = λ·∏ m_i(γ_i) / (λ·∏ m_i(γ_i) + (1−λ)·∏ u_i(γ_i))
      M:  λ     = Σ n_γ p_γ / Σ n_γ
          m_i(l) = Σ_{γ_i=l} n_γ p_γ / Σ n_γ p_γ        (u_i with 1−p_γ)

    Missing data: level ``-1`` means "comparison unobservable for this
    pair" (a NULL on either side — see ``null_aware``). A -1 comparison is
    MARGINALIZED: it contributes factor 1 to both class likelihoods in the
    E-step and is excluded from that comparison's M-step mass (Splink's
    null-level convention). With no -1 levels anywhere the updates reduce
    exactly to the unmodified formulas.
    """
    if isinstance(patterns, DataFrame):
        patterns = patterns.collect()
    rows = [
        (tuple(r[c] for c in gamma_cols), float(r["n_pairs"]))
        for r in patterns
    ]
    total = sum(n for _, n in rows)
    # uninformative-but-asymmetric init: higher levels slightly more likely
    # under match, so EM breaks the label symmetry deterministically
    params = {
        c: {
            l: (
                max(floor, (l + 1) / (n_levels[c] * (n_levels[c] + 1) / 2)),
                max(floor, (n_levels[c] - l) / (n_levels[c] * (n_levels[c] + 1) / 2)),
            )
            for l in range(n_levels[c])
        }
        for c in gamma_cols
    }
    prev = None
    for _ in range(iters):
        # E-step
        resp = []
        for g, n in rows:
            pm, pu = lam, 1.0 - lam
            for c, l in zip(gamma_cols, g):
                if int(l) < 0:  # unobservable comparison: marginalize
                    continue
                m, u = params[c][int(l)]
                pm *= m
                pu *= u
            p = pm / (pm + pu) if (pm + pu) > 0 else 0.5
            resp.append(p)
        # M-step
        sm = sum(n * p for (_, n), p in zip(rows, resp))
        lam = sm / total
        new_params = {}
        for ci, c in enumerate(gamma_cols):
            mm = {l: 0.0 for l in range(n_levels[c])}
            uu = {l: 0.0 for l in range(n_levels[c])}
            sm_c = su_c = 0.0  # per-comparison observed mass only
            for (g, n), p in zip(rows, resp):
                l = int(g[ci])
                if l < 0:
                    continue
                mm[l] += n * p
                uu[l] += n * (1.0 - p)
                sm_c += n * p
                su_c += n * (1.0 - p)
            new_params[c] = {
                l: (
                    max(floor, mm[l] / sm_c) if sm_c > 0 else floor,
                    max(floor, uu[l] / su_c) if su_c > 0 else floor,
                )
                for l in range(n_levels[c])
            }
        params = new_params
        if prev is not None and abs(lam - prev) < tol:
            break
        prev = lam
    return lam, params


def milli_weights(params: dict) -> dict:
    """params → integer milli log2-Bayes-factor per (comparison, level):
    round(1000·log2(m/u)). Computed ONCE driver-side so every engine and
    every task sums the same integer literals."""
    return {
        c: {l: round(1000.0 * math.log2(m / u)) for l, (m, u) in levels.items()}
        for c, levels in params.items()
    }


def match_weights(
    gammas: DataFrame,
    params: dict,
    gamma_cols: list[str] | None = None,
    out_col: str = "weight_milli",
) -> DataFrame:
    """Add the summed integer milli match weight. ``params`` is either the
    em_fit (m, u) dict or an already-milli dict (int leaves). Pure column
    expression — a chained CASE per comparison, no join/shuffle. Level -1
    (comparison unobservable — NULL on either side, see ``null_aware``)
    contributes weight 0: missing data is no evidence either way."""
    gamma_cols = gamma_cols or list(params.keys())
    sample = next(iter(next(iter(params.values())).values()))
    w = params if isinstance(sample, int) else milli_weights(params)

    def level_expr(c: str) -> Column:
        expr = F.when(F.col(c) == -1, F.lit(0).cast("long")).otherwise(
            F.lit(None).cast("long")
        )
        for l, wl in sorted(w[c].items()):
            expr = F.when(F.col(c) == l, F.lit(int(wl))).otherwise(expr)
        return expr

    total = None
    for c in gamma_cols:
        e = level_expr(c)
        total = e if total is None else total + e
    return gammas.withColumn(out_col, total)


def match_probability(
    df: DataFrame,
    lam: float,
    weight_col: str = "weight_milli",
    out_col: str = "p_match",
) -> DataFrame:
    """Posterior P(match | γ) = λ·2^w / (λ·2^w + 1−λ) from the milli
    weight. Float by nature — callers round for cross-engine comparison."""
    bayes = F.pow(F.lit(2.0), F.col(weight_col) / F.lit(1000.0))
    return df.withColumn(
        out_col,
        (F.lit(lam) * bayes) / (F.lit(lam) * bayes + F.lit(1.0 - lam)),
    )


def mu_from_labels(
    gammas: DataFrame,
    label_col: str,
    gamma_cols: list[str],
    n_levels: dict[str, int],
    floor: float = 1e-6,
):
    """Supervised m/u estimation when labeled pairs exist (the textbook
    estimator EM approximates): m_i(l) = P(γ_i = l | label), u_i likewise
    over the non-matches. One groupBy per comparison over (γ_i, label) —
    k tiny aggregates, no pair-scale collect. Returns (lambda, params) in
    em_fit's shape so match_weights/match_probability consume it directly."""
    lab = F.col(label_col).cast("boolean")
    tot = gammas.groupBy(lab.alias("__m")).agg(
        F.count(F.lit(1)).alias("__n")
    ).collect()
    n_m = sum(r["__n"] for r in tot if r["__m"])
    n_u = sum(r["__n"] for r in tot if not r["__m"])
    if not n_m or not n_u:
        raise ValueError("mu_from_labels needs both matched and "
                         "non-matched labeled pairs")
    params = {}
    for c in gamma_cols:
        counts = gammas.groupBy(F.col(c).alias("__l"), lab.alias("__m")).agg(
            F.count(F.lit(1)).alias("__n")
        ).collect()
        mm = {l: 0 for l in range(n_levels[c])}
        uu = {l: 0 for l in range(n_levels[c])}
        for r in counts:
            if int(r["__l"]) < 0:  # null level: excluded from estimation
                continue
            (mm if r["__m"] else uu)[int(r["__l"])] = r["__n"]
        # normalize over the OBSERVED mass for this comparison (equals
        # n_m/n_u exactly when no pair has a -1 level)
        n_m_c = sum(mm.values()) or n_m
        n_u_c = sum(uu.values()) or n_u
        params[c] = {
            l: (max(floor, mm[l] / n_m_c), max(floor, uu[l] / n_u_c))
            for l in range(n_levels[c])
        }
    return n_m / (n_m + n_u), params


def null_aware(inner: Column, c0: Column, c1: Column) -> Column:
    """Wrap an agreement-level expression with the Fellegi–Sunter missing-
    data convention: if EITHER side of the comparison is NULL, the level is
    ``-1`` ("unobservable") instead of whatever ``inner`` would say. -1
    levels carry weight 0 in ``match_weights`` (absence of evidence), are
    marginalized by ``em_fit``, and are excluded from ``mu_from_labels``
    estimation — a pair with a missing phone is NOT punished as a phone
    disagreement (the classic naive-encoding bias; Splink's null-level
    semantics). Pure column expression."""
    return (
        F.when(c0.isNull() | c1.isNull(), F.lit(-1)).otherwise(inner)
    ).cast("int")


def string_gammas(
    scored_pairs: DataFrame,
    s0: str = "s0",
    s1: str = "s1",
    score_col: str = "score",
    bands: tuple[float, float] = (0.5, 0.8),
) -> DataFrame:
    """Agreement vector for STRING pairs (when no record fields exist):

    - ``g_exact``: the two strings are byte-identical (level 1/0);
    - ``g_sim``: the set-similarity score banded into 3 levels
      (< bands[0] → 0, < bands[1] → 1, else 2);
    - ``g_prefix``: first tokens equal (a cheap structural agreement,
      independent of the score's token-set view).

    Pure column expressions over an already-scored candidate set.
    """
    first = lambda c: F.split(F.col(c), r"[^A-Za-z0-9]+").getItem(0)  # noqa: E731
    return scored_pairs.select(
        s0, s1, score_col,
        F.when(F.col(s0) == F.col(s1), 1).otherwise(0).alias("g_exact"),
        F.when(F.col(score_col) >= bands[1], 2)
        .when(F.col(score_col) >= bands[0], 1)
        .otherwise(0).alias("g_sim"),
        F.when(F.lower(first(s0)) == F.lower(first(s1)), 1)
        .otherwise(0).alias("g_prefix"),
    )


def fs_link_tables(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.9,
    bands: tuple[float, float] = (0.5, 0.8),
    iters: int = 60,
    **candidate_kwargs,
):
    """Cross-table linkage with an UNSUPERVISED Fellegi–Sunter decision
    instead of a hand-picked score threshold: blocked candidates + weighted
    jaccard from linkage.link_candidates, string agreement vectors, pattern
    EM for (λ, m, u), then pairs with posterior P(match|γ) ≥ threshold.

    Returns (links, lam, params): the links carry s0, s1, score,
    weight_milli, p_match. Same scale shape as link_tables — the only
    additions are one tiny pattern groupBy and a shuffle-free scoring
    expression.

    Caveat (inherent to unsupervised FS): EM needs CONTRAST between match
    and non-match pattern mass. A candidate set where every pair agrees the
    same way (e.g. every right-side string carries the same dirty suffix
    and no verbatim matches exist) has no identifiable mixture — EM then
    converges to a low λ and links nothing. With labels, prefer
    ``mu_from_labels``; without, ensure the blocker admits some
    clear matches and clear non-matches."""
    from nama_spark.operators.linkage import link_candidates

    scored = link_candidates(left, right, **candidate_kwargs)
    gam = string_gammas(scored, bands=bands).localCheckpoint(eager=False)
    cols = ["g_exact", "g_sim", "g_prefix"]
    lam, params = em_fit(
        pattern_counts(gam, cols), cols,
        {"g_exact": 2, "g_sim": 3, "g_prefix": 2}, iters=iters,
    )
    out = match_probability(match_weights(gam, params, cols), lam)
    return out.where(F.col("p_match") >= threshold), lam, params


def term_frequencies(records: DataFrame, field: str) -> DataFrame:
    """(value, n_value, tf) — each value's share of the records (the
    term-frequency table behind TF-adjusted match weights, Winkler's
    value-specific u; the same adjustment Splink applies). One groupBy +
    a broadcast 1-row total; n_value stays exact for oracles."""
    counts = records.groupBy(F.col(field).alias("value")).agg(
        F.count(F.lit(1)).alias("n_value")
    )
    total = records.agg(F.count(F.lit(1)).alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "value", "n_value",
            (F.col("n_value") / F.col("__total")).alias("tf"),
        )
    )


def tf_adjusted_weights(
    pairs: DataFrame,
    tf: DataFrame,
    v0: str,
    v1: str,
    weight_col: str = "weight_milli",
    out_col: str = "weight_tf_milli",
) -> DataFrame:
    """TF-adjust a pair's match weight on one field: when the pair AGREES
    (v0 == v1 == v), the average-u evidence the base weight carries is
    re-specified to the VALUE's own chance agreement rate —

        adj = log2( u_bar / tf_v ),   u_bar = Σ_v tf_v²

    (u_bar is the probability two random records agree on the field at
    all, so common values get a negative adjustment and rare values a
    positive one; disagreeing pairs are untouched). Relational: one
    broadcast u_bar scalar + one equi-join on the agreed value; the
    adjustment lands in integer milli units like the base weight."""
    u_bar = tf.agg(F.sum(F.col("tf") * F.col("tf")).alias("__ubar"))
    agreed = F.col(v0) == F.col(v1)
    out = (
        pairs.join(
            tf.select(F.col("value").alias(v0),
                      F.col("tf").alias("__tf")),
            v0, "left",
        )
        .crossJoin(F.broadcast(u_bar))
        .withColumn(
            "tf_adj_milli",
            F.when(
                agreed & F.col("__tf").isNotNull(),
                F.round(F.lit(1000.0) * F.log2(F.col("__ubar") / F.col("__tf")))
                .cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .withColumn(out_col, F.col(weight_col) + F.col("tf_adj_milli"))
        .drop("__tf", "__ubar")
    )
    return out
