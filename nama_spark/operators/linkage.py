"""Cross-table record linkage — bipartite A→B matching.

The reference is a self-matching engine (one string universe united into
groups); linking TWO tables (e.g. vendor names ↔ registry names) is the other
classic ER task. Reuses the same token machinery: weights fit on the UNION
universe (idf over both sides), candidates from an A-tokens ⋈ B-tokens block
join on eligible tokens (never A×B), weighted set-similarity scores, then a
selection rule:

- ``mode="best_left"``: the best-scoring B per A (row_number window,
  deterministic ties: score desc, right string asc);
- ``mode="mutual"``: symmetric best match — kept only if B is A's best AND A
  is B's best. The standard scalable approximation of one-to-one assignment
  (a true global greedy is sequential; mutual-best is its relational core and
  never produces a conflicting assignment).

Scale: one shuffle for the block join (eligible-token cap bounds every
block), two windows for the selection — no cross join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nama_spark.functions.tokenize import token_weights, tokens_table
from nama_spark.operators.block import eligible_tokens
from nama_spark.operators.score import token_similarity_scores


def link_candidates(
    left: DataFrame,
    right: DataFrame,
    tokenizer: str = "words",
    weighting: str = "tf-idf",
    measure: str = "jaccard",
    max_block_size: int = 100,
    left_col: str = "string",
    right_col: str = "string",
) -> DataFrame:
    """(s0 = left string, s1 = right string, score) for every cross-table
    candidate pair sharing an eligible token. Weights are fit once on the
    union universe so both sides score in the same token space."""
    l = left.select(F.col(left_col).alias("string")).distinct()
    r = right.select(F.col(right_col).alias("string")).distinct()
    uni = l.union(r).distinct()
    toks = tokens_table(uni, tokenizer=tokenizer)
    w = token_weights(toks, weighting=weighting)
    elig = eligible_tokens(w, 2, max_block_size)
    te = toks.join(elig, "token", "left_semi")
    ta = te.join(l, "string", "left_semi").select(
        "token", F.col("string").alias("s0")
    )
    tb = te.join(r, "string", "left_semi").select(
        "token", F.col("string").alias("s1")
    )
    pairs = (
        ta.join(tb, "token")
        .where(F.col("s0") != F.col("s1"))
        .select("s0", "s1")
        .distinct()
    )
    scored = token_similarity_scores(pairs, toks, w, measure=measure)
    # A name present verbatim in BOTH tables is the strongest possible match
    # (the tables are distinct record sets — this is not the self-match case
    # where s0 == s1 is the trivial identity). Emit those links directly with
    # score 1.0, independent of blocking: an exact-equal pair whose tokens
    # all fall outside the eligible-token window (df < 2 or block > cap)
    # would otherwise never become a candidate, and link_tables would
    # silently pick the second-best right string. One equi-join, no blocking
    # cost.
    exact = (
        l.join(r.select(F.col("string").alias("s1")),
               l["string"] == F.col("s1"))
        .select(F.col("string").alias("s0"), "s1",
                F.lit(1.0).alias("score"))
    )
    return scored.unionByName(exact)


def link_tables(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.5,
    mode: str = "best_left",
    **candidate_kwargs,
) -> DataFrame:
    """(s0, s1, score) linked rows per the selection rule (``best_left``,
    ``mutual``, or ``one_to_one`` — K-round mutual-best peeling, which also
    appends the ``round`` column). Left strings with no ≥-threshold
    candidate are absent (callers outer-join back if they need unmatched
    rows)."""
    assert mode in ("best_left", "mutual", "one_to_one")
    scored = link_candidates(left, right, **candidate_kwargs).where(
        F.col("score") >= threshold
    )
    # rank on a ROUNDED score: two candidates with mathematically-equal
    # scores (same token-set overlap — common with permuted word orders) can
    # differ by ~1e-16 depending on summation order, which would make the
    # string tie-break nondeterministic across runs/engines. 9 decimals is
    # far below any meaningful similarity difference.
    rscore = F.round(F.col("score"), 9)
    # a verbatim cross-table match (s1 == s0) wins any score tie outright —
    # a token-permuted competitor can also score exactly 1.0 and would
    # otherwise win the lexicographic tie-break if it sorts earlier
    exact_first = (F.col("s1") != F.col("s0")).asc()
    wl = Window.partitionBy("s0").orderBy(
        rscore.desc(), exact_first, F.col("s1").asc()
    )
    out = scored.withColumn("__rl", F.row_number().over(wl))
    if mode == "best_left":
        return out.where(F.col("__rl") == 1).select("s0", "s1", "score")
    if mode == "one_to_one":
        # K-round mutual-best peeling; the rank key keeps the rounded-score
        # + verbatim-wins-ties contract (struct desc: rscore, then exact)
        keyed = scored.withColumn(
            "__ord",
            F.struct(
                rscore.alias("r"),
                (F.col("s1") == F.col("s0")).cast("int").alias("e"),
            ),
        )
        return one_to_one_links(
            keyed, left_id="s0", right_id="s1", score_col="score",
            order_col="__ord",
        ).select("s0", "s1", "score", "round")
    wr = Window.partitionBy("s1").orderBy(
        rscore.desc(), exact_first, F.col("s0").asc()
    )
    out = out.withColumn("__rr", F.row_number().over(wr))
    return (
        out.where((F.col("__rl") == 1) & (F.col("__rr") == 1))
        .select("s0", "s1", "score")
    )


def rule_cascade_links(
    left: DataFrame,
    right: DataFrame,
    rules,
    left_id: str = "id0",
    right_id: str = "id1",
    max_key_size: int | None = None,
) -> DataFrame:
    """Deterministic WATERFALL linkage — the production-ER pattern that
    precedes any probabilistic pass: an ordered cascade of exact-key rules
    (verbatim → normalized → truncated/phonetic …), where each left record
    links by the FIRST rule that fires and the output carries the rule
    name as provenance (audit: "why did these two link?").

    ``rules`` is an ordered list of ``(name, left_key_fn, right_key_fn)``
    where the key fns map a DataFrame to a key Column. For each left id
    the winner is the match from the lowest-index firing rule, ties within
    a rule broken by smallest right id — fully deterministic, engine- and
    partition-invariant. Returns (left_id, right_id, rule, rule_idx) with
    one row per matched left id; unmatched ids are simply absent (anti-join
    the result to route the residue to the fuzzy pipeline).

    Scale shape: one hash equi-join PER RULE on that rule's key (never a
    cross join), a union, and one per-left-id window for first-rule-wins —
    the window partitions on left id, so no global sort and no skew beyond
    a left id's own candidate fan-out. ``max_key_size`` optionally drops
    right-side key groups larger than the cap before joining (the blocking
    df-cap pattern) so a degenerate rule key ("", "inc") cannot explode a
    rule's join; dropped keys are dropped from THAT rule only — later
    rules still see the record.

    No reference counterpart (nama is probabilistic-only); included
    because every deployed linkage system fronts the fuzzy matcher with a
    deterministic cascade.
    """
    cands = None
    for i, (name, kl, kr) in enumerate(rules):
        l = left.select(
            F.col(left_id).alias("_lid"), kl(left).alias("_k")
        ).where(F.col("_k").isNotNull())
        r = right.select(
            F.col(right_id).alias("_rid"), kr(right).alias("_k")
        ).where(F.col("_k").isNotNull())
        if max_key_size is not None:
            sizes = r.groupBy("_k").agg(F.count(F.lit(1)).alias("_n"))
            r = r.join(
                sizes.where(F.col("_n") <= max_key_size).select("_k"), "_k"
            )
        c = l.join(r, "_k").select(
            "_lid",
            "_rid",
            F.lit(i).alias("rule_idx"),
            F.lit(name).alias("rule"),
        )
        cands = c if cands is None else cands.unionByName(c)
    if cands is None:
        raise ValueError("rules must be non-empty")
    w = Window.partitionBy("_lid").orderBy("rule_idx", "_rid")
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            "rule",
            "rule_idx",
        )
    )


def one_to_one_links(
    scores: DataFrame,
    left_id: str = "id0",
    right_id: str = "id1",
    score_col: str = "score",
    rounds: int = 3,
    order_col: str | None = None,
) -> DataFrame:
    """ONE-TO-ONE assignment by iterative mutual-best peeling — the
    distributed greedy that approximates the (inherently sequential)
    global greedy assignment: in each round, a pair is matched iff each
    side is the other's best REMAINING candidate; matched ids leave the
    pool and the next round re-elects bests among what is left. Three
    rounds resolve the chains the single-shot ``mode="mutual"`` rule
    leaves unmatched (A's best took B, so A's second-best becomes its
    best), and every pair kept is still a mutual best at the time it is
    matched — no conflicting assignments, deterministic throughout
    (ties: score desc, partner id asc; pass ``order_col`` to rank on a
    composite key — e.g. a (score, verbatim-equality) struct — while
    ``score_col`` rides along unchanged).

    Returns (left_id, right_id, score_col, round) with at most one row
    per left id AND per right id overall. Scale shape per round: two
    per-id windows + one equi-join for the mutual intersection + two
    hash anti-joins to shrink the pool — never a global sort; `rounds`
    is a small constant (Kwashie et al.-style peeling converges
    geometrically on realistic score graphs).

    No reference counterpart (nama unites groups rather than assigning
    1:1); included because exclusive assignment (each invoice to at most
    one PO, each patient to at most one registry row) is a core linkage
    deliverable the best-left/mutual single-shot rules cannot guarantee
    to saturate.
    """
    remaining = scores.select(
        F.col(left_id).alias("_l"),
        F.col(right_id).alias("_r"),
        F.col(score_col).alias("_s"),
        F.col(order_col or score_col).alias("_o"),
    )
    matched = None
    for rnd in range(1, rounds + 1):
        wl = Window.partitionBy("_l").orderBy(F.col("_o").desc(), F.col("_r"))
        wr = Window.partitionBy("_r").orderBy(F.col("_o").desc(), F.col("_l"))
        best = (
            remaining.withColumn("_rl", F.row_number().over(wl))
            .withColumn("_rr", F.row_number().over(wr))
            .where((F.col("_rl") == 1) & (F.col("_rr") == 1))
            .select("_l", "_r", "_s", "_o", F.lit(rnd).alias("round"))
            .localCheckpoint(eager=False)
        )
        matched = best if matched is None else matched.unionByName(best)
        remaining = remaining.join(
            best.select("_l"), "_l", "left_anti"
        ).join(best.select("_r"), "_r", "left_anti")
    return matched.select(
        F.col("_l").alias(left_id),
        F.col("_r").alias(right_id),
        F.col("_s").alias(score_col),
        "round",
    )
