"""Adversarial skew fixtures — SCALE.md argues the df-cap and pair salting
keep work balanced under hot keys; these tests measure it.

Proxy note: the test session runs with the Spark UI (and its REST status
API) disabled, so task wall-times are not queryable in-process. With
identical per-row work, per-partition RECORD balance is the deterministic
equivalent of task-time balance — a partition with 3× the rows is the
partition with ~3× the task time, minus scheduling noise the timing version
would have to tolerate anyway.
"""

import pytest
from pyspark.sql import functions as F


def _partition_counts(df):
    rows = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid").count().collect()
    )
    return [r["count"] for r in rows]


def test_hot_token_blocking_capped_and_salted_balance(spark):
    """One token ('corporation') appears in ~33% of 3,000 names. The df-cap
    must drop it from blocking (no C(1000,2) ≈ 500k-pair blowup), and the
    salted repartition must spread the surviving pairs so the max partition
    holds ≤ 3× the median — the bound a straggler-free cluster run needs."""
    from nama_spark.operators.block import eligible_tokens, salt_pairs
    from nama_spark.operators.token_similarity import TokenSimilarity

    n = 3000
    names = spark.range(n).select(
        F.concat_ws(
            " ",
            # hot token on every 3rd name, unique filler otherwise
            F.when(F.col("id") % 3 == 0, F.lit("corporation")).otherwise(
                F.concat(F.lit("u"), F.col("id"))
            ),
            # moderate shared vocab so blocking has genuine work
            F.concat(F.lit("tok"), (F.col("id") % 400)),
            F.concat(F.lit("tokk"), ((F.col("id") * 7 + 3) % 400)),
        ).alias("string")
    )
    ts = TokenSimilarity(tokenizer="words", max_block_size=100).fit(names)
    try:
        elig = eligible_tokens(ts._weights, 2, 100)
        # the hot token is OUT of the eligible window (df ≈ 1000 > cap 100)
        assert elig.where(F.col("token") == "corporation").count() == 0

        pairs = ts.candidate_pairs()
        n_pairs = pairs.count()
        # every blocking token has df ≤ cap ⇒ pairs ≤ n_blocks·C(cap,2); the
        # hot-token blowup alone would be C(1000,2) = 499,500
        assert 0 < n_pairs < 150_000

        counts = _partition_counts(salt_pairs(pairs))
        counts.sort()
        median = counts[len(counts) // 2]
        assert max(counts) <= 3 * max(median, 1), (max(counts), median)
    finally:
        ts.unpersist()


def test_hot_user_sessionize_capped(spark):
    """One user holds ~50% of 20k events. The per-user state path (one open
    session per user) must handle the hot key, the relational twin must
    agree exactly, and the relational plan's single user-shuffle must not
    concentrate other users onto the hot user's partition beyond 3× median."""
    from nama_spark.streaming.stateful import (
        sessionize_capped,
        sessionize_capped_sql,
    )

    n = 20_000
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        # even ids → user 0 (the hot user); odd ids spread over 99 others
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(1 + F.pmod(F.col("id"), F.lit(99))).alias("user_id"),
        # 1 event/user/minute-ish with occasional >30min gaps
        F.timestamp_seconds(
            F.lit(1700000000)
            + (F.col("id") % 500) * 60
            + (F.col("id") / 500).cast("long") * 7200
        ).alias("ts"),
    )
    fold = sessionize_capped(ev, gap="30 minutes", max_events=10)
    rel = sessionize_capped_sql(ev, gap="30 minutes", max_events=10)
    got_f = {tuple(r) for r in fold.collect()}
    got_r = {tuple(r) for r in rel.collect()}
    assert got_f == got_r and len(got_f) > 0

    # hot user's sessions all present and capped
    hot = [r for r in got_r if r[0] == 0]
    assert sum(r[4] for r in hot) == n // 2
    assert all(r[4] <= 10 for r in hot)

    # record balance of the one shuffle the relational path does: hash on
    # user_id spreads the 100 users over partitions; the hot partition is
    # dominated by user 0's rows — bounded by the hot user's own mass, which
    # is the irreducible minimum for a per-user operator. Assert nothing
    # WORSE than that irreducible skew (hot partition ≤ hot-user rows + 3×
    # the median partition's rows).
    counts = _partition_counts(ev.repartition(8, "user_id"))
    counts.sort()
    median = counts[len(counts) // 2]
    assert max(counts) <= n // 2 + 3 * median


def _mode_vectors(n_hot, n_cold, dim=8, n_sub=5, seed=3):
    """~n_hot/(n_hot+n_cold) of the corpus concentrated in ONE dominant
    embedding mode (built from n_sub tight sub-modes along axis directions,
    the realistic shape: a hot cell usually has substructure), the rest
    spread uniformly."""
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_hot):
        c = np.zeros(dim)
        c[i % n_sub] = 1.0
        v = c + 0.05 * rng.randn(dim)
        rows.append((f"hot{i}", [float(x) for x in v / np.linalg.norm(v)]))
    for i in range(n_cold):
        v = rng.randn(dim)
        rows.append((f"cold{i}", [float(x) for x in v / np.linalg.norm(v)]))
    return rows


def test_hot_cell_secondary_split_balances(spark):
    """IVF k-means cells are not size-balanced: one dominant mode lands
    ~600 of 1,000 vectors in one cell, whose self-join would be O(600²).
    _split_hot_cells must split every over-cap cell so the largest cell
    stays within 3× the median (the record-balance proxy for task time —
    per-cell join work is m², so cell-size balance IS the skew bound),
    while preserving every (string, vector) row exactly once."""
    from nama_spark.operators.embed import _split_hot_cells

    rows = _mode_vectors(600, 400)
    # cell 0 = the hot mode; cold vectors spread over cells 1..4
    assigned = spark.createDataFrame(
        [(0 if s.startswith("hot") else 1 + (int(s[4:]) % 4), s, v)
         for s, v in rows],
        ["cell", "string", "vec"],
    ).select(F.col("cell").cast("long").alias("cell"), "string", "vec")

    out = _split_hot_cells(assigned, max_cell_rows=150).localCheckpoint()
    assert out.count() == 1000
    assert {r["string"] for r in out.select("string").collect()} == {
        s for s, _ in rows
    }
    sizes = sorted(
        r["c"] for r in
        out.groupBy("cell").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    median = sizes[len(sizes) // 2]
    assert max(sizes) <= 3 * max(median, 1), (max(sizes), median)
    # the hot cell actually split (more cells than the 5 we started with)
    assert len(sizes) >= 7, sizes

    # cap high enough that nothing is hot → pass-through, keys untouched
    same = _split_hot_cells(assigned, max_cell_rows=2000)
    assert same.groupBy("cell").count().count() == 5


def test_hot_cell_ivf_candidates_recall(spark):
    """End-to-end: ivf_candidates(max_cell_rows=...) on a dominant-mode
    corpus still finds the ≥-threshold pairs — the secondary split follows
    the mode's substructure, so recall stays high while no single cell's
    join exceeds the cap's O(m²) budget. Exact-cos filter ⇒ subset always."""
    from nama_spark.operators.embed import bruteforce_candidates, ivf_candidates

    rows = _mode_vectors(600, 400)
    emb = spark.createDataFrame(rows, ["string", "vec"]).repartition(8)
    t = 0.8
    bf = {(r["s0"], r["s1"]) for r in bruteforce_candidates(emb, t).collect()}
    got = {
        (r["s0"], r["s1"])
        for r in ivf_candidates(
            emb, t, n_cells=8, nprobe=2, max_cell_rows=150
        ).collect()
    }
    assert bf
    assert got.issubset(bf)
    recall = len(got & bf) / len(bf)
    assert recall >= 0.7, recall
