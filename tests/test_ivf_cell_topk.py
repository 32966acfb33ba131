"""Round-6 guard: ivf_topk_delta's per-cell numpy top-k must be BIT-exact
against the round-5 relational path (cell equi-join + cosine_sim_expr +
global window) — float32 products, dimension-sequential float64 fold,
ties at the k-th cos never dropped."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nama_spark.operators.ann import (
    cosine_sim_expr,
    ivf_assign,
    ivf_fit_centroids,
    ivf_topk_delta,
)


def _join_path(queries, centers, assigned, k, nprobe, vec_type):
    """The round-5 implementation, verbatim."""
    probes = ivf_assign(queries, centers, nprobe=nprobe).select(
        F.col("vec_id").alias("query_id"), "cell",
        F.col("embedding").alias("qv"),
    )
    cand = probes.join(
        assigned.select(
            "cell", F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
        ),
        "cell",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("cos", cosine_sim_expr(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cos")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rn").alias("rank"))
    )


def _mk_corpus(spark, vec_type, with_dups=False):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(200):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(16)]))
    if with_dups:
        # duplicate vectors under new ids: pervasive cos ties at the k-th
        # position, the truncation case that must keep ties
        rows += [(1000 + i, list(v)) for i, v in
                 [(r[0], r[1]) for r in rows[:50]]]
    return spark.createDataFrame(
        rows, f"vec_id: long, embedding: array<{vec_type}>"
    )


@pytest.mark.parametrize("vec_type", ["float", "double"])
@pytest.mark.parametrize("with_dups", [False, True])
def test_cell_topk_bitwise_equals_join_path(spark, vec_type, with_dups):
    emb = _mk_corpus(spark, vec_type, with_dups).localCheckpoint()
    queries = emb.where(F.col("vec_id") < 6)
    centers = ivf_fit_centroids(emb, n_cells=4).localCheckpoint()
    assigned = ivf_assign(emb, centers).localCheckpoint()
    for nprobe in (4, 2):
        ref = {
            tuple(r)
            for r in _join_path(
                queries, centers, assigned, 5, nprobe, vec_type
            ).collect()
        }
        got = {
            tuple(r)
            for r in ivf_topk_delta(
                queries, centers, assigned, k=5, nprobe=nprobe
            ).collect()
        }
        assert got == ref  # bitwise: cos floats compared exactly


def test_cell_topk_empty_queries(spark):
    emb = _mk_corpus(spark, "float")
    centers = ivf_fit_centroids(emb, n_cells=4).localCheckpoint()
    assigned = ivf_assign(emb, centers).localCheckpoint()
    empty = emb.where(F.lit(False))
    assert ivf_topk_delta(empty, centers, assigned, k=5, nprobe=2).count() == 0


def _bruteforce_join_path(corpus, queries, k):
    """cosine_topk_bruteforce's round-5 implementation, verbatim."""
    from nama_spark.operators.ann import cosine_sim_expr

    q = F.broadcast(queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")))
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    joined = c.crossJoin(q).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        joined.withColumn("cos", cosine_sim_expr(F.col("qv"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rn").alias("rank"))
    )


@pytest.mark.parametrize("vec_type", ["float", "double"])
def test_bruteforce_scan_bitwise_equals_join_path(spark, vec_type):
    from nama_spark.operators.ann import cosine_topk_bruteforce

    emb = _mk_corpus(spark, vec_type, with_dups=True).localCheckpoint()
    queries = emb.where(F.col("vec_id") < 6)
    ref = {tuple(r) for r in _bruteforce_join_path(emb, queries, 5).collect()}
    got = {tuple(r) for r in cosine_topk_bruteforce(emb, queries, k=5).collect()}
    assert got == ref
