"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce``: exact top-k neighbors per query — the
  correctness baseline. Self-join + window; broadcast the query side when it
  is small. O(|queries|·|corpus|): for scale use the bucketed variants.
- ``lsh_topk``: BucketedRandomProjectionLSH-bucketed approximate top-k (the
  scale path — candidates come from an equi-join on hash buckets).
- ``ivf_topk``: IVF-style coarse quantization: k-means centroids (MLlib),
  probe the nprobe nearest cells per query, exact re-rank inside the cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nama_spark.operators.embed import cosine_expr


def _norm(vec_col):
    return F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )


def cosine_sim_expr(a, b):
    """Cosine for not-necessarily-normalized vectors."""
    dot = cosine_expr(a, b)
    return dot / (_norm(a) * _norm(b))


def _empty_topk(df: DataFrame, id_col: str) -> DataFrame:
    """Zero-row (query_id, neighbor_id, cos, rank) frame with the id type
    taken from the input — MLlib fit() (LSH planes, k-means) throws on an
    empty dataset, and an empty corpus/delta is routine at scale, so the
    fit-based variants short-circuit to this."""
    return (
        df.select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("cos"),
            F.lit(0).alias("rank"),
        )
        .where(F.lit(False))
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, cos) — exact top-k cosine neighbors, excluding
    self-matches. Deterministic tie-break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    joined = c.crossJoin(q).where(F.col("query_id") != F.col("neighbor_id"))
    cos = cosine_sim_expr(F.col("qv"), F.col("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rn").alias("rank"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_hash_tables: int = 8,
    bucket_length: float = 2.0,
    max_distance: float = 10.0,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via LSH candidate join + exact cosine re-rank."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    if corpus.isEmpty() or queries.isEmpty():
        return _empty_topk(corpus, id_col)

    feat_c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    feat_q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=num_hash_tables, bucketLength=bucket_length, seed=seed,
    )
    model = lsh.fit(feat_c)
    joined = model.approxSimilarityJoin(feat_q, feat_c, max_distance, distCol="euclid")
    pairs = joined.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetA.qv").alias("qv"),
        F.col("datasetB.neighbor_id").alias("neighbor_id"),
        F.col("datasetB.cv").alias("cv"),
    ).where(F.col("query_id") != F.col("neighbor_id"))
    cos = cosine_sim_expr(F.col("qv"), F.col("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rn").alias("rank"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF: cluster the corpus into n_cells (k-means), assign each vector to
    its cell; per query probe the nprobe nearest centroids and re-rank
    exactly inside those cells. Candidate join is equi on cell id."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    n_corpus = corpus.count()
    if n_corpus == 0 or queries.isEmpty():
        return _empty_topk(corpus, id_col)
    # k-means requires k ≤ points; a small delta/partition must still work
    n_cells = min(n_cells, n_corpus)

    feat = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(feat)
    assigned = model.transform(feat).select("neighbor_id", "cv", "cell")

    centers = model.clusterCenters()
    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        ["cell", "centroid"],
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    qc = q.crossJoin(F.broadcast(centers_df))
    dist2 = F.aggregate(
        F.zip_with(
            F.col("qv").cast("array<double>"), F.col("centroid"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("cell").asc())
    probes = (
        qc.withColumn("d2", dist2)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    cand = probes.join(assigned, "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = cosine_sim_expr(F.col("qv"), F.col("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rn").alias("rank"))
    )


# ---------- persisted-index IVF (index once, delta daily) ----------

def ivf_fit_centroids(
    corpus: DataFrame,
    n_cells: int | None = None,
    sample_per_cell: int = 50,
    max_iter: int = 10,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(cell, centroid) — k-means centroids fit on a bounded sample
    (``sample_per_cell``·n_cells rows), the persistable half of an IVF
    index. ``n_cells`` auto-sizes to ~n/400 (capped 4096 — past that use a
    two-level coarse quantizer, same shape). Fit once, write to parquet,
    reuse across daily deltas: arriving vectors only need ``ivf_assign``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n = corpus.count()
    if n == 0:
        raise ValueError("cannot fit IVF centroids on an empty corpus")
    if n_cells is None:
        n_cells = max(8, min(n // 400, 4096))
    n_cells = min(n_cells, n)
    fit_frac = min(1.0, (sample_per_cell * n_cells) / n)
    fit_df = corpus.sample(fraction=fit_frac, seed=seed) if fit_frac < 1.0 else corpus
    fit_feat = fit_df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    ).localCheckpoint(eager=False)
    n_cells = max(1, min(n_cells, fit_feat.count()))
    model = KMeans(
        k=n_cells, seed=seed, maxIter=max_iter,
        featuresCol="features", predictionCol="cell",
    ).fit(fit_feat)
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        ["cell", "centroid"],
    )


def ivf_assign(
    df: DataFrame,
    centers: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cell, <id_col>, <vec_col>) — each vector assigned to its ``nprobe``
    nearest centroids. Broadcast cross-join on the (small) centroid table;
    the top-nprobe window sees only skinny (id, cell, d2) rows (the
    ivf_candidates lesson: keep the 64-float payload out of the exchange).
    O(Δn·n_cells) per delta — the corpus is never re-read."""
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"), F.col("centroid"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy(id_col).orderBy(F.col("d2").asc(), F.col("cell").asc())
    cells = (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(centers))
        .withColumn("d2", d2)
        .select(id_col, "cell", "d2")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= nprobe)
        .select(id_col, "cell")
    )
    return cells.join(df.select(id_col, vec_col), id_col).select(
        "cell", id_col, vec_col
    )


def ivf_topk_delta(
    queries: DataFrame,
    centers: DataFrame,
    assigned: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k per query against a PERSISTED IVF index (``centers`` +
    ``assigned``, as built by ivf_fit_centroids/ivf_assign): probe the
    nprobe nearest cells, exact cosine re-rank inside them. A query batch
    of Δq rows costs O(Δq·n_cells) assignment + the probed-cell join —
    the indexed corpus is touched only through its cell partitions.
    ``nprobe = n_cells`` probes everything: exact top-k (the test anchor).
    Same output contract as ivf_topk: (query_id, neighbor_id, cos, rank)."""
    if queries.isEmpty():
        return _empty_topk(queries, id_col)
    probes = ivf_assign(queries, centers, nprobe=nprobe,
                        id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"), F.col("cell"),
        F.col(vec_col).alias("qv"),
    )
    cand = probes.join(
        assigned.select(
            "cell", F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
        ),
        "cell",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    cos = cosine_sim_expr(F.col("qv"), F.col("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("cos", cos)
        .select("query_id", "neighbor_id", "cos")  # drop vectors pre-shuffle
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rn").alias("rank"))
    )
