"""Embedding pass — deterministic string embeddings, LSH candidates,
threshold clustering, nearest-seed assignment.

The reference embeds strings with a GPU transformer (embedding_model.py:68-101:
tokenizer → RoBERTa → pooling → optional linear projection → L2 normalize);
the projection layer itself is initialized as *random-projection LSH*
(embedding_model.py:40-44). This sandbox has no torch/transformers, and model
training is out of scope (SURVEY.md §2.10), so the embedder here is the same
trick without the transformer: hashed char-ngram counts → seeded Gaussian
random projection → L2 normalize. It preserves the contract the rest of the
engine relies on — unit vectors whose cosine approximates character-level name
similarity — and is fully deterministic (seeded), so tests are reproducible.

Spark realization: one ``mapInPandas`` pass (Arrow batches; the projection
matrix is built once per python worker and cached — no per-row Python at the
Spark layer). Everything downstream (cosine, thresholding, clustering) is
relational or MLlib.

Capabilities mapped (cites against /root/reference):
- ``embed``                → SimilarityModel.embed, similarity_model.py:64-112
- ``score_pairs``          → Embeddings.score_pairs, embeddings.py:517-533
- ``unite_similar`` fast   → _fast_unite_similar, embeddings.py:144-174
  (result = connected components of the ≥-threshold graph)
- ``unite_nearest``        → Embeddings.unite_nearest / voronoi,
  embeddings.py:461-514
- ``lsh_candidates``       → replaces the O(n²) batched matmul scan
  (embeddings.py:301-307) with MLlib BucketedRandomProjectionLSH; for unit
  vectors cos ≥ t ⇔ euclidean ≤ sqrt(2−2t), so the threshold pushes down
  into the LSH join distance.
- save/load                → embeddings.py:45-68, 628-644 (parquet + JSON
  sidecar instead of zip+npy).
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64
DEFAULT_BUCKETS = 1 << 16
DEFAULT_ALPHA = 20.0  # calibration scale (scoring_model.py:11-15 ships alpha)

_PROJ_CACHE: dict = {}


def _projection(seed: int, n_buckets: int, dim: int) -> np.ndarray:
    """Seeded Gaussian projection matrix, cached per python worker."""
    key = (seed, n_buckets, dim)
    if key not in _PROJ_CACHE:
        rng = np.random.RandomState(seed)
        _PROJ_CACHE[key] = rng.normal(0.0, 1.0, size=(n_buckets, dim)).astype(
            np.float32
        ) / math.sqrt(dim)
    return _PROJ_CACHE[key]


def _char_ngram_counts(s: str, n_lo: int, n_hi: int, n_buckets: int) -> dict[int, int]:
    """Stable feature hashing of char n-grams (zlib.crc32 — deterministic
    across processes, unlike PYTHONHASHSEED-dependent hash())."""
    import zlib

    out: dict[int, int] = {}
    padded = f"\x02{s}\x03"  # boundary markers help short names
    for n in range(n_lo, n_hi + 1):
        for i in range(len(padded) - n + 1):
            b = zlib.crc32(padded[i : i + n].encode("utf-8")) % n_buckets
            out[b] = out.get(b, 0) + 1
    return out


def embed_strings(
    strings_df: DataFrame,
    string_col: str = "string",
    count_col: str | None = "count",
    dim: int = DEFAULT_DIM,
    seed: int = 42,
    ngram_range: tuple[int, int] = (2, 3),
    n_buckets: int = DEFAULT_BUCKETS,
    add_upper: bool = True,
    prompt: str = "",
) -> DataFrame:
    """(string, count, vec) with L2-normalized float vectors.

    ``add_upper`` mirrors the reference's case-augmentation (string + SEP +
    upper(string) fed to the encoder, embedding_model.py:55-56); ``prompt``
    mirrors the 'Organization: ' prefix (embedding_model.py:53-54).
    """
    has_count = count_col is not None and count_col in strings_df.columns
    cols = [F.col(string_col).alias("string")] + (
        [F.col(count_col).cast("long").alias("count")] if has_count else []
    )
    src = strings_df.select(*cols)
    if not has_count:
        src = src.groupBy("string").agg(F.count(F.lit(1)).alias("count"))

    n_lo, n_hi = ngram_range
    out_schema = T.StructType(
        [
            T.StructField("string", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("vec", T.ArrayType(T.FloatType())),
        ]
    )

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proj = _projection(seed, n_buckets, dim)
        for pdf in batches:
            vecs = []
            for s in pdf["string"].astype(str):
                text = prompt + s + ("\x1f" + s.upper() if add_upper else "")
                counts = _char_ngram_counts(text, n_lo, n_hi, n_buckets)
                if counts:
                    idx = np.fromiter(counts.keys(), dtype=np.int64, count=len(counts))
                    val = np.fromiter(
                        counts.values(), dtype=np.float32, count=len(counts)
                    )
                    # sublinear tf damping keeps hot grams from dominating
                    val = np.sqrt(val)
                    v = val @ proj[idx]
                    norm = float(np.linalg.norm(v))
                    v = (v / norm if norm > 0 else v).astype(np.float32)
                else:
                    v = np.zeros(dim, dtype=np.float32)
                vecs.append(v.tolist())
            yield pd.DataFrame(
                {"string": pdf["string"], "count": pdf["count"], "vec": vecs}
            )

    return src.mapInPandas(embed_batches, schema=out_schema)


def embed_strings_md5(
    strings_df: DataFrame,
    string_col: str = "string",
    count_col: str | None = "count",
    dim: int = 16,
    ngram_range: tuple[int, int] = (2, 3),
) -> DataFrame:
    """Engine-portable feature-hashing embedder: (string, count, vec) with
    L2-normalized float64 vectors whose math any SQL engine can recompute.

    Same EmbeddingModel.forward contract as ``embed_strings`` (reference
    embedding_model.py:68-101 — encode → pool → L2-normalize) and the same
    ``mapInPandas`` Arrow plumbing, but the hash is md5 instead of a seeded
    Gaussian projection: per char n-gram g of chr(2)+s+chr(3),

        h   = md5(g) hex
        dim = int(h[:4], 16) % D      (= 4th hex digit for D = 16)
        sgn = +1 if int(h[4], 16) is even else -1

    signed gram counts accumulate per dim, then L2-normalize. Deterministic
    with no seed state, and — like the simhash/multimodal sha256 oracles —
    exactly reproducible in DuckDB SQL, which makes pipelines built on it
    fully oracle-checkable end to end (the driver's correctness gate runs the
    identical bit math on the SQL side).
    """
    import hashlib

    has_count = count_col is not None and count_col in strings_df.columns
    cols = [F.col(string_col).alias("string")] + (
        [F.col(count_col).cast("long").alias("count")] if has_count else []
    )
    src = strings_df.select(*cols)
    if not has_count:
        src = src.groupBy("string").agg(F.count(F.lit(1)).alias("count"))

    n_lo, n_hi = ngram_range
    out_schema = T.StructType(
        [
            T.StructField("string", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("vec", T.ArrayType(T.DoubleType())),
        ]
    )

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for s in pdf["string"].astype(str):
                padded = f"\x02{s}\x03"
                acc = np.zeros(dim, dtype=np.float64)
                for n in range(n_lo, n_hi + 1):
                    for i in range(len(padded) - n + 1):
                        h = hashlib.md5(padded[i : i + n].encode("utf-8")).hexdigest()
                        d = int(h[:4], 16) % dim
                        acc[d] += 1.0 if int(h[4], 16) % 2 == 0 else -1.0
                norm = float(np.linalg.norm(acc))
                v = acc / norm if norm > 0 else acc
                vecs.append(v.tolist())
            yield pd.DataFrame(
                {"string": pdf["string"], "count": pdf["count"], "vec": vecs}
            )

    return src.mapInPandas(embed_batches, schema=out_schema)


# ---------- cosine as a column expression (JVM-side, no Python) ----------

def cosine_expr(a, b):
    """Dot product of two array<float> columns — vectors are already unit
    norm, so dot = cosine. Higher-order functions keep it in codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def quantize_vec_expr(vec_col, scale: int = 127):
    """int8-style symmetric quantization of a unit-norm float vector:
    q_i = floor(v_i·scale + 0.5) ∈ [−scale, scale]. floor(x + 0.5) instead
    of round(): identical IEEE doubles round identically in every engine
    (Spark HALF_UP vs DuckDB banker's rounding differ exactly on half-ties;
    floor does not). 4× smaller than float32 on the wire/in state, and
    integer dot products are EXACT — order-free and engine-portable (the
    cross-engine float-summation lesson from calibration_alpha_sweep applied
    to vectors)."""
    return F.transform(
        _as_col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * scale + F.lit(0.5)).cast("long"),
    )


def quantized_cosine_expr(q0, q1):
    """Cosine from quantized vectors: intdot/(‖q0‖·‖q1‖). The three dot
    products are exact integer sums; only the final division/sqrt is float
    (same IEEE result in any engine given the same integers)."""
    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    d = idot(q0, q1)
    n0 = idot(q0, q0)
    n1 = idot(q1, q1)
    return F.when(
        (n0 > 0) & (n1 > 0),
        d / (F.sqrt(n0.cast("double")) * F.sqrt(n1.cast("double"))),
    ).otherwise(F.lit(0.0))


def quantize_embeddings(
    embeddings: DataFrame, vec_col: str = "vec", scale: int = 127
) -> DataFrame:
    """Add a quantized ``qvec`` column (array<long> holding int8-range
    values). At 100 TB the embedding column dominates storage and shuffle
    width: int8 cuts both 4× and quantized re-rank error on unit vectors is
    ~1/scale per component (measured on the test fixture: |cos_q − cos| <
    0.02, top-10 recall ≥ 0.9 — see tests/test_embed.py)."""
    return embeddings.withColumn("qvec", quantize_vec_expr(vec_col, scale))


def _as_col(c):
    return F.col(c) if isinstance(c, str) else c


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    centroids: DataFrame | None = None,
    n_cells: int | None = None,
    keep: str = "low_centroid_sim",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 127,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal over
    an embedding column — assign every vector to its nearest k-means cell,
    form within-cell duplicate groups (connected components over quantized
    cosine ≥ ``threshold`` edges), and keep ONE representative per group:
    the member LEAST similar to its cell centroid (the paper's winning
    policy — boundary members carry more information) or ``keep='min_id'``.

    Returns (``id_col``, cell, cluster_id, centroid_sim_ppm, is_kept) for
    every input vector — a full audit map, filter on ``is_kept`` to dedup.

    ``centroids`` is an injection seam: pass a (cell, centroid) frame for a
    pre-fit / deterministic quantizer (the SQL oracle does), else a sampled
    MLlib k-means fit runs (ann.ivf_fit_centroids).

    Cross-engine exactness: vectors and centroids are int8-quantized, so
    every cosine is integer-dot/sqrt — bit-identical in any engine — and
    the keep election compares identical doubles (the
    calibration_alpha_sweep lesson applied to the whole operator).

    Shape at scale: centroid assignment is a broadcast map-side
    groupBy-max (no window); the candidate join is the IVF cell equi-join
    (never all-pairs); components reuse the shared large-star/small-star CC
    engine; the representative election is two cluster-key aggregations,
    so a pathological giant group never lands in one task's sort."""
    if keep not in ("low_centroid_sim", "min_id"):
        raise ValueError(f"unknown keep policy {keep!r}")
    if centroids is None:
        from .ann import ivf_fit_centroids

        centroids = ivf_fit_centroids(embeddings, n_cells=n_cells, vec_col=vec_col)

    qe = embeddings.select(
        F.col(id_col), quantize_vec_expr(vec_col, scale).alias("q")
    ).localCheckpoint(eager=False)
    qc = F.broadcast(
        centroids.select(
            F.col("cell").cast("int").alias("cell"),
            quantize_vec_expr("centroid", scale).alias("cq"),
        )
    )
    scored = qe.crossJoin(qc).select(
        id_col, "cell", quantized_cosine_expr(F.col("q"), F.col("cq")).alias("csim")
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("csim"), (-F.col("cell")).alias("negcell"))).alias("b")
    )
    assign = best.select(
        id_col,
        (-F.col("b.negcell")).cast("int").alias("cell"),
        F.col("b.csim").alias("csim"),
    ).localCheckpoint(eager=False)

    cells = assign.select(id_col, "cell").join(qe, id_col)
    a = cells.select(
        F.col(id_col).alias("id0"), "cell", F.col("q").alias("q0")
    )
    b = cells.select(
        F.col(id_col).alias("id1"), F.col("cell").alias("cell1"),
        F.col("q").alias("q1"),
    )
    pairs = (
        a.join(b, (a["cell"] == b["cell1"]) & (a["id0"] < b["id1"]))
        .where(quantized_cosine_expr(F.col("q0"), F.col("q1")) >= threshold)
        .select("id0", "id1")
    )

    from .dedup import near_dup_clusters

    clusters = near_dup_clusters(
        pairs, embeddings.select(F.col(id_col)), id_col=id_col
    ).withColumnRenamed("doc_id", id_col)

    memb = clusters.join(assign, id_col)
    if keep == "min_id":
        best_ids = memb.groupBy("cluster_id").agg(F.min(id_col).alias("__k"))
    else:
        mn = memb.groupBy("cluster_id").agg(F.min("csim").alias("csim"))
        best_ids = (
            memb.join(mn, ["cluster_id", "csim"])
            .groupBy("cluster_id")
            .agg(F.min(id_col).alias("__k"))
        )
    return memb.join(best_ids, "cluster_id", "left").select(
        id_col,
        "cell",
        "cluster_id",
        F.floor(F.col("csim") * 1e6 + 0.5).cast("long").alias("centroid_sim_ppm"),
        (F.col(id_col) == F.col("__k")).alias("is_kept"),
    )


def score_pairs(
    pairs: DataFrame,
    embeddings: DataFrame,
    alpha: float = DEFAULT_ALPHA,
    s0: str = "s0",
    s1: str = "s1",
) -> DataFrame:
    """(s0, s1, cos, score) for an explicit pair list (embeddings.py:517-533):
    two equi-joins to fetch vectors + a relational dot + calibration."""
    e0 = embeddings.select(F.col("string").alias(s0), F.col("vec").alias("__v0"))
    e1 = embeddings.select(F.col("string").alias(s1), F.col("vec").alias("__v1"))
    out = pairs.join(e0, s0).join(e1, s1)
    cos = cosine_expr(F.col("__v0"), F.col("__v1"))
    score = F.least(F.lit(1.0), F.exp(-F.lit(alpha) * (F.lit(1.0) - cos)))
    return out.withColumn("cos", cos).withColumn("score", score).drop("__v0", "__v1")


# ---------- candidate generation ----------

def bruteforce_candidates(
    embeddings: DataFrame, cos_threshold: float
) -> DataFrame:
    """All pairs with cos ≥ threshold via an upper-triangular self-join —
    correctness baseline for small universes and tests. O(n²): do not use at
    scale (that is what the reference's batched matmul does,
    embeddings.py:301-307; LSH replaces it)."""
    a = embeddings.select(F.col("string").alias("s0"), F.col("vec").alias("v0"))
    b = embeddings.select(F.col("string").alias("s1"), F.col("vec").alias("v1"))
    pairs = a.join(b, F.col("s0") < F.col("s1"))
    cos = cosine_expr(F.col("v0"), F.col("v1"))
    return (
        pairs.withColumn("cos", cos)
        .where(F.col("cos") >= cos_threshold)
        .select("s0", "s1", "cos")
    )


def lsh_candidates(
    embeddings: DataFrame,
    cos_threshold: float,
    num_hash_tables: int = 8,
    bucket_length: float = 0.25,
    seed: int = 42,
) -> DataFrame:
    """Approximate ≥-threshold pairs via MLlib BucketedRandomProjectionLSH.

    Unit vectors: cos ≥ t ⇔ ‖a−b‖ ≤ sqrt(2−2t) — the cosine threshold becomes
    the LSH join's euclidean distance threshold (threshold pushdown, same idea
    as score_to_cos at embeddings.py:147), and the join's own distance column
    converts back exactly: cos = 1 − d²/2. No second join, no recompute.

    bucket_length is deliberately small (~0.25 for unit vectors, where the
    1-d projections have std ≈ 1): oversized buckets degenerate the hash join
    toward the O(n²) scan (measured: 0.7 → 375 s vs 0.25 → 20 s at 12k
    vectors, both 100% recall at cos ≥ 0.8).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    if embeddings.isEmpty():
        # LSH fit() throws on an empty dataset; an empty universe/delta is a
        # routine input at scale
        return embeddings.select(
            F.col("string").alias("s0"),
            F.col("string").alias("s1"),
            F.lit(0.0).alias("cos"),
        ).where(F.lit(False))

    dist = math.sqrt(max(0.0, 2.0 - 2.0 * cos_threshold))
    feat = embeddings.select(
        "string", array_to_vector(F.col("vec").cast("array<double>")).alias("features")
    )
    # The self-join references `feat` on both sides (plus fit): without
    # materialization the upstream embed (a mapInPandas) is recomputed per
    # reference — measured 467 s vs 41 s at 12k vectors. localCheckpoint
    # truncates the plan once and lets the join reuse the blocks.
    feat = feat.localCheckpoint(eager=False)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        bucketLength=bucket_length,
        seed=seed,
    )
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, dist, distCol="euclid")
    return (
        joined.select(
            F.col("datasetA.string").alias("s0"),
            F.col("datasetB.string").alias("s1"),
            (F.lit(1.0) - F.col("euclid") * F.col("euclid") / F.lit(2.0)).alias("cos"),
        )
        .where((F.col("s0") < F.col("s1")) & (F.col("cos") >= cos_threshold))
    )


def _split_hot_cells(
    assigned: DataFrame,
    max_cell_rows: int,
    sample_per_cell: int = 50,
    max_iter: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Secondary split for IVF cells holding more than ``max_cell_rows``
    members (k-means cells are not size-balanced; a dominant embedding mode
    concentrates in one cell whose self-join is O(m²)). Per hot cell, fit
    ceil(m/max_cell_rows) sub-centroids on a bounded deterministic sample
    (one applyInPandas pass over all hot cells at once), then re-assign the
    hot members through a broadcast join + a skinny (cell, string, sub, d2)
    window — never a per-cell driver loop, never a wide shuffle. Sub-cell
    ids pack into the low 20 bits of the cell key, so the downstream
    equi-join is unchanged. Cold cells pass through untouched."""
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("__cn"))
    hot = sizes.where(F.col("__cn") > max_cell_rows).localCheckpoint(eager=False)
    if hot.isEmpty():
        return assigned
    cold = assigned.join(F.broadcast(hot.select("cell")), "cell", "left_anti")
    members = assigned.join(F.broadcast(hot), "cell")
    k_sub = F.ceil(F.col("__cn") / F.lit(max_cell_rows)).cast("int")
    # deterministic per-row uniform for the fit sample: ~sample_per_cell·k
    # rows per hot cell regardless of cell size
    u = F.pmod(F.xxhash64("cell", "string"), F.lit(1 << 20)) / F.lit(float(1 << 20))
    samp = members.withColumn("__k", k_sub).where(
        u < F.least(
            F.lit(1.0),
            F.lit(float(sample_per_cell)) * F.col("__k") / F.col("__cn"),
        )
    ).select("cell", "vec", "__k")

    mi, sd = max_iter, seed

    def fit_sub(pdf: pd.DataFrame) -> pd.DataFrame:
        from nama_spark.operators.ann import _np_kmeans

        cell = int(pdf["cell"].iloc[0])
        X = np.stack(pdf["vec"].to_numpy()).astype(float)
        rng = np.random.RandomState(sd + cell)
        centers = _np_kmeans(X, int(pdf["__k"].iloc[0]), rng, max_iter=mi)
        return pd.DataFrame({
            "cell": cell,
            "sub": range(len(centers)),
            "scentroid": [list(map(float, c)) for c in centers],
        })

    schema = T.StructType([
        T.StructField("cell", T.LongType()),
        T.StructField("sub", T.IntegerType()),
        T.StructField("scentroid", T.ArrayType(T.DoubleType())),
    ])
    sub_centers = samp.groupBy("cell").applyInPandas(fit_sub, schema)
    d2 = F.aggregate(
        F.zip_with(
            F.col("vec").cast("array<double>"), F.col("scentroid"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("cell", "string").orderBy(
        F.col("d2").asc(), F.col("sub").asc()
    )
    picked = (
        members.select("cell", "string", "vec")
        .join(F.broadcast(sub_centers), "cell")
        .withColumn("d2", d2)
        .select("cell", "string", "sub", "d2")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("cell", "string", "sub")
    )
    hot_split = (
        picked.join(members.select("cell", "string", "vec"), ["cell", "string"])
        .select(
            (F.col("cell") * F.lit(1 << 20) + 1 + F.col("sub")).alias("cell"),
            "string",
            "vec",
        )
    )
    # cold keys shift into the same packed space (sub slot 0) so a cold
    # cell id can never collide with a hot cell's sub-cell id
    cold = cold.select(
        (F.col("cell") * F.lit(1 << 20)).alias("cell"), "string", "vec"
    )
    return cold.unionByName(hot_split)


def ivf_candidates(
    embeddings: DataFrame,
    cos_threshold: float,
    n_cells: int | None = None,
    nprobe: int = 2,
    sample_per_cell: int = 50,
    max_iter: int = 10,
    seed: int = 42,
    max_cells: int = 4096,
    two_level: bool | None = None,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """Approximate ≥-threshold pairs via IVF cells — the density-robust
    scale path for the embedding threshold join.

    Why not BRP-LSH at scale: MLlib's single-probe approxSimilarityJoin
    cost tracks per-bucket occupancy, which grows linearly with corpus
    density at fixed bucket_length (join work ~ n²·bucket_length for the
    1-d projections). Measured on the bench fixture: a 10× corpus at
    bucket_length 0.25 went 4.7 s → 267 s (57× for 10× data); shrinking
    buckets restores linearity but collapses recall, because a near pair
    must share an EXACT bucket in some table (no multi-probe in MLlib).

    IVF instead partitions the SPACE: k-means cells fit on a sample
    (``sample_per_cell``·n_cells rows), every vector joins its ``nprobe``
    nearest cells, candidate pairs meet inside shared cells (equi-join on
    cell id), and the exact cosine filters. With ``n_cells`` ~ n/400
    (auto), expected cell occupancy is constant, so join cost is ~
    n·nprobe²·occupancy — linear in n at fixed density. Recall < 1 (a pair
    whose members share no probed cell is missed) and is measured, not
    assumed: see SCALE.md §embedding-joins and the ivf row in bench.py.

    Centroid assignment is a broadcast cross-join (n·n_cells distance
    exprs, JVM-side) + a per-string top-nprobe window; past ``max_cells``
    (default 4096, where the flat cross-join stops paying) the TWO-LEVEL
    coarse quantizer takes over automatically (``two_level=None``): coarse
    k-means over √total cells, an independent fine k-means inside each
    coarse cell (ann.ivf2_fit_centroids), and a two-stage assignment that
    probes n_coarse + nprobe_coarse·fine_per_coarse centroids per vector —
    occupancy stays at ~400 for any n instead of growing linearly past
    ~1.6M vectors. ``two_level=True`` forces it (tests / tuning).

    Skew note: k-means cells are not size-balanced — a corpus with one
    dominant mode can produce a hot cell whose per-cell join is O(m²).
    AQE's skew-join split shares that cell's join across tasks (the join is
    a plain equi-join on cell, so the runtime split applies). For a cell
    that exceeds memory-per-task, ``max_cell_rows`` pre-splits every cell
    holding more rows than the cap with a SECONDARY k-means over that
    cell's members (sub-centroids fit on a bounded per-cell sample via one
    applyInPandas pass, members re-assigned through a broadcast join + a
    skinny (cell, string, sub, d2) window — the equi-join shape is
    unchanged, only the key gains sub-cell bits). Pairs falling across
    sub-cells of a split cell are missed like any cross-cell pair; recall
    is measured, not assumed (test_skew.py::test_hot_cell_secondary_split).
    """
    if embeddings.isEmpty():
        return embeddings.select(
            F.col("string").alias("s0"),
            F.col("string").alias("s1"),
            F.lit(0.0).alias("cos"),
        ).where(F.lit(False))

    feat = embeddings.select("string", "vec").localCheckpoint(eager=False)
    n = feat.count()
    want_cells = n_cells if n_cells is not None else max(8, min(n // 400, max_cells))
    if two_level is None:
        two_level = max(8, n // 400) > max_cells if n_cells is None else False

    if two_level:
        import math as _math

        from nama_spark.operators.ann import _ivf2_assign, ivf2_fit_centroids

        total = n_cells if n_cells is not None else max(8, n // 400)
        n_coarse = max(2, _math.ceil(_math.sqrt(total)))
        centers_df = ivf2_fit_centroids(
            feat, n_coarse=n_coarse,
            fine_per_coarse=max(1, _math.ceil(total / n_coarse)),
            sample_per_cell=sample_per_cell, max_iter=max_iter,
            vec_col="vec", seed=seed,
        ).localCheckpoint(eager=False)
        assigned = _ivf2_assign(
            feat, centers_df, nprobe, id_col="string", vec_col="vec"
        )
    else:
        from nama_spark.operators.ann import ivf_fit_centroids

        n_cells = min(want_cells, n)
        nprobe = min(nprobe, n_cells)
        # shared fit (round 6): ivf_fit_centroids carries the bounded-sample
        # driver numpy Lloyd fast path — at bench cell counts the MLlib fit
        # was ~20 scheduled jobs of pure latency (measured 1.6-2.1 s vs
        # ~50 ms) — and the distributed MLlib fit past the gate.
        centers_df = ivf_fit_centroids(
            feat, n_cells=n_cells, sample_per_cell=sample_per_cell,
            max_iter=max_iter, vec_col="vec", seed=seed,
        )
        d2 = F.aggregate(
            F.zip_with(
                F.col("vec").cast("array<double>"), F.col("centroid"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        from pyspark.sql import Window

        # top-nprobe cells per vector: drop the 64-float vec BEFORE the
        # window — the n·n_cells rows that shuffle for row_number carry only
        # (string, cell, d2), and the vector rejoins by string afterwards
        # (n·nprobe rows). Measured at 30k vectors / 75 cells: 19.7 s → ~3 s.
        w = Window.partitionBy("string").orderBy(F.col("d2").asc(), F.col("cell").asc())
        cand_cells = (
            feat.crossJoin(F.broadcast(centers_df))
            .withColumn("d2", d2)
            .select("string", "cell", "d2")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= nprobe)
            .select("string", "cell")
        )
        assigned = cand_cells.join(feat, "string").select("cell", "string", "vec")

    assigned = assigned.select(
        F.col("cell").cast("long").alias("cell"), "string", "vec"
    )
    if max_cell_rows is not None:
        assigned = _split_hot_cells(
            assigned, max_cell_rows, sample_per_cell=sample_per_cell,
            max_iter=max_iter, seed=seed,
        )
    # Per-cell pair stage (round 6, guide §4.2): one applyInPandas over the
    # cell groups computes all within-cell cosines as TILED numpy float64
    # matmuls (BLAS) and emits only the ≥-threshold survivors — the old
    # within-cell self-join evaluated the zip_with/aggregate cosine once
    # per candidate pair in the JVM's interpreted higher-order-function
    # path (~10 µs/pair; measured 7-9 s for the 2.2M pairs of the sf0.1
    # embed workload vs <1 s here). Tiling bounds memory at B² doubles per
    # score block; per-cell memory is bounded by design (the ~400-row
    # occupancy target — pre-split genuinely hot cells via max_cell_rows).
    # Rows are sorted by string inside each cell so the emitted (s0 < s1)
    # orientation matches the old join's string comparison; a pair met in
    # two probed cells still collapses in the cross-cell dedupe.
    t = float(cos_threshold)
    out_schema = T.StructType(
        [
            T.StructField("s0", T.StringType()),
            T.StructField("s1", T.StringType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        strs = pdf["string"].to_numpy()
        order = np.argsort(strs)
        strs = strs[order]
        X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["vec"].to_numpy()[order]]
        )
        m = len(strs)
        o0: list = []
        o1: list = []
        oc: list = []
        B = 2048
        for i0 in range(0, m, B):
            Xi = X[i0:i0 + B]
            for j0 in range(i0, m, B):
                S = Xi @ X[j0:j0 + B].T
                mask = S >= t
                if i0 == j0:
                    mask = np.triu(mask, 1)
                ii, jj = np.nonzero(mask)
                if len(ii):
                    o0.extend(strs[i0 + ii])
                    o1.extend(strs[j0 + jj])
                    oc.extend(float(x) for x in S[ii, jj])
        return pd.DataFrame({"s0": o0, "s1": o1, "cos": oc})

    return (
        assigned.groupBy("cell")
        .applyInPandas(cell_pairs, out_schema)
        .dropDuplicates(["s0", "s1"])
    )


def iter_scores(
    matchdata,
    embeddings: DataFrame,
    alpha: float = DEFAULT_ALPHA,
    is_match: bool | None = None,
    min_score: float | None = None,
    max_score: float | None = None,
    min_loss: float | None = None,
    max_loss: float | None = None,
    use_count_weights: bool = True,
    candidate_mode: str = "bruteforce",
    **lsh_kwargs,
) -> DataFrame:
    """Scored pair stream — the reference's ``iter_scores``/``_batch_scores``
    assembled as one relational operator (embeddings.py:536-625).

    Every pair (string0 < string1) of the embedding universe, with the two
    strings' current group labels from ``matchdata``, calibrated score
    p = exp(−α(1−cos)) and the scoring model's XE loss (count^0.5 pair
    weights by default — SimilarityModel's ExponentWeights,
    similarity_model.py:23-28). Filters mirror the reference kwargs:
    is_match / min_score / max_score / min_loss / max_loss.

    Scale: ``min_score`` pushes down to the candidate join
    (cos ≥ score_to_cos(min_score)); without it the scan is the full upper
    triangle — the reference's own review-everything semantics, for
    review-scale universes only.
    """
    from nama_spark.operators.score import (
        calibrated_score,
        score_to_cos,
        similarity_loss,
    )

    cos_t = score_to_cos(min_score, alpha) if min_score is not None else -99.0
    if candidate_mode == "bruteforce":
        if min_score is None:
            import warnings

            warnings.warn(
                "iter_scores(candidate_mode='bruteforce') with no min_score "
                "scans the FULL upper triangle (O(n²) self-join) — the "
                "reference's review-everything semantics, for review-scale "
                "universes only. Pass min_score to push a cosine threshold "
                "into the candidate join, or candidate_mode='lsh' at scale."
            )
        cand = bruteforce_candidates(embeddings, cos_t)
    elif candidate_mode == "ivf":
        cand = ivf_candidates(embeddings, cos_t, **lsh_kwargs)
    else:
        cand = lsh_candidates(embeddings, cos_t, **lsh_kwargs)

    g = matchdata.df.select("string", "group", "count")
    out = (
        cand.join(
            g.select(
                F.col("string").alias("s0"),
                F.col("group").alias("group0"),
                F.col("count").alias("__c0"),
            ),
            "s0",
        ).join(
            g.select(
                F.col("string").alias("s1"),
                F.col("group").alias("group1"),
                F.col("count").alias("__c1"),
            ),
            "s1",
        )
    )
    y = (F.col("group0") == F.col("group1")).cast("double")
    w = (
        F.pow(F.col("__c0"), 0.5) * F.pow(F.col("__c1"), 0.5)
        if use_count_weights
        else None
    )
    out = (
        out.withColumn("score", calibrated_score(F.col("cos"), alpha))
        .withColumn("loss", similarity_loss(F.col("cos"), y, alpha, weights=w))
        .withColumn("is_match", F.col("group0") == F.col("group1"))
    )
    if is_match is not None:
        out = out.where(F.col("is_match") == bool(is_match))
    if min_score is not None:
        out = out.where(F.col("score") >= min_score)
    if max_score is not None:
        out = out.where(F.col("score") <= max_score)
    if min_loss is not None:
        out = out.where(F.col("loss") >= min_loss)
    if max_loss is not None:
        out = out.where(F.col("loss") <= max_loss)
    return out.select(
        F.col("s0").alias("string0"),
        F.col("s1").alias("string1"),
        "group0",
        "group1",
        "cos",
        "score",
        "loss",
        "is_match",
    )


# ---------- clustering ----------

def unite_similar(
    matchdata,
    embeddings: DataFrame,
    threshold: float = 0.5,
    alpha: float = DEFAULT_ALPHA,
    candidate_mode: str = "lsh",
    **lsh_kwargs,
):
    """Fast-path unite_similar (embeddings.py:144-174): unite all pairs whose
    calibrated score ≥ threshold; the result is the connected components of
    that graph merged into the current partition. ``threshold`` is a
    probability; it is pushed down to a raw cosine before candidate
    generation (scoring_model.py:48-52)."""
    from nama_spark.operators.cluster import labels_for_nodes
    from nama_spark.operators.matchdata import MatchData

    cos_t = 1.0 + math.log(threshold) / alpha if threshold > 0 else -99.0
    if candidate_mode == "bruteforce":
        cand = bruteforce_candidates(embeddings, cos_t)
    elif candidate_mode == "ivf":
        cand = ivf_candidates(embeddings, cos_t, **lsh_kwargs)
    else:
        cand = lsh_candidates(embeddings, cos_t, **lsh_kwargs)
    edges = cand.select(F.col("s0").alias("src"), F.col("s1").alias("dst"))
    own = matchdata.df.select(
        F.col("string").alias("src"), F.col("group").alias("dst")
    )
    labels = labels_for_nodes(
        matchdata.df.select("string"), edges.union(own), node_col="string"
    )
    out = (
        matchdata.df.drop("group")
        .join(labels, matchdata.df["string"] == labels["node"])
        .select("string", "count", F.col("component").alias("group"))
    )
    return MatchData(out)


def unite_nearest(
    matchdata,
    embeddings: DataFrame,
    seed_strings: list[str] | DataFrame,
    threshold: float = 0.0,
    alpha: float = DEFAULT_ALPHA,
):
    """Voronoi assignment (embeddings.py:461-514): each string joins the
    group of its nearest seed string if calibrated score ≥ threshold. Seeds
    are small → broadcast cross join + top-1 window."""
    from nama_spark.operators.matchdata import MatchData

    spark = embeddings.sparkSession
    if not isinstance(seed_strings, DataFrame):
        seeds = spark.createDataFrame([(s,) for s in seed_strings], ["seed"])
    else:
        seeds = seed_strings.select(F.col(seed_strings.columns[0]).alias("seed"))
    seed_vecs = seeds.join(
        embeddings.select(F.col("string").alias("seed"), F.col("vec").alias("svec")),
        "seed",
    )
    cand = embeddings.select("string", "vec").crossJoin(F.broadcast(seed_vecs))
    cos = cosine_expr(F.col("vec"), F.col("svec"))
    score = F.least(F.lit(1.0), F.exp(-F.lit(alpha) * (F.lit(1.0) - cos)))
    w = Window.partitionBy("string").orderBy(F.col("cos").desc(), F.col("seed").asc())
    best = (
        cand.withColumn("cos", cos)
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("score") >= threshold))
        .select("string", "seed")
    )
    out = (
        matchdata.df.join(best, "string", "left")
        .withColumn("group", F.coalesce(F.col("seed"), F.col("string")))
        .drop("seed")
    )
    return MatchData(out)


def slice_embeddings(embeddings: DataFrame, strings) -> DataFrame:
    """Subset an Embeddings table to the given strings (Embeddings.__getitem__,
    embeddings.py:70-96) — a semi-join."""
    spark = embeddings.sparkSession
    if isinstance(strings, DataFrame):
        keys = strings.select(F.col(strings.columns[0]).alias("string"))
    else:
        keys = spark.createDataFrame([(s,) for s in strings], ["string"])
    return embeddings.join(keys.distinct(), "string", "left_semi")


def reweight_embeddings(embeddings: DataFrame, matchdata_df: DataFrame) -> DataFrame:
    """Re-weight an Embeddings with counts from a MatchData
    (Embeddings.embed(matches), embeddings.py:98-106): join on string, take
    the MatchData's counts. The w = count**0.5 importance weights
    (similarity_model.py:23-28) are derived downstream as pow(count, 0.5)."""
    counts = matchdata_df.select("string", F.col("count").alias("__new_count"))
    return (
        embeddings.join(counts, "string")
        .select("string", F.col("__new_count").alias("count"), "vec")
    )


# ---------- persistence (embeddings.py:45-68, 628-644) ----------

def save_embeddings(embeddings: DataFrame, path: str, alpha: float = DEFAULT_ALPHA,
                    meta: dict | None = None) -> None:
    embeddings.write.mode("overwrite").parquet(os.path.join(path, "vectors.parquet"))
    sidecar = {"alpha": alpha, **(meta or {})}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(sidecar, f)


def load_embeddings(spark, path: str) -> tuple[DataFrame, dict]:
    df = spark.read.parquet(os.path.join(path, "vectors.parquet"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return df, meta
