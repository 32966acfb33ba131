"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "candidate_pairs_per_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, ...}

The headline metric is candidate-pairs/sec through the full blocking +
scoring path (the north-rule throughput number). Per-query wall times cover
the rest of the operator surface. For N-vs-4N scaling evidence run
tools/bench_scaling.py (local[8] vs local[32]).

Known benign stderr noise (so a captured tail is explainable):

- ``ERROR DAGScheduler: Failed to update accumulator N (Unknown class) …
  attempted to access non-existent accumulator`` — a burst of these can
  appear during the approxSimilarityJoin region (ann_lsh / embed_lsh):
  when AQE finalizes/cancels a materializing exchange stage, the
  completion events of that stage's already-running tasks land after the
  job's SQLMetrics accumulators were cleaned, and the DAGScheduler logs
  the late update and moves on (scheduler-side race on CLEANED metrics,
  not a task failure). Nondeterministic — isolated reruns of the same
  query are usually clean; results and exit code are unaffected.
- ``BrokenPipeError`` from ``pyspark/daemon.py`` — the JVM reaping idle
  Python daemon workers between Arrow stages; teardown noise only.
- ``WARN BlockManager: Block rdd_N already exists`` — benign local-mode
  cache re-registration under repeated timed regions.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import reduce

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def bench_pipeline_er(spark, sf_dir, n_entities):
    """Full ER pipeline over a fixture name universe sized to the SF.
    Returns (wall_sec, extras)."""
    from fixtures.make_fixtures import fixture_dataframes, make_fixture
    from nama_spark.plans.pipeline import ExactKeyPass, MatchPipeline, TokenSimPass

    fx = make_fixture(seed=42, n_entities=n_entities, max_files=3)
    records, _, _ = fixture_dataframes(spark, fx)
    records = records.cache()
    records.count()  # exclude generation from the timed region
    t0 = time.time()
    pipe = MatchPipeline(passes=[ExactKeyPass(), TokenSimPass(threshold=0.7)])
    md, _ = pipe.run(records, string_col="repo")
    n_groups = md.df.select("group").distinct().count()
    wall = time.time() - t0
    records.unpersist()
    return wall, {"er_strings": len(fx.gold), "er_groups": n_groups}


def bench_candidate_scoring(spark, sf_dir, n_entities):
    """Blocking + relational jaccard scoring — the candidate-pairs/sec path."""
    from fixtures.make_fixtures import fixture_dataframes, make_fixture
    from nama_spark.functions.normalize import simplify_corp
    from nama_spark.operators.token_similarity import TokenSimilarity
    from pyspark.sql import functions as F

    fx = make_fixture(seed=7, n_entities=n_entities, max_files=3)
    records, _, _ = fixture_dataframes(spark, fx)
    names = records.select(simplify_corp(F.col("repo")).alias("string")).distinct()
    names = names.cache()
    names.count()
    cap = int(os.environ.get("SPARK_GRAFT_BLOCK_CAP", "100"))
    # fit-once / predict-many (the reference's own pattern, baseline.py:53-57):
    # tokens+weights are cached by fit and shared across threshold sweeps, so
    # the timed region is candidate generation + scoring
    ts = TokenSimilarity(max_block_size=cap).fit(names)
    ts._tokens.count()
    ts._weights.count()
    t0 = time.time()
    n_pairs = ts.pair_scores().count()
    wall = time.time() - t0
    names.unpersist()
    return wall, {"candidate_pairs": n_pairs}


def bench_full_scoring(spark, sf_dir, n_entities):
    """Full scoring stack over materialized candidate pairs: relational
    weighted-jaccard + built-in Levenshtein + Arrow-batched Jaro-Winkler
    (the north rule's fallback signals). Pairs are cached first, so the
    timed region is pure per-pair scoring."""
    from fixtures.make_fixtures import fixture_dataframes, make_fixture
    from nama_spark.functions.normalize import simplify_corp
    from nama_spark.operators.score import add_fallback_scores, combine_scores
    from nama_spark.operators.token_similarity import TokenSimilarity
    from pyspark.sql import functions as F

    fx = make_fixture(seed=7, n_entities=n_entities, max_files=3)
    records, _, _ = fixture_dataframes(spark, fx)
    names = records.select(simplify_corp(F.col("repo")).alias("string")).distinct()
    cap = int(os.environ.get("SPARK_GRAFT_BLOCK_CAP", "100"))
    from nama_spark.operators.score import token_similarity_scores_map

    ts = TokenSimilarity(max_block_size=cap).fit(names)
    ts._tokens.count()
    ts._weights.count()
    pairs = ts.candidate_pairs().repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions"))
    ).cache()
    n_pairs = pairs.count()
    t0 = time.time()
    scored = token_similarity_scores_map(pairs, ts._tokens, ts._weights)
    scored = add_fallback_scores(scored)
    scored = scored.withColumn(
        "combined",
        combine_scores(
            F.col("score"), F.col("jaro_winkler"), F.col("levenshtein_sim"),
            weights=(0.6, 0.25, 0.15),
        ),
    )
    row = scored.agg(
        F.count(F.lit(1)).alias("n"), F.sum("combined").alias("s")
    ).collect()[0]
    wall = time.time() - t0
    pairs.unpersist()
    return wall, {"scored_pairs": int(row["n"])}


def bench_cc_synth(spark, sf_dir, n_nodes=None, n_edges=None):
    """Distributed CC over a synthetic random graph — sized so the iterative
    large-star/small-star shuffles dominate scheduling latency (the fixture
    edge sets are too small to measure CC scaling honestly)."""
    from nama_spark.operators.cluster import connected_components
    from pyspark.sql import functions as F

    n_nodes = n_nodes or int(os.environ.get("SPARK_GRAFT_CC_NODES", "2000000"))
    n_edges = n_edges or int(os.environ.get("SPARK_GRAFT_CC_EDGES", "4000000"))

    edges = (
        spark.range(n_edges)
        .select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64(F.col("id") + F.lit(10_000_019)), F.lit(n_nodes)).alias("dst"),
        )
        .cache()
    )
    edges.count()
    t0 = time.time()
    n_comp = connected_components(edges).select("component").distinct().count()
    wall = time.time() - t0
    edges.unpersist()
    return wall, {"cc_synth_components": n_comp}


def _docs_scaled(spark, sf_dir):
    """documents, replicated SPARK_GRAFT_DOC_MULT times with shifted ids.

    Default (duplicate-heavy): replicas keep the original text, so every
    replica group is an exact-duplicate cluster — pair count grows
    quadratically in mult. That is the REPRESENTATIVE web-dedup workload
    (massive duplication is why LSH dedup exists) and makes the verify join
    the dominant, parallel stage. SPARK_GRAFT_DOC_SALT=1 instead salts every
    word per replica (r<i><word>) so replicas share no shingles — linear
    scale-up for measuring the signature/shingle stages alone."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mult = int(os.environ.get("SPARK_GRAFT_DOC_MULT", "1"))
    salt = os.environ.get("SPARK_GRAFT_DOC_SALT") == "1"
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if mult <= 1:
        # pre-exchange compute (shingle explode + md5) parallelizes only as
        # far as the input partitioning — spread the small parquet out
        return docs.repartition(n_parts)
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            (
                F.regexp_replace(F.col("text"), r"(^|\s)", f"$1r{i}")
                if salt
                else F.col("text")
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.repartition(n_parts)


def bench_cc(spark, sf_dir, n_entities):
    """Connected components over the ≥-threshold edges."""
    from fixtures.make_fixtures import fixture_dataframes, make_fixture
    from nama_spark.functions.normalize import simplify_corp
    from nama_spark.operators.cluster import connected_components
    from nama_spark.operators.token_similarity import TokenSimilarity
    from pyspark.sql import functions as F

    fx = make_fixture(seed=7, n_entities=n_entities, max_files=3)
    records, _, _ = fixture_dataframes(spark, fx)
    names = records.select(simplify_corp(F.col("repo")).alias("string")).distinct()
    ts = TokenSimilarity().fit(names)
    edges = (
        ts.pair_scores()
        .where(F.col("score") >= 0.5)
        .select(F.col("s0").alias("src"), F.col("s1").alias("dst"))
        .cache()
    )
    n_edges = edges.count()
    t0 = time.time()
    n_comp = connected_components(edges).select("component").distinct().count()
    wall = time.time() - t0
    edges.unpersist()
    return wall, {"cc_edges": n_edges, "cc_components": n_comp}


def bench_minhash_dedup(spark, sf_dir):
    from nama_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs_scaled(spark, sf_dir).cache()
    docs.count()
    t0 = time.time()
    n = minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=4,
                          verify_threshold=0.5).count()
    wall = time.time() - t0
    docs.unpersist()
    return wall, {"minhash_pairs": n}


def bench_ngram_jaccard(spark, sf_dir):
    from nama_spark.operators.dedup import ngram_jaccard_pairs

    docs = _docs_scaled(spark, sf_dir).cache()
    docs.count()
    t0 = time.time()
    n = ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_df=1000).count()
    wall = time.time() - t0
    docs.unpersist()
    return wall, {"jaccard_pairs": n}


def bench_quality_dsir(spark, sf_dir):
    """Model-based quality scoring + DSIR selection end-to-end (the two
    classifier.py paths a corpus run pays): hashed features over the
    scaled corpus, NB-share integer scores for EVERY doc, then DSIR
    importance weights + Gumbel top-(n/10) resampling. Reference slice =
    lang='en' (the realistic ref-vs-corpus contrastive fit). Honors
    SPARK_GRAFT_DOC_MULT like the other corpus benches."""
    from pyspark.sql import functions as F

    from nama_spark.operators.classifier import (
        dsir_resample,
        dsir_score,
        dsir_weights,
        hashed_token_features,
        nb_share_score,
        nb_share_weights,
    )

    docs = _docs_scaled(spark, sf_dir).cache()
    n_docs = docs.count()
    t0 = time.time()
    feats = hashed_token_features(docs, n_features=1 << 18).localCheckpoint(
        eager=False
    )
    en = docs.where(F.col("lang") == "en").select("doc_id")
    tgt = feats.join(en, "doc_id", "left_semi")
    raw = feats.join(en, "doc_id", "left_anti")
    n_scored = nb_share_score(feats, nb_share_weights(tgt, raw)).count()
    kept = dsir_resample(
        dsir_score(feats, dsir_weights(tgt, raw)),
        max(10, n_docs // 10),
        seed="bench",
    ).count()
    wall = time.time() - t0
    docs.unpersist()
    return wall, {"quality_scored": n_scored, "dsir_kept": kept}


def bench_corpus_pipeline(spark, sf_dir):
    """The deployable chain end-to-end (jobs/run_corpus_pipeline.main):
    exact dedup → MinHash near-dup → heuristic quality + lang gates →
    annotate → lang-partitioned shards, measured as one wall — the
    number a user comparing corpus-prep engines actually experiences.
    Honors SPARK_GRAFT_DOC_MULT via a pre-written scaled input."""
    import io
    import shutil
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "jobs"))
    try:
        import run_corpus_pipeline
    finally:
        sys.path.pop(0)

    inp = f"{sf_dir}/documents.parquet"
    mult = int(os.environ.get("SPARK_GRAFT_DOC_MULT", "1"))
    if mult > 1:
        inp = "/tmp/bench_corpus_input"
        _docs_scaled(spark, sf_dir).write.mode("overwrite").parquet(inp)
    out = "/tmp/bench_corpus_out"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_corpus_pipeline.main([
            "--input", inp, "--output", out,
            "--near-dup-threshold", "0.8",
            "--min-quality", "0.3",
            "--langs", "en,de,fr,es,zh,und",
        ])
    wall = time.time() - t0
    assert rc == 0
    import json as _json

    funnel = _json.loads(buf.getvalue().strip().splitlines()[-1])["funnel"]
    return wall, {
        "corpus_in": funnel["input"],
        "corpus_out": funnel["after_filters"],
    }


def bench_winnow_dedup(spark, sf_dir):
    """Full-corpus winnowing near-dup pairs at library defaults (the driver
    query subsets to doc_id<250 for oracle cost — too small to time).
    Honors SPARK_GRAFT_DOC_MULT/_SALT like the other dedup benches so the
    scale-step runs cover winnowing too."""
    from nama_spark.operators.dedup import winnow_near_pairs

    docs = _docs_scaled(spark, sf_dir).cache()
    docs.count()
    t0 = time.time()
    n = winnow_near_pairs(docs, k=8, window=4, threshold=0.2).count()
    wall = time.time() - t0
    docs.unpersist()
    return wall, {"winnow_pairs": n}


def _emb_scaled(spark, sf_dir):
    """embeddings, replicated SPARK_GRAFT_EMB_MULT times with shifted ids —
    the ANN corpus scale-up knob. Identical vectors per replica cost the
    same arithmetic as distinct ones, so timing is honest; queries stay the
    64 original ids."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mult = int(os.environ.get("SPARK_GRAFT_EMB_MULT", "1"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if mult <= 1:
        return emb.repartition(n_parts)
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.repartition(n_parts)


def _ann_recall(approx, exact) -> float:
    """|approx ∩ exact| / |exact| on (query_id, neighbor_id) rows. Replica
    ids collapse to their original id first: any copy of the true neighbor
    counts (the copies are the same vector)."""
    from pyspark.sql import functions as F

    def norm(df):
        return df.select(
            "query_id", F.pmod(F.col("neighbor_id"), F.lit(10_000_000)).alias("nid")
        ).distinct()

    a, e = norm(approx), norm(exact)
    hit = a.join(e, ["query_id", "nid"], "inner").count()
    total = e.count()
    return hit / total if total else 1.0


def bench_ann(spark, sf_dir):
    """Bruteforce cosine top-k — the labeled O(q·n) RECALL BASELINE, kept as
    the accuracy yardstick; ann_lsh/ann_ivf below are the scale paths (their
    measured recall vs this baseline lands in extras)."""
    from nama_spark.operators.ann import cosine_topk_bruteforce
    from pyspark.sql import functions as F

    emb = _emb_scaled(spark, sf_dir).cache()
    emb.count()
    queries = emb.where(F.col("vec_id") < 64)
    t0 = time.time()
    n = cosine_topk_bruteforce(emb, queries, k=10).count()
    wall = time.time() - t0
    emb.unpersist()
    return wall, {"ann_rows": n}


def bench_ann_lsh(spark, sf_dir):
    """LSH-bucketed top-k (scale path): PRUNING parameters — max_distance 1.2
    ⇒ candidates at cos ≥ 0.28, just under the measured rank-10 floor of
    this fixture (true top-10 cosines span 0.30-0.60; random pairs sit
    below — a deliberately HARD ANN case). The driver query's recall-1.0
    parameters (max_distance 50) do no pruning at all and measure 3.7×
    slower than bruteforce at 5k vectors — correct, but not the scale
    posture. Recall vs the bruteforce baseline is measured OUTSIDE the
    timed region and reported in extras."""
    from nama_spark.operators.ann import cosine_topk_bruteforce, lsh_topk
    from pyspark.sql import functions as F

    emb = _emb_scaled(spark, sf_dir).cache()
    emb.count()
    queries = emb.where(F.col("vec_id") < 64)
    t0 = time.time()
    out = lsh_topk(emb, queries, k=10, num_hash_tables=8, bucket_length=0.5,
                   max_distance=1.2)
    out = out.localCheckpoint(eager=False)
    n = out.count()
    wall = time.time() - t0
    exact = cosine_topk_bruteforce(emb, queries, k=10)
    rec = _ann_recall(out, exact)
    emb.unpersist()
    return wall, {"ann_lsh_rows": n, "ann_lsh_recall": round(rec, 4)}


def _ivf_bench_config(n: int) -> tuple[int, int]:
    """(n_cells, nprobe) for the bench corpus: cells sized to the ~400-row
    occupancy target, nprobe floored to 60% of cells. The floor exists
    because a SMALL corpus with few cells under-probes badly (r4 recorded
    recall 0.70 at 16 cells / nprobe 6 over 2k vectors — a config artifact,
    not an IVF property); the fixture's hashed-projection vectors are
    near-random (a deliberately hard ANN case), so a generous probe
    fraction is the price of ≥0.9 recall here. Real-encoder embeddings
    cluster, and production configs probe far fewer cells."""
    n_cells = max(8, min(n // 400, 4096))
    # 70% probe fraction, floor 7: sampled-fit centroid quality varies run
    # to run on this near-random fixture (measured band at 8 cells:
    # nprobe 5 → 0.86-0.98, nprobe 6 → 0.91, nprobe 7 → 0.96), so the
    # config leaves margin above the 0.9 recall target at both scales
    return n_cells, max(7, (7 * n_cells + 9) // 10)


def bench_ann_ivf(spark, sf_dir):
    """IVF cell-probe top-k, COLD: the timed region includes the k-means
    index build — the cold-start upper bound. Config from
    _ivf_bench_config (recall ≥0.9 by construction on this fixture); recall
    vs bruteforce in extras. The amortized row below is the deployment
    story."""
    from nama_spark.operators.ann import cosine_topk_bruteforce, ivf_topk
    from pyspark.sql import functions as F

    emb = _emb_scaled(spark, sf_dir).cache()
    n_vec = emb.count()
    n_cells, nprobe = _ivf_bench_config(n_vec)
    queries = emb.where(F.col("vec_id") < 64)
    t0 = time.time()
    out = ivf_topk(emb, queries, k=10, n_cells=n_cells, nprobe=nprobe)
    out = out.localCheckpoint(eager=False)
    n = out.count()
    wall = time.time() - t0
    exact = cosine_topk_bruteforce(emb, queries, k=10)
    rec = _ann_recall(out, exact)
    emb.unpersist()
    return wall, {"ann_ivf_rows": n, "ann_ivf_recall": round(rec, 4),
                  "ann_ivf_cells": n_cells, "ann_ivf_nprobe": nprobe}


def bench_ann_ivf_amortized(spark, sf_dir):
    """IVF against a PREBUILT index (ivf_fit_centroids + ivf_assign run
    OUTSIDE the timed region, as a persisted index-once/delta-daily
    deployment would): the timed region is ivf_topk_delta only — the
    per-query-batch cost a production consumer pays. Same config and recall
    floor as the cold row."""
    from nama_spark.operators.ann import (
        cosine_topk_bruteforce,
        ivf_assign,
        ivf_fit_centroids,
        ivf_topk_delta,
    )
    from pyspark.sql import functions as F

    emb = _emb_scaled(spark, sf_dir).cache()
    n_vec = emb.count()
    n_cells, nprobe = _ivf_bench_config(n_vec)
    centers = ivf_fit_centroids(emb, n_cells=n_cells).localCheckpoint()
    assigned = ivf_assign(emb, centers).localCheckpoint()
    queries = emb.where(F.col("vec_id") < 64)
    t0 = time.time()
    out = ivf_topk_delta(queries, centers, assigned, k=10, nprobe=nprobe)
    out = out.localCheckpoint(eager=False)
    n = out.count()
    wall = time.time() - t0
    exact = cosine_topk_bruteforce(emb, queries, k=10)
    rec = _ann_recall(out, exact)
    emb.unpersist()
    return wall, {"ann_ivf_am_rows": n, "ann_ivf_am_recall": round(rec, 4)}


def bench_ann_pq(spark, sf_dir):
    """PQ/ADC top-k with exact refine (Jégou et al. 2011): codebooks +
    codes built OUTSIDE the timed region (the persisted-index deployment —
    codes are m bytes/vector, 32× smaller than float32 at dim 64); the
    timed region is LUT build + ADC scan + refine. Recall vs bruteforce in
    extras (the md5-hash fixture is near-random — a hard PQ case; see
    tests for the clustered-geometry recall)."""
    from nama_spark.operators.ann import (
        cosine_topk_bruteforce,
        pq_encode,
        pq_fit_codebooks,
        pq_topk,
    )
    from pyspark.sql import functions as F

    emb = _emb_scaled(spark, sf_dir).cache()
    emb.count()
    books = pq_fit_codebooks(emb, m=8, k=64).localCheckpoint()
    codes = pq_encode(emb, books).localCheckpoint()
    queries = emb.where(F.col("vec_id") < 64)
    t0 = time.time()
    out = pq_topk(queries, books, codes, k=10, refine=emb, refine_factor=16)
    out = out.localCheckpoint(eager=False)
    n = out.count()
    wall = time.time() - t0
    exact = cosine_topk_bruteforce(emb, queries, k=10)
    rec = _ann_recall(out, exact)
    emb.unpersist()
    return wall, {"ann_pq_rows": n, "ann_pq_recall": round(rec, 4)}


def bench_embed_lsh(spark, sf_dir, n_entities):
    from fixtures.make_fixtures import fixture_dataframes, make_fixture
    from nama_spark.operators.embed import embed_strings, lsh_candidates
    from pyspark.sql import functions as F

    # LSH join cost grows faster than the other benches — size it down so the
    # suite stays balanced (it is still the largest single timed region)
    fx = make_fixture(seed=7, n_entities=max(200, n_entities // 4), max_files=3)
    records, _, _ = fixture_dataframes(spark, fx)
    names = records.select(F.col("repo").alias("string")).distinct()
    t0 = time.time()
    emb = embed_strings(names, count_col=None, dim=64, seed=42)
    n = lsh_candidates(emb, 0.8, num_hash_tables=8, bucket_length=0.25).count()
    return time.time() - t0, {"lsh_pairs": n}


def bench_embed_ivf(spark, sf_dir, n_entities):
    """IVF-cell threshold join over the same embed workload as embed_lsh —
    the density-robust scale path (see ivf_candidates: BRP-LSH join cost
    grows with bucket occupancy; IVF keeps cell occupancy constant)."""
    from fixtures.make_fixtures import fixture_dataframes, make_fixture
    from nama_spark.operators.embed import embed_strings, ivf_candidates
    from pyspark.sql import functions as F

    fx = make_fixture(seed=7, n_entities=max(200, n_entities // 4), max_files=3)
    records, _, _ = fixture_dataframes(spark, fx)
    names = records.select(F.col("repo").alias("string")).distinct()
    t0 = time.time()
    emb = embed_strings(names, count_col=None, dim=64, seed=42)
    n = ivf_candidates(emb, 0.8, nprobe=2).count()
    return time.time() - t0, {"ivf_pairs": n}


def bench_fs_scoring(spark, sf_dir):
    """Fellegi–Sunter chain end-to-end: blocked customer pairs → agreement
    vectors → pattern_counts (ONE pair-scale groupBy) → driver EM over the
    ≤12-row pattern table → milli match weights + posterior for every pair.
    SPARK_GRAFT_CUST_MULT replicates customers with shifted keys; replicas
    share block keys, so occupancy grows ×mult and pair mass ~×mult² — the
    dense-block regime, which is what 10× data means under a fixed blocking
    key granularity. The interesting number is pairs/sec staying flat."""
    from pyspark.sql import functions as F

    from nama_spark.operators.fellegi_sunter import (
        em_fit,
        match_probability,
        match_weights,
        pattern_counts,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    mult = int(os.environ.get("SPARK_GRAFT_CUST_MULT", "1"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if mult > 1:
        cust = reduce(
            lambda a, b: a.unionByName(b),
            [
                cust.select(
                    (F.col("c_custkey") + F.lit(i * 10_000_000)).alias("c_custkey"),
                    "c_name",
                    "c_nationkey", "c_acctbal", "c_mktsegment",
                )
                for i in range(mult)
            ],
        )
    cust = cust.repartition(n_parts).cache()
    cust.count()
    t0 = time.time()
    c = cust.select(
        "c_custkey",
        F.substring("c_name", -3, 3).alias("blk"),
        "c_nationkey", "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    a = c.select([F.col(x).alias(f"{x}_a") for x in c.columns])
    b = c.select([F.col(x).alias(f"{x}_b") for x in c.columns])
    g = a.join(
        b,
        (F.col("blk_a") == F.col("blk_b"))
        & (F.col("c_custkey_a") < F.col("c_custkey_b")),
    ).select(
        F.col("c_custkey_a").alias("c0"),
        F.col("c_custkey_b").alias("c1"),
        F.when(F.col("c_nationkey_a") == F.col("c_nationkey_b"), 1)
        .otherwise(0).alias("g_nation"),
        F.when(F.col("c_mktsegment_a") == F.col("c_mktsegment_b"), 1)
        .otherwise(0).alias("g_segment"),
        F.when(F.col("cents_a") == F.col("cents_b"), 2)
        .when(F.abs(F.col("cents_a") - F.col("cents_b")) <= 10000, 1)
        .otherwise(0).alias("g_bal"),
    ).localCheckpoint(eager=False)
    cols = ["g_nation", "g_segment", "g_bal"]
    lam, params = em_fit(
        pattern_counts(g, cols), cols,
        {"g_nation": 2, "g_segment": 2, "g_bal": 3},
    )
    n = match_probability(match_weights(g, params, cols), lam).count()
    wall = time.time() - t0
    cust.unpersist()
    return wall, {"fs_pairs": n, "fs_lambda": round(lam, 4)}


def bench_hybrid_scoring(spark, sf_dir):
    """The hybrid string-measure family over one pair stream: Monge–Elkan
    (fused JVM higher-order projection), SoftTFIDF (corpus weights + JW
    per distinct token pair), and CLK Bloom Dice (pure JVM arrays) —
    consecutive-key part-name pairs. SPARK_GRAFT_PART_MULT replicates the
    pair stream with shifted keys (names unchanged: the corpus/weight side
    stays FIXED while pair mass grows ×mult — the deployment shape, where
    the trained corpus is amortized across a growing candidate stream)."""
    from pyspark.sql import functions as F

    from nama_spark.operators.pprl import bloom_dice_pairs
    from nama_spark.operators.score import monge_elkan_scores, soft_tfidf_scores

    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_name"
    )
    mult = int(os.environ.get("SPARK_GRAFT_PART_MULT", "1"))
    if mult > 1:
        part = reduce(
            lambda a, b: a.unionByName(b),
            [
                part.select(
                    (F.col("p_partkey") + F.lit(i * 10_000_000)).alias(
                        "p_partkey"
                    ),
                    "p_name",
                )
                for i in range(mult)
            ],
        )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    a = part.select(F.col("p_partkey").alias("k"), F.col("p_name").alias("s0"))
    b = part.select(
        (F.col("p_partkey") - 1).alias("k"), F.col("p_name").alias("s1")
    )
    pairs = a.join(b, "k").repartition(n_parts).cache()
    n_pairs = pairs.count()
    corpus = part.select(F.col("p_name").alias("string"))
    t0 = time.time()
    monge_elkan_scores(pairs).agg(F.sum("me_sym_milli")).collect()
    t_me = time.time()
    soft_tfidf_scores(pairs, corpus).agg(F.sum("soft_sym")).collect()
    t_soft = time.time()
    bloom_dice_pairs(pairs).agg(F.sum("dice_milli")).collect()
    t_bloom = time.time()
    wall = t_bloom - t0
    pairs.unpersist()
    return wall, {
        "hybrid_pairs": n_pairs,
        "hybrid_me_sec": round(t_me - t0, 3),
        "hybrid_soft_sec": round(t_soft - t_me, 3),
        "hybrid_bloom_sec": round(t_bloom - t_soft, 3),
    }


def bench_sorted_neighborhood(spark, sf_dir, n_entities):
    """Distributed global rank + rank equi-join over the fixture name
    universe (the driver query's own universe is only ~64 names — too small
    to time)."""
    from fixtures.make_fixtures import fixture_dataframes, make_fixture
    from nama_spark.functions.normalize import simplify_corp
    from nama_spark.operators.block import sorted_neighborhood_pairs
    from pyspark.sql import functions as F

    fx = make_fixture(seed=7, n_entities=n_entities, max_files=3)
    records, _, _ = fixture_dataframes(spark, fx)
    names = records.select(F.col("repo").alias("string")).distinct().cache()
    names.count()
    t0 = time.time()
    n = sorted_neighborhood_pairs(names, simplify_corp, window=5).count()
    wall = time.time() - t0
    names.unpersist()
    return wall, {"snb_pairs": n}


def bench_sql(spark, sf_dir, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    t0 = time.time()
    n = fn(spark, sf_dir).count()
    return time.time() - t0, {f"{name}_rows": n}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = _sf_of(sf_dir)
    # name-universe size scales with SF: sf0.01 → ~300 entities, sf0.1 → ~3000.
    # SPARK_GRAFT_ENTITIES overrides (the scaling bench uses a larger universe
    # so compute dominates fixed job-scheduling latency).
    n_entities = int(
        os.environ.get("SPARK_GRAFT_ENTITIES", max(100, int(30000 * sf)))
    )
    only = os.environ.get("SPARK_GRAFT_QUERIES")
    only = set(only.split(",")) if only else None

    from nama_spark.session import get_spark

    # shuffle partitions pinned (not cores-derived) so N-vs-4N runs compare
    # identical plans, differing only in parallelism
    spark = get_spark(
        "nama_spark_bench",
        cores=cpus,
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    queries: dict[str, float] = {}
    extras: dict[str, int] = {}
    # Repeats default to 3 (in-file, not env-gated): each query is timed N
    # times in-session and the MIN wall kept — steady-state (JIT-warm)
    # capability, robust to the shared-VM noise single shots suffer (±30%
    # observed). Regions ≥60 s stop after the first shot: at that length the
    # noise band is amortized and extra repeats just burn the round budget.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    long_region_cutoff = float(os.environ.get("SPARK_GRAFT_REPEAT_CUTOFF", "60"))

    def run(name, fn, *args):
        if only and name not in only:
            return
        walls = []
        for _ in range(repeats):
            wall, ex = fn(spark, *args)
            walls.append(wall)
            extras.update(ex)
            if wall >= long_region_cutoff:
                break
        queries[name] = round(min(walls), 3)

    if os.environ.get("SPARK_GRAFT_WARMUP"):
        # JIT/page-cache warmup outside any timed region
        bench_candidate_scoring(spark, sf_dir, min(n_entities, 2000))

    run("pipeline_er", bench_pipeline_er, sf_dir, n_entities)
    run("candidate_scoring", bench_candidate_scoring, sf_dir, n_entities)
    if only and "full_scoring" in only:  # scaling-harness only (heavy)
        run("full_scoring", bench_full_scoring, sf_dir, n_entities)
    run("cc_clustering", bench_cc, sf_dir, n_entities)
    if only and "cc_synth" in only:  # scaling-harness only (heavy)
        run("cc_synth", bench_cc_synth, sf_dir)
    run("minhash_dedup", bench_minhash_dedup, sf_dir)
    run("ngram_jaccard_dedup", bench_ngram_jaccard, sf_dir)
    run("ann_topk", bench_ann, sf_dir)
    run("ann_lsh", bench_ann_lsh, sf_dir)
    run("ann_ivf", bench_ann_ivf, sf_dir)
    run("ann_ivf_amortized", bench_ann_ivf_amortized, sf_dir)
    run("ann_pq", bench_ann_pq, sf_dir)
    run("embed_lsh", bench_embed_lsh, sf_dir, n_entities)
    run("embed_ivf", bench_embed_ivf, sf_dir, n_entities)
    run("tpch_q1", bench_sql, sf_dir, "tpch_q1_pricing_summary")
    run("events_hourly", bench_sql, sf_dir, "events_hourly")
    run("sessionize_window", bench_sql, sf_dir, "events_sessionize_window")
    run("sessionize_capped", bench_sql, sf_dir, "events_sessionize_capped")
    run("quality_dsir", bench_quality_dsir, sf_dir)
    run("corpus_pipeline", bench_corpus_pipeline, sf_dir)
    run("winnow_dedup", bench_winnow_dedup, sf_dir)
    run("fs_scoring", bench_fs_scoring, sf_dir)
    run("hybrid_scoring", bench_hybrid_scoring, sf_dir)
    run("sorted_neighborhood", bench_sorted_neighborhood, sf_dir, n_entities)

    pairs_per_sec = (
        extras.get("candidate_pairs", 0) / queries["candidate_scoring"]
        if queries.get("candidate_scoring")
        else 0.0
    )
    out = {
        "metric": "candidate_pairs_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "extras": extras,
    }
    print(json.dumps(out))
    spark.stop()


_BENIGN_PATTERNS = (
    # the three documented-benign families from the module docstring —
    # filtered from the forwarded stderr so a NEW stack trace stands out in
    # the recorded tail instead of drowning in known noise
    "Failed to update accumulator",
    "non-existent accumulator",
    "garbage collected accumulator",
    "BrokenPipeError",
    "pyspark/daemon.py",
    "WARN BlockManager: Block rdd_",
)
_CONTINUATION = ("\tat ", "  at ", "Caused by", "  File ", "    ", "\t...")


def filter_benign_lines(lines):
    """Drop documented-benign stderr lines plus their stack-trace
    continuation lines (a dropped header swallows the '\\tat ...' frames
    that follow it). A 'Traceback' header is held one line to see whether
    the traceback is the benign daemon BrokenPipe (dropped together) or
    novel (flushed intact). Pure function — unit-tested without Spark."""
    in_dropped_block = False
    held_traceback = None
    for line in lines:
        if any(p in line for p in _BENIGN_PATTERNS):
            in_dropped_block = True
            held_traceback = None  # the held header belonged to this block
            continue
        if held_traceback is not None:
            yield held_traceback
            held_traceback = None
        if line.startswith("Traceback (most recent call last)"):
            if in_dropped_block:
                continue
            held_traceback = line
            continue
        if in_dropped_block and (
            line.startswith(_CONTINUATION) or line.strip() == ""
        ):
            continue
        in_dropped_block = False
        yield line
    if held_traceback is not None:
        yield held_traceback


def _run_filtered():
    """Re-exec the bench as a child and stream its stderr through the
    benign-line filter, so whatever captures OUR stderr (the per-round
    BENCH_r{N}.json tail) records signal, not the documented noise.
    Stdout (the one-line JSON) passes through untouched."""
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
        stderr=subprocess.PIPE, env=env, text=True, errors="replace",
    )
    # one generator instance end-to-end: the continuation-drop state must
    # persist across lines (a dropped header swallows its following frames)
    for line in filter_benign_lines(proc.stderr):
        sys.stderr.write(line)
        sys.stderr.flush()
    return proc.wait()


if __name__ == "__main__":
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(_run_filtered())
