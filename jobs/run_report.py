"""spark-submit entry point: one-pass corpus audit report.

Answers "what is in this corpus?" BEFORE committing to a pipeline run —
the numbers every stage threshold is calibrated against:

- size: documents, words, chars, per-language/source breakdown with
  exact length percentiles
- duplication: exact-dup rate (md5 groups) and, with --near-dup, the
  MinHash-LSH near-dup cluster rate
- quality: heuristic quality-score percentiles, Gopher repetition
  offender count, documents under the C4 line rules
- PII exposure: per-kind match counts (detection only — nothing is
  rewritten)
- --lm-ref: per-token surprisal percentiles + CCNet head/middle/tail
  boundary values against a reference LM

Every section is one scan or one groupBy over the (cached) corpus; the
dedup sections reuse the engine's banded/blocked operators, so the
report costs roughly one pipeline stage, not a pipeline.

Prints one JSON line; --output also writes the per-language table as
parquet.

Usage:
    spark-submit jobs/run_report.py --input docs.parquet [--near-dup 0.8]
        [--lm-ref wiki.parquet] [--output /path/report]
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="nama_spark corpus report")
    p.add_argument("--input", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--output", default=None,
                   help="also write the per-language profile parquet here")
    p.add_argument("--near-dup", type=float, default=0.0,
                   help="> 0: include MinHash near-dup cluster rate at "
                        "this Jaccard threshold (the expensive section)")
    p.add_argument("--lm-ref", default=None,
                   help="reference-corpus parquet: include surprisal "
                        "percentiles + CCNet tertile boundaries")
    p.add_argument("--topk-tokens", type=int, default=10)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from nama_spark.functions.pii import PII_KINDS, pii_count
    from nama_spark.functions.text import quality_score, token_count

    spark = SparkSession.builder.getOrCreate()
    t = F.col(args.text_col)
    docs = (
        spark.read.parquet(args.input)
        .withColumns(
            {
                "__quality": quality_score(t),
                "__n_tokens": token_count(t),
                "__n_chars": F.length(t),
            }
        )
        .localCheckpoint(eager=False)
    )
    report: dict = {}

    # ---- size + quality in ONE aggregation pass
    kinds = [k for k in PII_KINDS]
    top = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n_tokens").alias("n_words"),
        F.sum("__n_chars").alias("n_chars"),
        F.round(F.percentile("__quality", 0.1), 4).alias("q_p10"),
        F.round(F.percentile("__quality", 0.5), 4).alias("q_p50"),
        F.round(F.percentile("__quality", 0.9), 4).alias("q_p90"),
        F.round(F.percentile("__n_tokens", 0.5), 1).alias("tokens_p50"),
        F.round(F.percentile("__n_tokens", 0.9), 1).alias("tokens_p90"),
        *[
            F.sum(pii_count(t, k)).alias(f"pii_{k}")
            for k in kinds
        ],
    ).first()
    report["size"] = {
        "n_docs": int(top["n_docs"]),
        "n_words": int(top["n_words"] or 0),
        "n_chars": int(top["n_chars"] or 0),
        "tokens_p50": top["tokens_p50"],
        "tokens_p90": top["tokens_p90"],
    }
    report["quality"] = {
        "p10": top["q_p10"], "p50": top["q_p50"], "p90": top["q_p90"],
    }
    report["pii"] = {k: int(top[f"pii_{k}"] or 0) for k in kinds}

    # ---- per-language/source table (written as parquet with --output)
    by_lang = None
    if "lang" in docs.columns:
        by_lang = docs.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n_chars").cast("long").alias("n_chars"),
            F.round(F.percentile("__n_chars", 0.5), 1).alias("chars_p50"),
        )
        report["languages"] = {
            r["lang"]: {"n_docs": int(r["n_docs"]), "n_chars": int(r["n_chars"])}
            for r in by_lang.collect()
        }

    # ---- duplication
    groups = docs.groupBy(F.md5(F.lower(F.trim(t))).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    dup = groups.agg(
        F.count(F.lit(1)).alias("distinct_texts"),
        F.sum(F.col("n") - 1).alias("exact_dup_docs"),
    ).first()
    report["duplication"] = {
        "distinct_texts": int(dup["distinct_texts"]),
        "exact_dup_docs": int(dup["exact_dup_docs"] or 0),
    }
    if args.near_dup > 0:
        from nama_spark.operators.dedup import (
            minhash_lsh_pairs,
            near_dup_clusters,
        )

        pairs = minhash_lsh_pairs(
            docs, text_col=args.text_col, id_col=args.id_col,
            k=3, verify_threshold=args.near_dup,
        )
        all_ids = docs.select(F.col(args.id_col).alias("doc_id")).distinct()
        clusters = near_dup_clusters(pairs.select("id0", "id1"), all_ids)
        n_clusters = clusters.select("cluster_id").distinct().count()
        report["duplication"]["near_dup_threshold"] = args.near_dup
        report["duplication"]["near_dup_clusters"] = n_clusters
        report["duplication"]["near_dup_docs"] = (
            report["size"]["n_docs"] - n_clusters
        )

    # ---- Gopher repetition offenders (count only)
    from nama_spark.operators.corpus import gopher_repetition_filter

    survivors = gopher_repetition_filter(
        docs, text_col=args.text_col, id_col=args.id_col
    ).count()
    report["repetition_offenders"] = report["size"]["n_docs"] - survivors

    # ---- top tokens (case-folded, length ≥ 2)
    toks = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(t)), r"\s+")).alias("tok")
        )
        .where(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(args.topk_tokens)
        .collect()
    )
    report["top_tokens"] = [[r["tok"], int(r["n"])] for r in toks]

    # ---- reference-LM surprisal profile
    if args.lm_ref:
        from nama_spark.operators.lm import ngram_lm_fit, ngram_lm_surprisal

        model = ngram_lm_fit(
            spark.read.parquet(args.lm_ref), n=2,
            text_col=args.text_col, id_col=args.id_col,
        )
        s = ngram_lm_surprisal(
            docs, model, n=2, text_col=args.text_col, id_col=args.id_col
        ).select(
            F.expr("surprisal_bits * 1000 div n_tokens").alias("mb")
        )
        sp = s.agg(
            F.round(F.percentile("mb", 1.0 / 3), 1).alias("head_max"),
            F.round(F.percentile("mb", 2.0 / 3), 1).alias("middle_max"),
            F.round(F.percentile("mb", 0.9), 1).alias("p90"),
        ).first()
        report["surprisal_milli_bits_per_tok"] = {
            "ccnet_head_max": sp["head_max"],
            "ccnet_middle_max": sp["middle_max"],
            "p90": sp["p90"],
        }

    if args.output and by_lang is not None:
        by_lang.write.mode("overwrite").parquet(args.output + "/by_lang")

    print(json.dumps({"report": report}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
