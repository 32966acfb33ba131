"""spark-submit entry point for cross-table record linkage.

    cd /root/repo && zip -qr /tmp/nama_spark.zip nama_spark

    spark-submit --py-files /tmp/nama_spark.zip jobs/run_linkage.py \
        --left vendors.parquet --left-col vendor_name \
        --right registry.parquet --right-col legal_name \
        --mode mutual --threshold 0.5 \
        --output /path/to/links

Writes <output>/links (s0 = left string, s1 = right string, score) under
the selection rule:

    best_left  best-scoring right per left (deterministic ties)
    mutual     kept only when each side is the other's best — the
               scalable relational core of one-to-one assignment
    one_to_one K-round mutual-best peeling: matched ids leave the pool
               and bests are re-elected, resolving the chains single-shot
               mutual leaves unmatched (adds a round column)
    fs         unsupervised Fellegi–Sunter: pattern EM over string
               agreement vectors, pairs kept by posterior P(match|γ) ≥
               --threshold (links carry weight_milli + p_match; the
               fitted λ and m/u land in the JSON summary)

Candidates come from an eligible-token block join over weights fit on the
UNION universe (never left×right); see operators/linkage.py. Catalog reads
as in run_pipeline.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="nama_spark record linkage")
    p.add_argument("--left", required=True)
    p.add_argument("--right", required=True)
    p.add_argument("--left-col", default="string")
    p.add_argument("--right-col", default="string")
    p.add_argument("--catalog", default=None)
    p.add_argument("--mode", default="mutual",
                   choices=["best_left", "mutual", "one_to_one", "fs"])
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--tokenizer", default="words")
    p.add_argument("--weighting", default="tf-idf")
    p.add_argument("--measure", default="jaccard")
    p.add_argument("--max-block-size", type=int, default=100)
    p.add_argument("--output", required=True)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    from nama_spark.operators.linkage import link_tables
    from nama_spark.sources.readers import read_records

    spark = SparkSession.builder.appName("nama_spark_linkage").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    left = read_records(spark, args.left, catalog=args.catalog)
    right = read_records(spark, args.right, catalog=args.catalog)
    t0 = time.time()
    if args.mode == "fs":
        from nama_spark.operators.fellegi_sunter import fs_link_tables

        links, lam, params = fs_link_tables(
            left,
            right,
            threshold=args.threshold,
            tokenizer=args.tokenizer,
            weighting=args.weighting,
            measure=args.measure,
            max_block_size=args.max_block_size,
            left_col=args.left_col,
            right_col=args.right_col,
        )
        links = links.localCheckpoint(eager=False)
        links.write.mode("overwrite").parquet(args.output + "/links")
        print(json.dumps({
            "mode": "fs",
            "left": left.count(),
            "right": right.count(),
            "links": links.count(),
            "lambda": round(lam, 6),
            "m_u": {c: {str(l): [round(m, 6), round(u, 6)]
                        for l, (m, u) in lv.items()}
                    for c, lv in params.items()},
            "wall_sec": round(time.time() - t0, 2),
        }))
        return 0
    links = link_tables(
        left,
        right,
        threshold=args.threshold,
        mode=args.mode,
        tokenizer=args.tokenizer,
        weighting=args.weighting,
        measure=args.measure,
        max_block_size=args.max_block_size,
        left_col=args.left_col,
        right_col=args.right_col,
    ).localCheckpoint(eager=False)
    links.write.mode("overwrite").parquet(args.output + "/links")
    n_links = links.count()
    print(json.dumps({
        "mode": args.mode,
        "left": left.count(),
        "right": right.count(),
        "links": n_links,
        "wall_sec": round(time.time() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
