"""spark-submit entry point for embedding similarity search (IVF index).

    cd /root/repo && zip -qr /tmp/nama_spark.zip nama_spark

    # build the persistable index once over the corpus
    spark-submit --py-files /tmp/nama_spark.zip jobs/run_ann.py \
        --corpus embeddings.parquet --build-index --output /idx

    # daily: append a delta's assignments (corpus vectors untouched)
    spark-submit ... jobs/run_ann.py \
        --corpus delta.parquet --append-index --index /idx --output /idx2

    # query a batch against the stored index
    spark-submit ... jobs/run_ann.py \
        --queries batch.parquet --index /idx --k 10 --nprobe 3 \
        --output /results

Index layout: <output>/centroids (cell, centroid) + <output>/assigned
(cell, vec_id, embedding). --append-index writes ONLY the delta's assigned
rows to <output>/assigned (plus copied/linked centroids): the old corpus is
never re-read — the index is the union of assigned dirs, mirroring the
MinHash band-index pattern in run_dedup.py. Catalog reads as in
run_pipeline.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="nama_spark ANN / IVF index")
    p.add_argument("--corpus", default=None,
                   help="embeddings table (vec_id, embedding) to index")
    p.add_argument("--queries", default=None,
                   help="query embeddings table for top-k search")
    p.add_argument("--index", default=None,
                   help="existing index dir (centroids + assigned)")
    p.add_argument("--build-index", action="store_true")
    p.add_argument("--append-index", action="store_true",
                   help="assign --corpus against --index's centroids; write "
                        "only the new assignments")
    p.add_argument("--catalog", default=None)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--n-cells", type=int, default=None)
    p.add_argument("--two-level", action="store_true",
                   help="build a two-level coarse-quantizer index "
                        "(ivf2_fit_centroids) — constant occupancy past the "
                        "flat index's 4096-cell cap")
    p.add_argument("--nprobe", type=int, default=3)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--output", required=True)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    from nama_spark.operators.ann import (
        ivf2_fit_centroids,
        ivf_assign,
        ivf_fit_centroids,
        ivf_topk_delta,
    )
    from nama_spark.sources.readers import read_records

    spark = SparkSession.builder.appName("nama_spark_ann").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    if args.build_index:
        if not args.corpus:
            raise SystemExit("--build-index requires --corpus")
        corpus = read_records(spark, args.corpus, catalog=args.catalog)
        if args.two_level:
            centers = ivf2_fit_centroids(corpus, vec_col=args.vec_col)
        else:
            centers = ivf_fit_centroids(
                corpus, n_cells=args.n_cells, vec_col=args.vec_col
            )
        centers.write.mode("overwrite").parquet(args.output + "/centroids")
        assigned = ivf_assign(
            corpus, centers, id_col=args.id_col, vec_col=args.vec_col
        )
        assigned.write.mode("overwrite").parquet(args.output + "/assigned")
        print(json.dumps({
            "op": "build_index",
            "corpus": corpus.count(),
            "cells": centers.count(),
            "wall_sec": round(time.time() - t0, 2),
        }))
        return 0

    if args.append_index:
        if not (args.corpus and args.index):
            raise SystemExit("--append-index requires --corpus and --index")
        import os.path
        if os.path.abspath(args.output) == os.path.abspath(args.index):
            # the writes below lazily read from --index; overwriting the dir
            # being read would fail (or destroy the index first)
            raise SystemExit(
                "--append-index: --output must differ from --index "
                "(writes would overwrite the index while reading it)"
            )
        delta = read_records(spark, args.corpus, catalog=args.catalog)
        centers = spark.read.parquet(args.index + "/centroids")
        new_assigned = ivf_assign(
            delta, centers, id_col=args.id_col, vec_col=args.vec_col
        )
        centers.write.mode("overwrite").parquet(args.output + "/centroids")
        # union of the old and new assignment sets IS the updated index
        old_assigned = spark.read.parquet(args.index + "/assigned")
        old_assigned.unionByName(new_assigned).write.mode("overwrite").parquet(
            args.output + "/assigned"
        )
        print(json.dumps({
            "op": "append_index",
            "delta": delta.count(),
            "wall_sec": round(time.time() - t0, 2),
        }))
        return 0

    if not (args.queries and args.index):
        raise SystemExit("query mode requires --queries and --index "
                         "(or use --build-index / --append-index)")
    queries = read_records(spark, args.queries, catalog=args.catalog)
    centers = spark.read.parquet(args.index + "/centroids")
    assigned = spark.read.parquet(args.index + "/assigned")
    out = ivf_topk_delta(
        queries, centers, assigned, k=args.k, nprobe=args.nprobe,
        id_col=args.id_col, vec_col=args.vec_col,
    ).localCheckpoint(eager=False)
    out.write.mode("overwrite").parquet(args.output + "/topk")
    print(json.dumps({
        "op": "query",
        "queries": queries.count(),
        "result_rows": out.count(),
        "wall_sec": round(time.time() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
