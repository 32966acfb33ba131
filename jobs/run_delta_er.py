"""spark-submit entry point for DAILY-DELTA entity resolution.

The full-corpus pipeline (jobs/run_pipeline.py) re-solves the world; this
job folds a Δ batch of newly-arrived names into PERSISTED state instead,
so a daily increment costs O(Δ·block), never O(corpus):

    state/clusters.parquet     (string, count, group)   — the partition
    state/entity_ids.parquet   (node, entity_id)        — stable ids
    state/tokens.parquet       (string, token, tf)      — carried token table

    # bootstrap
    spark-submit --py-files /tmp/nama_spark.zip jobs/run_delta_er.py \
        --init --delta-input day0.parquet --string-col repo \
        --state /lake/er_state

    # every following day: Δ-only blocking/scoring + group-quotient unite
    spark-submit --py-files /tmp/nama_spark.zip jobs/run_delta_er.py \
        --delta-input day1.parquet --string-col repo \
        --state /lake/er_state --threshold 0.7

Per batch: TokenSimilarity.fit_incremental tokenizes ONLY genuinely-new
strings against the carried token table; token_block_pairs_against
enumerates new-touching candidates only; unite_incremental merges through
the group quotient (old×old pairs are never re-scored, old groups never
split — uniting is monotone). cluster.stable_entity_ids then carries
entity ids across the re-clustering so downstream keys survive label
churn. State is rewritten atomically into a versioned subdir and
`state/CURRENT` is flipped last, so a killed run never corrupts the
previous day's state (the checkpoint/resume posture of run_pipeline, at
the state level).

No reference counterpart: nama's unite() is incremental only because
everything lives in one in-memory dict (match_data.py:203-242); this is
the distributed, persisted equivalent.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="nama_spark daily-delta ER")
    p.add_argument("--delta-input", required=True,
                   help="parquet path or table id with the new records")
    p.add_argument("--catalog", default=None,
                   help="Iceberg/session catalog name (table ids)")
    p.add_argument("--string-col", default="string")
    p.add_argument("--state", required=True,
                   help="state dir (clusters/entity_ids/tokens parquet)")
    p.add_argument("--init", action="store_true",
                   help="bootstrap state from --delta-input alone")
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--tokenizer", default="nmgrams23")
    p.add_argument("--weighting", default="tf-idf")
    p.add_argument("--measure", default="jaccard")
    p.add_argument("--max-block-size", type=int, default=100)
    p.add_argument("--golden-rules", default=None,
                   help="comma list field=rule (rule: max|min|longest|"
                        "most_frequent|sum|avg|any): maintain a golden-"
                        "record table in state, delta-fused per batch")
    p.add_argument("--records-input", default=None,
                   help="record table (parquet/table id) carrying the "
                        "fields --golden-rules fuses; joined to clusters "
                        "on --string-col. Required with --golden-rules")
    return p.parse_args(argv)


def _current_version(state: str) -> str | None:
    cur = os.path.join(state, "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return f.read().strip()


def _write_state(state: str, version: str, clusters, entity_ids, tokens,
                 golden=None):
    base = os.path.join(state, version)
    clusters.write.mode("overwrite").parquet(os.path.join(base, "clusters"))
    entity_ids.write.mode("overwrite").parquet(
        os.path.join(base, "entity_ids")
    )
    if tokens is not None:
        tokens.write.mode("overwrite").parquet(os.path.join(base, "tokens"))
    if golden is not None:
        golden.write.mode("overwrite").parquet(os.path.join(base, "golden"))
    # flip CURRENT last: readers always see a complete version
    tmp = os.path.join(state, "CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(state, "CURRENT"))


def main(argv=None):
    args = parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from nama_spark.operators.cluster import stable_entity_ids
    from nama_spark.operators.matchdata import MatchData
    from nama_spark.operators.token_similarity import TokenSimilarity
    from nama_spark.sources.readers import read_records

    spark = SparkSession.builder.appName("nama_spark_delta_er").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    delta = read_records(spark, args.delta_input, catalog=args.catalog)
    ts = TokenSimilarity(
        tokenizer=args.tokenizer,
        weighting=args.weighting,
        measure=args.measure,
        max_block_size=args.max_block_size,
    )

    version = _current_version(args.state)
    if args.init:
        if version is not None:
            raise SystemExit(f"--init but {args.state}/CURRENT exists")
        md = MatchData.from_unmatched(delta, string_col=args.string_col)
        ts.fit(md.df, string_col="string")
        united = ts.predict(md, threshold=args.threshold)
        prev_ids = spark.createDataFrame(
            [], "node string, entity_id string"
        )
        tokens_out = ts._tokens
        n_delta = md.df.count()
        next_version = "v000001"
    else:
        if version is None:
            raise SystemExit(
                f"no {args.state}/CURRENT — bootstrap with --init first"
            )
        base = os.path.join(args.state, version)
        prior = MatchData(
            spark.read.parquet(os.path.join(base, "clusters"))
        )
        prev_ids = spark.read.parquet(os.path.join(base, "entity_ids"))
        prev_tokens = spark.read.parquet(os.path.join(base, "tokens"))
        united = ts.predict_incremental(
            prior,
            delta,
            threshold=args.threshold,
            string_col=args.string_col,
            prev_tokens=prev_tokens,
        )
        # carried token table + this batch's delta rows = next batch's carry
        tokens_out = (
            prev_tokens.unionByName(ts.last_delta_tokens)
            if ts.last_delta_tokens is not None
            else prev_tokens
        )
        n_delta = delta.select(args.string_col).distinct().count()
        next_version = f"v{int(version[1:]) + 1:06d}"

    assignment = united.df.select(
        F.col("string").alias("node"), F.col("group").alias("component")
    )
    ids = stable_entity_ids(prev_ids, assignment)

    # optional golden-record maintenance: delta-fuse only churn-touched
    # clusters (fusion.golden_records_delta); a batch's changed set is the
    # clusters containing any delta string — under the job's arrival-only
    # model every merged/new cluster contains one, and clusters whose
    # labels died in a merge are dropped by the alive semi-join.
    golden_out = None
    n_golden = n_refused = None
    if args.golden_rules:
        from nama_spark.operators.fusion import (
            golden_records,
            golden_records_delta,
        )

        if not args.records_input:
            raise SystemExit("--golden-rules requires --records-input")
        rules = dict(kv.split("=", 1)
                     for kv in args.golden_rules.split(","))
        records = read_records(
            spark, args.records_input, catalog=args.catalog
        )
        rec = records.join(
            united.df.select(
                F.col("string").alias(args.string_col), "group"
            ),
            args.string_col,
        )
        prev_golden_path = (
            os.path.join(args.state, version, "golden")
            if version is not None else None
        )
        if prev_golden_path and os.path.exists(prev_golden_path):
            prev_golden = spark.read.parquet(prev_golden_path)
            changed = (
                united.df.join(
                    delta.select(
                        F.col(args.string_col).alias("string")
                    ).distinct(),
                    "string", "leftsemi",
                ).select("group").distinct()
            )
            alive = united.df.select("group").distinct()
            golden_out = golden_records_delta(
                prev_golden.join(alive, "group", "leftsemi"),
                rec, "group", rules, changed,
            ).localCheckpoint(eager=False)
            n_refused = changed.count()
        else:
            # first golden-enabled run (init, or flag newly added)
            golden_out = golden_records(rec, "group", rules).localCheckpoint(
                eager=False
            )
        n_golden = golden_out.count()

    _write_state(args.state, next_version, united.df, ids, tokens_out,
                 golden=golden_out)

    out_clusters = spark.read.parquet(
        os.path.join(args.state, next_version, "clusters")
    )
    n_strings = out_clusters.count()
    n_groups = out_clusters.select("group").distinct().count()
    summary = {
        "version": next_version,
        "delta_strings": n_delta,
        "strings": n_strings,
        "groups": n_groups,
        "wall_sec": round(time.time() - t0, 2),
    }
    if n_golden is not None:
        summary["golden_rows"] = n_golden
        if n_refused is not None:
            summary["golden_refused_clusters"] = n_refused
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
