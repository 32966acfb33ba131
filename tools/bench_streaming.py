"""Streaming micro-bench: sustained rows/sec and per-batch wall for the two
foreachBatch incremental paths (corpus dedup vs the persisted band index;
incremental ER via predict_incremental) over ≥20 micro-batches.

The batch twins' correctness is pytest-proven (test_dataops.py); this
harness puts a NUMBER on the incremental story: per-batch cost should stay
roughly flat as the accumulated state grows (the O(Δn·band) / O(Δn·block)
claims), not grow with the corpus.

Per-batch wall = drop one source file, then processAllAvailable() — the
measured region is the full micro-batch drain (source discovery + state
load + band join / incremental predict + decisions + state write), i.e.
what a production trigger pays end to end.

Usage: python tools/bench_streaming.py [n_batches] [rows_per_batch]
Writes BENCH/streaming.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _drop_parquet_file(df, src_dir: str, name: str, tmp_root: str) -> None:
    import glob

    tmp = os.path.join(tmp_root, f"__w_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], os.path.join(src_dir, name))


def bench_streaming_dedup(spark, n_batches: int, rows_per_batch: int) -> dict:
    """Docs arrive in n_batches; ~30% duplicate an earlier doc. Reports
    per-batch wall + sustained rows/sec through the band-index path."""
    from pyspark.sql import functions as F

    from nama_spark.streaming import dedup as sd

    root = tempfile.mkdtemp(prefix="stream_dedup_bench_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    state = os.path.join(root, "state")
    dec = os.path.join(root, "dec")
    ckpt = os.path.join(root, "ckpt")

    def batch_df(i: int):
        base = i * rows_per_batch
        return spark.range(base, base + rows_per_batch).select(
            F.col("id").alias("doc_id"),
            F.when(
                (F.col("id") % 10 < 3) & (F.col("id") >= rows_per_batch),
                # ~30% repeat an earlier doc's text verbatim
                F.concat(
                    F.lit("common document body number "),
                    (F.col("id") % rows_per_batch).cast("string"),
                    F.lit(" lorem ipsum dolor sit amet consectetur"),
                ),
            ).otherwise(
                F.concat(
                    F.lit("common document body number "),
                    F.col("id").cast("string"),
                    F.lit(" lorem ipsum dolor sit amet consectetur"),
                )
            ).alias("text"),
        )

    schema = batch_df(0).schema
    walls: list[float] = []

    q = sd.streaming_dedup_corpus(
        spark, src, schema, state, dec,
        checkpoint_dir=ckpt, max_files_per_trigger=1,
    )
    try:
        for i in range(n_batches):
            df = batch_df(i)
            _drop_parquet_file(df, src, f"b{i:04d}.parquet", root)
            t0 = time.time()
            q.processAllAvailable()
            walls.append(time.time() - t0)
    finally:
        q.stop()

    import glob as _glob

    kept = (
        spark.read.parquet(*sorted(_glob.glob(dec + "/b*")))
        .where("keep").count()
    )
    shutil.rmtree(root, ignore_errors=True)
    total_rows = n_batches * rows_per_batch
    steady = sorted(walls[2:])  # drop warmup batches
    return {
        "path": "streaming_dedup_corpus",
        "n_batches": n_batches,
        "rows_per_batch": rows_per_batch,
        "rows_total": total_rows,
        "kept": int(kept),
        "wall_total_sec": round(sum(walls), 2),
        "rows_per_sec": round(total_rows / sum(walls), 1),
        "batch_wall_first3": [round(w, 2) for w in walls[:3]],
        "batch_wall_last3": [round(w, 2) for w in walls[-3:]],
        "batch_wall_median": round(steady[len(steady) // 2], 2) if steady else None,
        "batch_wall_max": round(max(walls), 2),
        # flat-cost evidence: late batches vs early batches (state 10× bigger)
        "late_over_early": round(
            (sum(walls[-5:]) / 5) / max(sum(walls[2:7]) / 5, 1e-9), 2
        ) if n_batches >= 12 else None,
    }


def bench_streaming_er(spark, n_batches: int, rows_per_batch: int) -> dict:
    """Names arrive in n_batches; each batch is new variants of a shared stem
    universe, driving predict_incremental against the versioned state."""
    from pyspark.sql import functions as F

    from nama_spark.streaming.er import streaming_unite_names

    root = tempfile.mkdtemp(prefix="stream_er_bench_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    state = os.path.join(root, "state")
    ckpt = os.path.join(root, "ckpt")

    def batch_df(i: int):
        base = i * rows_per_batch
        return spark.range(base, base + rows_per_batch).select(
            F.concat(
                F.lit("entity "),
                (F.col("id") % (rows_per_batch * 2)).cast("string"),
                F.lit(" variant "),
                (F.col("id") % 7).cast("string"),
            ).alias("string")
        )

    schema = batch_df(0).schema
    walls: list[float] = []
    q = streaming_unite_names(
        spark, src, schema, state, threshold=0.5, checkpoint_dir=ckpt,
        max_files_per_trigger=1,
    )
    try:
        for i in range(n_batches):
            _drop_parquet_file(batch_df(i), src, f"b{i:04d}.parquet", root)
            t0 = time.time()
            q.processAllAvailable()
            walls.append(time.time() - t0)
    finally:
        q.stop()
    shutil.rmtree(root, ignore_errors=True)
    total_rows = n_batches * rows_per_batch
    steady = sorted(walls[2:])
    return {
        "path": "streaming_unite_names",
        "n_batches": n_batches,
        "rows_per_batch": rows_per_batch,
        "rows_total": total_rows,
        "wall_total_sec": round(sum(walls), 2),
        "rows_per_sec": round(total_rows / sum(walls), 1),
        "batch_wall_first3": [round(w, 2) for w in walls[:3]],
        "batch_wall_last3": [round(w, 2) for w in walls[-3:]],
        "batch_wall_median": round(steady[len(steady) // 2], 2) if steady else None,
        "batch_wall_max": round(max(walls), 2),
        "late_over_early": round(
            (sum(walls[-5:]) / 5) / max(sum(walls[2:7]) / 5, 1e-9), 2
        ) if n_batches >= 12 else None,
    }


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from nama_spark.session import get_spark

    spark = get_spark(
        "nama_spark_stream_bench",
        cores=os.environ.get("SPARK_GRAFT_CPUS", "8"),
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out = {
        "dedup": bench_streaming_dedup(spark, n_batches, rows_per_batch),
        # ER at two batch sizes: the per-batch wall is a FIXED job-chain
        # floor (~4 s on this host — scheduling latency across the
        # incremental DAG's stages, measured flat as state grows), so
        # sustained rows/sec scales with batch size; the 200-row point
        # tracks the floor, the 1000-row point the amortized throughput
        "er": bench_streaming_er(spark, n_batches,
                                 max(rows_per_batch // 10, 100)),
        "er_1k": bench_streaming_er(spark, n_batches,
                                    max(rows_per_batch // 2, 500)),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "streaming.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
