"""Measured evidence for the delta-CC path: folding a 5% edge delta into a
persisted assignment vs re-solving the full graph, at 1× and 10× scale.

The claim under test (cluster.connected_components_delta): a daily delta
costs O(Δ) + one broadcast relabel pass, so the gap vs a full recompute
must WIDEN with corpus size — that is the whole point of the operator at
10^12-file scale, where "re-run CC nightly" is not a plan.

Both paths run the distributed large-star/small-star code
(small_graph_threshold=0 — no driver fast path), equality of the resulting
partitions is asserted per scale (component count + order-insensitive
label checksum), and the base assignment is materialized to parquet before
timing starts (it is yesterday's state, not part of today's cost).

Usage: python tools/bench_delta_cc.py [edges_1x] [mult] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_edges(spark, n_edges: int, n_nodes: int, seed: int):
    from pyspark.sql import functions as F

    ids = spark.range(n_edges)
    return ids.select(
        F.concat(
            F.lit("n"),
            F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_nodes)),
        ).alias("src"),
        F.concat(
            F.lit("n"),
            F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(n_nodes)),
        ).alias("dst"),
    ).where(F.col("src") != F.col("dst"))


def partition_checksum(labels):
    from pyspark.sql import functions as F

    row = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("component").alias("k"),
        F.bit_xor(F.xxhash64("node", "component")).alias("x"),
    ).first()
    return (row["n"], row["k"], row["x"])


def main():
    edges_1x = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_json = sys.argv[3] if len(sys.argv) > 3 else None

    from nama_spark import get_spark
    from nama_spark.operators.cluster import (
        connected_components,
        connected_components_delta,
    )
    from pyspark.sql import functions as F

    spark = get_spark(
        "bench_delta_cc",
        cores=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    results = []
    for scale in (1, mult):
        m = edges_1x * scale
        n_nodes = int(m / 1.5)
        edges = synth_edges(spark, m, n_nodes, seed=42)
        is_delta = F.pmod(F.xxhash64("src", "dst", F.lit(7)), F.lit(20)) == 0
        tmp = tempfile.mkdtemp(prefix=f"delta_cc_{scale}x_")
        edges.where(~is_delta).write.mode("overwrite").parquet(tmp + "/base")
        edges.where(is_delta).write.mode("overwrite").parquet(tmp + "/delta")
        base = spark.read.parquet(tmp + "/base")
        delta = spark.read.parquet(tmp + "/delta")

        # yesterday's state: built and persisted OUTSIDE the timed region
        assign = connected_components(base, small_graph_threshold=0)
        assign.write.mode("overwrite").parquet(tmp + "/assign")
        assign = spark.read.parquet(tmp + "/assign")

        t0 = time.time()
        full = connected_components(
            base.unionByName(delta), small_graph_threshold=0
        )
        cs_full = partition_checksum(full)
        t_full = time.time() - t0

        t0 = time.time()
        inc = connected_components_delta(
            assign, delta, small_graph_threshold=0
        )
        cs_inc = partition_checksum(inc)
        t_inc = time.time() - t0

        assert cs_full == cs_inc, (cs_full, cs_inc)
        results.append({
            "scale": scale,
            "edges": m,
            "delta_edges": delta.count(),
            "t_full_cc_sec": round(t_full, 2),
            "t_delta_fold_sec": round(t_inc, 2),
            "speedup": round(t_full / t_inc, 1),
            "partitions_equal": True,
        })
        print(json.dumps(results[-1]))

    out = {"edges_1x": edges_1x, "mult": mult, "rows": results}
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
