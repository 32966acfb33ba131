"""Measured evidence for the delta-fusion path: re-fusing a 5% cluster
churn via golden_records_delta vs a full golden_records recompute, at 1×
and 10× scale.

The claim under test (fusion.golden_records_delta): the delta fold costs
O(churned membership) + one anti-join over the entity-sized golden table,
so the gap vs a full re-fuse must WIDEN with corpus size — nightly
"re-fuse 10^8 entities" is not a plan; re-fuse the day's churn. Equality
of the resulting golden tables is asserted per scale (row count + an
order-insensitive checksum over every fused column).

Usage: python tools/bench_delta_fusion.py [rows_1x] [mult] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# four voted fields: every most_frequent rule is an EXTRA corpus-scale
# (cluster, value) aggregate + join in the full pass — the realistic fused
# schema (status/segment/category/source votes), and where the delta path's
# churn-only aggregation actually bites
RULES = {"name": "longest", "bal": "max",
         "seg": "most_frequent", "cat": "most_frequent",
         "src": "most_frequent", "sts": "most_frequent"}


def synth_records(spark, n_rows: int, n_groups: int, seed: int):
    from pyspark.sql import functions as F

    ids = spark.range(n_rows)
    return ids.select(
        F.concat(
            F.lit("g"),
            F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_groups)),
        ).alias("grp"),
        F.concat(
            F.lit("name"),
            F.col("id"),
            F.repeat(F.lit("x"), F.pmod(F.xxhash64("id", F.lit(seed + 1)),
                                        F.lit(5)).cast("int")),
        ).alias("name"),
        F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(100000)).alias("bal"),
        F.concat(
            F.lit("S"),
            F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(5)),
        ).alias("seg"),
        F.concat(
            F.lit("C"),
            F.pmod(F.xxhash64("id", F.lit(seed + 4)), F.lit(9)),
        ).alias("cat"),
        F.concat(
            F.lit("R"),
            F.pmod(F.xxhash64("id", F.lit(seed + 5)), F.lit(7)),
        ).alias("src"),
        F.concat(
            F.lit("T"),
            F.pmod(F.xxhash64("id", F.lit(seed + 6)), F.lit(3)),
        ).alias("sts"),
    )


def checksum(spark, df):
    from pyspark.sql import functions as F

    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    return df.select(
        F.bit_xor(F.xxhash64(F.concat_ws("|", *cols))).alias("x"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


def run_scale(spark, n_rows: int, scale: int, tmp: str):
    from pyspark.sql import functions as F

    from nama_spark.operators.fusion import golden_records, golden_records_delta

    n_groups = max(100, n_rows // 10)
    rec = synth_records(spark, n_rows, n_groups, seed=scale)
    rec_path = os.path.join(tmp, f"rec_{scale}")
    rec.write.mode("overwrite").parquet(rec_path)
    rec = spark.read.parquet(rec_path)

    # yesterday's golden state: materialized BEFORE timing (it is carried
    # state, not part of today's cost)
    prev_path = os.path.join(tmp, f"prev_{scale}")
    golden_records(rec, "grp", RULES).write.mode("overwrite").parquet(prev_path)
    prev = spark.read.parquet(prev_path)

    # today's churn: 5% of groups gain one arrival row each
    churn = rec.select("grp").distinct().where(
        F.pmod(F.xxhash64("grp", F.lit(scale + 7)), F.lit(20)) == 0
    )
    arrivals = churn.select(
        "grp",
        F.concat(F.lit("arrival"), F.col("grp")).alias("name"),
        F.lit(999999).cast("long").alias("bal"),
        F.lit("S0").alias("seg"),
        F.lit("C0").alias("cat"),
        F.lit("R0").alias("src"),
        F.lit("T0").alias("sts"),
    )
    today_path = os.path.join(tmp, f"today_{scale}")
    rec.unionByName(arrivals).write.mode("overwrite").parquet(today_path)
    today = spark.read.parquet(today_path)
    changed = churn.select(F.col("grp").alias("group"))
    n_changed = changed.count()

    t0 = time.time()
    full = golden_records(today, "grp", RULES)
    cs_full = checksum(spark, full)
    t_full = time.time() - t0

    t0 = time.time()
    delta = golden_records_delta(prev, today, "grp", RULES, changed)
    cs_delta = checksum(spark, delta)
    t_delta = time.time() - t0

    assert (cs_full["n"], cs_full["x"]) == (cs_delta["n"], cs_delta["x"]), (
        "delta != full", cs_full, cs_delta)
    return {
        "scale": scale,
        "rows": n_rows,
        "groups": n_groups,
        "changed_groups": n_changed,
        "t_full_fuse_sec": round(t_full, 2),
        "t_delta_fuse_sec": round(t_delta, 2),
        "speedup": round(t_full / t_delta, 1),
        "golden_equal": True,
    }


def main():
    rows_1x = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_json = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "BENCH", "delta_fusion.json")

    from nama_spark.session import get_spark

    spark = get_spark(
        "bench_delta_fusion", cores="32", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        rows.append(run_scale(spark, rows_1x, 1, tmp))
        rows.append(run_scale(spark, rows_1x * mult, mult, tmp))
    out = {"rows_1x": rows_1x, "mult": mult, "rows": rows}
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
