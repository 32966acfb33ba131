"""Host scaling ceilings — what 2→8 cores can physically deliver on THIS box,
measured with workloads that contain no engine code:

- cpu: raw python busy-loop processes (pure compute, no Spark, no memory
  traffic) — the clock-throttle ceiling;
- shuffle_agg: Spark groupBy-count over 100M hashed longs (hash-aggregate
  build = random memory access; exchange through one local shuffle dir) —
  the ceiling for shuffle/aggregate-dominated plans;
- join: Spark 20M×20M equi-join on a hashed key — the ceiling for
  join-dominated plans.

Per-query scaling efficiencies in BENCH/BASELINE.md are graded AGAINST the
matched ceiling: a shuffle-bound operator measured at the shuffle ceiling is
scaling as well as the host allows; on a real cluster the same exchange
shards across per-node memory buses and disks instead of one.

Usage: python tools/host_ceiling.py [n_low] [n_high]  → prints one JSON line
and writes BENCH/host_ceiling.json.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _busy(n):
    x = 0
    for i in range(n):
        x += i * i
    return x


def cpu_ceiling(n_low: int, n_high: int, work: int = 30_000_000) -> dict:
    """Throughput of k parallel busy-loop processes, k = n_low then n_high."""
    out = {}
    for k in (n_low, n_high):
        t0 = time.time()
        with multiprocessing.Pool(k) as pool:
            pool.map(_busy, [work] * k)
        wall = time.time() - t0
        out[k] = k * work / wall
    return {
        "low": out[n_low],
        "high": out[n_high],
        "efficiency": (out[n_high] / out[n_low]) / (n_high / n_low),
    }


_SPARK_SNIPPET = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-bench-tmp")
from nama_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("ceil", cores={cpus!r}, shuffle_partitions=64,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
df = spark.range(100_000_000).select(F.pmod(F.xxhash64("id"), F.lit(5_000_000)).alias("k"))
df.count()
t0 = time.time()
df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).agg(F.sum("c")).collect()
t_shuffle = time.time() - t0
a = spark.range(20_000_000).select(F.pmod(F.xxhash64("id"), F.lit(10_000_000)).alias("k"))
b = spark.range(20_000_000).select(F.pmod(F.xxhash64("id"), F.lit(10_000_000)).alias("k"))
t0 = time.time()
a.join(b, "k").agg(F.count(F.lit(1))).collect()
t_join = time.time() - t0
print("CEIL", t_shuffle, t_join)
spark.stop()
"""


def spark_ceilings(n_low: int, n_high: int) -> dict:
    res = {}
    for cpus in (n_low, n_high):
        code = _SPARK_SNIPPET.format(repo=REPO, cpus=str(cpus))
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=1800,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("CEIL")]
        if not line:
            raise RuntimeError(out.stderr[-2000:])
        _, t_sh, t_j = line[0].split()
        res[cpus] = (float(t_sh), float(t_j))
    factor = n_high / n_low
    return {
        "shuffle_agg": {
            "t_low": res[n_low][0],
            "t_high": res[n_high][0],
            "efficiency": (res[n_low][0] / res[n_high][0]) / factor,
        },
        "join": {
            "t_low": res[n_low][1],
            "t_high": res[n_high][1],
            "efficiency": (res[n_low][1] / res[n_high][1]) / factor,
        },
    }


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    os.makedirs("/dev/shm/spark-bench-tmp", exist_ok=True)
    out = {
        "n_low": n_low,
        "n_high": n_high,
        "cpu": cpu_ceiling(n_low, n_high),
        **spark_ceilings(n_low, n_high),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "host_ceiling.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
