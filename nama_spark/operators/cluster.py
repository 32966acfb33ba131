"""Distributed connected components — the engine's transitive-clustering core.

Replaces the reference's sequential dict-rewrite union (nama/match_data.py:203-242,
:244-315) and its threshold-pass clustering (`_fast_unite_similar`,
nama/embedding_similarity/embeddings.py:144-174, whose result is exactly the
connected components of the ≥-threshold graph) with the alternating
large-star / small-star algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC'14) — O(log n) rounds, each a shuffle-bounded
groupBy + join, no driver-side state.

Scale notes:
- node ids are compared with plain column ordering, so the same code runs on
  string ids (repo names) or longs.
- `localCheckpoint()` every iteration cuts the exponentially growing lineage;
  on a real cluster use `checkpoint()` against a durable checkpoint dir
  (configurable via ``checkpoint_dir``) so the loop is resumable.
- convergence is detected with a count + order-insensitive xxhash64 checksum
  (one cheap aggregate per iteration, no exceptAll anti-join).
- per-iteration metrics (edge count, checksum, wall) are appended to an
  in-memory lineage log the caller can persist (plans.lineage).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set, canonical (u < v), self-loops dropped."""
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    return (
        edges.select(u.alias("u"), v.alias("v"))
        .where(F.col("u") != F.col("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    m = min(neighbors(u) ∪ {u}).

    No mid-round distinct: duplicate edges are harmless to the min
    aggregates, and _small_star's closing distinct canonicalizes the round's
    output — dropping the dedup here removes a full O(E)-row shuffle per
    iteration."""
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
    out = (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v"))


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge large→small; for each node u connect every smaller
    neighbor (and u itself) to m = min(smaller-neighbors ∪ {u})."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    out = oriented.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    out = out.union(mins.select(F.col("u"), F.col("m").alias("v")))
    return (
        out.where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # bit_xor is order-insensitive and cannot overflow (edges are distinct, so
    # xor-cancellation of duplicates is not a concern).
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _union_find_local(edge_rows) -> dict:
    """Driver-side union-find for the adaptive small-graph path."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for u, v in edge_rows:
        nodes.add(u)
        nodes.add(v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # min id becomes the root → deterministic component labels
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {x: find(x) for x in nodes}


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 40,
    checkpoint_dir: str | None = None,
    lineage: list | None = None,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Compute connected components of an undirected edge DataFrame.

    Returns (node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id of the component (deterministic).

    Adaptive execution: below ``small_graph_threshold`` edges the O(log n)
    shuffle rounds are pure scheduling latency, so the canonical edge set is
    collected and solved with driver-side union-find (same partition, same
    min-id labels) — the AQE-style small-side fast path. At data scale the
    iterative large-star/small-star path runs. The 100k default bounds the
    driver collect to ~10 MB of string pairs; raise it only with driver
    memory to spare (jobs/run_pipeline.py exposes --cc-driver-edge-cap).

    Callers with isolated nodes union them in afterwards (see
    ``labels_for_nodes``).
    """
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    e = _canonical_edges(edges, src, dst)
    e = e.checkpoint() if checkpoint_dir else e.localCheckpoint()
    prev = _checksum(e)
    _log(lineage, "cc", 0, prev[0], "edges", float(prev[0]))

    if prev[0] <= small_graph_threshold:
        rows = [(r["u"], r["v"]) for r in e.collect()]
        comp = _union_find_local(rows)
        _log(lineage, "cc", 1, len(comp), "small_graph_union_find", 1.0)
        if not comp:
            return spark.createDataFrame([], e.schema).select(
                F.col("u").alias("node"), F.col("v").alias("component")
            )
        out = spark.createDataFrame(
            list(comp.items()), ["node", "component"]
        )
        return out

    for it in range(1, max_iter + 1):
        t0 = time.time()
        e2 = _small_star(_large_star(e))
        e2 = e2.checkpoint() if checkpoint_dir else e2.localCheckpoint()
        cur = _checksum(e2)
        e.unpersist()
        e = e2
        _log(lineage, "cc", it, cur[0], "wall_sec", time.time() - t0)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} iters")

    # At convergence edges are stars (node → component-min). Roots map to
    # themselves.
    labels = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    # A root never appears as v with a different u at convergence, so this
    # union is disjoint except roots; drop duplicates defensively.
    return labels.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def labels_for_nodes(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "string",
    **cc_kwargs,
) -> DataFrame:
    """(node, component) for EVERY node in ``nodes`` — isolated nodes become
    their own singleton component (the reference's singleton-start invariant,
    match_data.py:123-126)."""
    comp = connected_components(edges, **cc_kwargs)
    n = nodes.select(F.col(node_col).alias("node")).distinct()
    return n.join(comp, "node", "left").select(
        F.col("node"),
        F.coalesce(F.col("component"), F.col("node")).alias("component"),
    )


def _log(lineage, stage, iteration, rows, metric, value):
    if lineage is not None:
        lineage.append(
            {
                "stage": stage,
                "iteration": iteration,
                "rows": rows,
                "metric": metric,
                "value": float(value),
            }
        )
