"""Property tests: distributed large-star/small-star connected components vs
networkx.connected_components on random edge sets (SURVEY.md §5 test plan)."""

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from nama_spark.operators.cluster import connected_components, labels_for_nodes


def _nx_components(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    return {frozenset(c) for c in nx.connected_components(g)}


def _spark_components(spark, edges, threshold):
    df = spark.createDataFrame(edges, ["src", "dst"])
    labels = connected_components(df, small_graph_threshold=threshold)
    out = {}
    for r in labels.collect():
        out.setdefault(r["component"], set()).add(r["node"])
    return {frozenset(v) for v in out.values()}


# threshold=0 forces the distributed large-star/small-star path;
# a big threshold takes the adaptive driver union-find fast path
@pytest.mark.parametrize("threshold", [0, 10**6])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_matches_networkx_random(spark, seed, threshold):
    rng = random.Random(seed)
    n, m = 300, 220
    nodes = [f"n{i:04d}" for i in range(n)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(m)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _spark_components(spark, edges, threshold) == _nx_components(edges)


@pytest.mark.parametrize("threshold", [0, 10**6])
def test_cc_chain_and_star(spark, threshold):
    # a long chain stresses the O(log n) contraction
    chain = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(60)]
    star = [("hub", f"leaf{i}") for i in range(20)]
    edges = chain + star + [("x1", "x2")]
    assert _spark_components(spark, edges, threshold) == _nx_components(edges)


@pytest.mark.parametrize("threshold", [0, 10**6])
def test_cc_component_label_is_min(spark, threshold):
    edges = [("b", "c"), ("c", "a"), ("z", "y")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, small_graph_threshold=threshold).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "y": "y", "z": "y"}


def test_labels_for_nodes_includes_isolated(spark):
    nodes = spark.createDataFrame([("a",), ("b",), ("solo",)], ["string"])
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in labels_for_nodes(nodes, edges).collect()
    }
    assert got == {"a": "a", "b": "a", "solo": "solo"}


def test_cc_lineage_metrics(spark):
    lineage = []
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    connected_components(edges, lineage=lineage).collect()
    assert any(e["metric"] == "edges" for e in lineage)
    assert any(e["stage"] == "cc" for e in lineage)
