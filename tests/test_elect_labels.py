"""Round-6 optimization guards: the label-election contract (max count,
ties → min string, NULL counts last) and MatchData.unite's direct
component left-join must reproduce the round-5 semantics row-for-row."""

import pytest
from pyspark.sql import functions as F

from nama_spark.operators.matchdata import MatchData, elect_labels


@pytest.fixture(scope="module")
def fixture_df(spark):
    rows = [
        # max count wins
        ("alpha", 5, "g1"), ("beta", 3, "g1"), ("gamma", 5, "g1"),
        # tie on count -> lexicographically smallest string
        ("zeta", 2, "g2"), ("eta", 2, "g2"),
        # singleton
        ("solo", 1, "g3"),
        # skewed group: many members, one heavy
        *[(f"m{i:03d}", 1, "g4") for i in range(50)],
        ("heavy", 99, "g4"),
        # NULL count loses to any real count (desc ordering = NULLS LAST)
        ("nullc", None, "g5"), ("realc", 1, "g5"),
    ]
    return spark.createDataFrame(rows, ["string", "count", "group"]).select(
        "string", F.col("count").cast("long").alias("count"), "group"
    )


def test_election_contract(fixture_df):
    got = elect_labels(fixture_df)
    labels = {
        r["group"] for r in got.select("group").distinct().collect()
    }
    assert labels == {"alpha", "eta", "solo", "heavy", "realc"}
    # row multiplicity preserved
    assert got.count() == fixture_df.count()


def test_unite_direct_join_matches_semantics(spark):
    md = MatchData.from_unmatched(
        spark.createDataFrame(
            [("a",), ("b",), ("c",), ("d",), ("e",)], ["string"]
        )
    )
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["s0", "s1"])
    out = {
        (r["string"], r["group"])
        for r in md.unite(edges, small_graph_threshold=100_000).df.collect()
    }
    # a,b,c merge (label = min string at equal counts); d,e stay singletons
    assert out == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "e"),
    }


def test_unite_mapping_synthetic_labels_stripped(spark):
    # the mapping case routes through the same direct left join; synthetic
    # "\0label:" nodes must never surface as group labels
    md = MatchData.from_unmatched(
        spark.createDataFrame([("x",), ("y",), ("z",)], ["string"])
    )
    out = md.unite({"x": "L", "y": "L"})
    groups = {(r["string"], r["group"]) for r in out.df.collect()}
    assert groups == {("x", "x"), ("y", "x"), ("z", "z")}
