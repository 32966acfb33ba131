"""Physical-plan hygiene: the properties that keep the engine viable at
100 TB — column pruning to the scan, no accidental cartesian products in the
blocking/scoring path, broadcast for small dimension tables. Asserted against
the optimizer's actual output so regressions fail loudly."""

import pytest
from pyspark.sql import functions as F

from fixtures.make_fixtures import fixture_dataframes, make_fixture
from nama_spark.functions.tokenize import token_weights, tokens_table
from nama_spark.operators.block import eligible_tokens, token_block_pairs
from nama_spark.operators.matchdata import MatchData
from nama_spark.operators.score import token_similarity_scores_map


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def records_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "records.parquet")
    fx = make_fixture(seed=3, n_entities=20)
    records, _, _ = fixture_dataframes(spark, fx)
    records.write.mode("overwrite").parquet(p)
    return p


def test_content_column_pruned_from_name_aggregation(spark, records_parquet):
    """The 10^12-row table's huge `content` column must never reach the
    shuffle when aggregating to the name universe."""
    records = spark.read.parquet(records_parquet)
    names = records.groupBy(F.col("repo").alias("string")).agg(
        F.count(F.lit(1)).alias("count")
    )
    plan = _plan(names)
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "content" not in read_schema, read_schema
    assert "repo" in read_schema


def test_filter_pushdown_reaches_scan(spark, records_parquet):
    records = spark.read.parquet(records_parquet)
    q = records.where(F.col("lang") == "py").select("repo")
    plan = _plan(q)
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "lang" in pushed, pushed


def test_blocking_and_scoring_have_no_cartesian_product(spark):
    strings = [f"name {i} alpha beta" for i in range(50)]
    df = spark.createDataFrame([(s,) for s in strings], ["string"])
    toks = tokens_table(df)
    w = token_weights(toks)
    pairs = token_block_pairs(toks, eligible_tokens(w, 2, 100))
    scored = token_similarity_scores_map(pairs, toks, w)
    plan = _plan(scored)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_dfs_uses_equi_joins_only(spark):
    md = MatchData(
        spark.createDataFrame(
            [("a", 1, "g"), ("b", 1, "g")], ["string", "count", "group"]
        )
    )
    left = spark.createDataFrame([("a", 1)], ["k", "x"])
    right = spark.createDataFrame([("b", 2)], ["k", "y"])
    out = md.merge_dfs(left, right, left_on="k", right_on="k")
    plan = _plan(out)
    assert "CartesianProduct" not in plan


def test_confusion_df_has_no_group_windows(spark):
    """confusion_df must compute its per-group sums with groupBy aggregates
    joined back, never a Window over group_pred/group_gold — a window puts an
    entire mega-group into one task (guaranteed straggler when one giant
    cluster emerges from over-merging)."""
    from nama_spark.operators.evaluate import confusion_df

    pred = MatchData(
        spark.createDataFrame(
            [(f"s{i}", 1 + i % 3, f"p{i % 4}") for i in range(20)],
            ["string", "count", "group"],
        ),
        _relabel=False,
    )
    gold = MatchData(
        spark.createDataFrame(
            [(f"s{i}", 1, f"g{i % 5}") for i in range(20)],
            ["string", "count", "group"],
        ),
        _relabel=False,
    )
    df = confusion_df(pred, gold)
    plan = _plan(df)
    assert "Window" not in plan, plan


def test_small_weights_table_broadcast(spark):
    """The per-token weight table should end up broadcast into the scoring
    join rather than shuffled — AQE decides at runtime, so execute first and
    inspect the final adaptive plan."""
    strings = [f"name {i} alpha beta" for i in range(50)]
    df = spark.createDataFrame([(s,) for s in strings], ["string"])
    toks = tokens_table(df)
    w = token_weights(toks)
    pairs = token_block_pairs(toks, eligible_tokens(w, 2, 100))
    scored = token_similarity_scores_map(pairs, toks, w)
    scored.collect()
    final_plan = _plan(scored)
    assert "BroadcastHashJoin" in final_plan or "isFinalPlan=true" in final_plan


def test_new_operators_have_no_cartesian_product(spark):
    """Prefix join, winnowing pairs, and iter_scores (with min_score pushdown)
    must plan as equi-joins — never CartesianProduct/BroadcastNestedLoopJoin."""
    import math

    from nama_spark.functions.tokenize import token_weights, tokens_table
    from nama_spark.operators.block import prefix_filtered_pairs
    from nama_spark.operators.dedup import winnow_near_pairs

    strings = [f"name {i} alpha beta" for i in range(30)]
    df = spark.createDataFrame([(s,) for s in strings], ["string"])
    toks = tokens_table(df, tokenizer="words")
    w = token_weights(toks)
    plan = _plan(prefix_filtered_pairs(toks, w, 0.5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    docs = spark.createDataFrame(
        [(i, f"some shared text body {i % 3} tail") for i in range(20)],
        ["doc_id", "text"],
    )
    plan = _plan(winnow_near_pairs(docs, k=4, window=2, threshold=0.1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
