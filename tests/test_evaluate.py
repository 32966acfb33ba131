"""Property test: distributed confusion matrix / F1 ≡ an O(n²) brute-force
oracle on random matchers — the reference's own strongest test pattern
(scoring_test.py:8-66), reimplemented from the published formulas."""

import random
from itertools import combinations

import pytest

from nama_spark.operators.evaluate import (
    confusion_matrix,
    kfold_on_groups,
    score_predicted,
    split_on_groups,
)
from nama_spark.operators.matchdata import MatchData


def _naive_confusion(pred, gold, use_counts=True):
    """O(n²) oracle over shared strings: for every unordered string pair,
    weight = c0*c1 (or 1), bucket by pred/gold co-membership."""
    shared = sorted(set(pred) & set(gold))
    cells = {"TP": 0, "FP": 0, "FN": 0, "TN": 0}
    for s0, s1 in combinations(shared, 2):
        w = pred[s0][0] * pred[s1][0] if use_counts else 1
        same_pred = pred[s0][1] == pred[s1][1]
        same_gold = gold[s0][1] == gold[s1][1]
        if same_pred and same_gold:
            cells["TP"] += w
        elif same_pred:
            cells["FP"] += w
        elif same_gold:
            cells["FN"] += w
        else:
            cells["TN"] += w
    return cells


def _random_matcher(rng, strings):
    """string → (count, group_id)"""
    return {
        s: (rng.randint(1, 3), f"g{rng.randint(0, len(strings) // 3)}")
        for s in strings
    }


def _to_md(spark, d):
    df = spark.createDataFrame(
        [(s, c, g) for s, (c, g) in d.items()], ["string", "count", "group"]
    )
    return MatchData(df)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("use_counts", [True, False])
def test_confusion_matrix_matches_bruteforce(spark, seed, use_counts):
    rng = random.Random(seed)
    strings = [f"s{i:03d}" for i in range(80)]
    pred = _random_matcher(rng, strings)
    gold = _random_matcher(rng, strings)
    got = confusion_matrix(_to_md(spark, pred), _to_md(spark, gold), use_counts)
    want = _naive_confusion(pred, gold, use_counts)
    assert got == want


def test_score_predicted_perfect_match(spark):
    d = {"a": (2, "g1"), "b": (1, "g1"), "c": (3, "g2")}
    md = _to_md(spark, d)
    s = score_predicted(md, md)
    assert s["F1"] == 1.0 and s["precision"] == 1.0 and s["recall"] == 1.0
    assert s["coverage"] == pytest.approx(1.0)


def test_score_predicted_no_tp(spark):
    pred = _to_md(spark, {"a": (1, "a"), "b": (1, "b")})
    gold = _to_md(spark, {"a": (1, "g"), "b": (1, "g")})
    s = score_predicted(pred, gold)
    assert s["F1"] == 0 and s["precision"] == 0 and s["recall"] == 0


def test_split_on_groups_no_leakage(spark):
    rng = random.Random(7)
    d = _random_matcher(rng, [f"s{i}" for i in range(100)])
    md = _to_md(spark, d)
    a, b = split_on_groups(md, frac=0.5, seed=1)
    ga = {r["group"] for r in a.df.select("group").distinct().collect()}
    gb = {r["group"] for r in b.df.select("group").distinct().collect()}
    assert ga.isdisjoint(gb)
    assert a.df.count() + b.df.count() == md.df.count()


def test_kfold_on_groups_partitions(spark):
    rng = random.Random(9)
    d = _random_matcher(rng, [f"s{i}" for i in range(60)])
    md = _to_md(spark, d)
    seen = []
    for train, test in kfold_on_groups(md, k=3, seed=2):
        gtr = {r["group"] for r in train.df.select("group").distinct().collect()}
        gte = {r["group"] for r in test.df.select("group").distinct().collect()}
        assert gtr.isdisjoint(gte)
        seen.append(test.df.count())
    assert sum(seen) == md.df.count()


def test_blocking_stats(spark):
    """pair_completeness / reduction_ratio against a hand-computed case."""
    from nama_spark.operators.evaluate import blocking_stats
    from nama_spark.operators.matchdata import MatchData

    gold = MatchData(
        spark.createDataFrame(
            [("a", 1, "g1"), ("b", 1, "g1"), ("c", 1, "g1"),
             ("d", 1, "g2"), ("e", 1, "g2"), ("f", 1, "g3")],
            ["string", "count", "group"],
        ),
        _relabel=False,
    )
    # gold pairs: C(3,2) + C(2,2-ish) = 3 + 1 = 4; universe C(6,2) = 15
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("a", "f")], ["s0", "s1"]
    )
    s = blocking_stats(pairs, gold)
    assert s["n_strings"] == 6
    assert s["n_gold_pairs"] == 4
    assert s["n_candidates"] == 4
    # retained gold pairs: ab, bc, de (af crosses groups) → 3/4
    assert s["pair_completeness"] == 0.75
    assert abs(s["reduction_ratio"] - (1 - 4 / 15)) < 1e-12


def test_blocking_scheme_stats_vs_bruteforce(spark):
    import random

    from pyspark.sql import functions as F

    from nama_spark.operators.block import blocking_scheme_stats

    rng = random.Random(5)
    recs = [(i, rng.randrange(4), rng.randrange(3)) for i in range(80)]
    gold = [(i, i + 1) for i in range(0, 79, 2)]
    rdf = spark.createDataFrame(recs, ["id", "ka", "kb"])
    gdf = spark.createDataFrame(gold, ["id0", "id1"])
    keys = {
        "a": lambda df: F.col("ka").cast("string"),
        "b": lambda df: F.col("kb").cast("string"),
        "ab": lambda df: F.concat_ws("|", "ka", "kb"),
    }
    got = {r["scheme"]: r.asDict() for r in
           blocking_scheme_stats(rdf, gdf, keys).collect()}

    n = len(recs)
    total = n * (n - 1) // 2
    key_fns = {"a": lambda r: str(r[1]), "b": lambda r: str(r[2]),
               "ab": lambda r: f"{r[1]}|{r[2]}"}
    by_id = {r[0]: r for r in recs}
    for name, kf in key_fns.items():
        from collections import Counter
        blocks = Counter(kf(r) for r in recs)
        cand = sum(v * (v - 1) // 2 for v in blocks.values())
        covered = sum(1 for a, b in gold if kf(by_id[a]) == kf(by_id[b]))
        row = got[name]
        assert row["n_blocks"] == len(blocks)
        assert row["max_block"] == max(blocks.values())
        assert row["cand_pairs"] == cand
        assert row["covered_matches"] == covered
        assert row["n_gold"] == len(gold)
        assert row["pc_milli"] == (1000 * covered) // len(gold)
        assert row["rr_milli"] == 1000 - (1000 * cand) // total


def test_blocking_scheme_stats_null_keys_excluded(spark):
    from pyspark.sql import functions as F

    from nama_spark.operators.block import blocking_scheme_stats

    rdf = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, None)], ["id", "k"])
    gdf = spark.createDataFrame([(1, 2), (2, 3)], ["id0", "id1"])
    row = blocking_scheme_stats(
        rdf, gdf, {"k": lambda df: F.col("k")}).first()
    # record 3 drops out of blocking AND of the gold denominator
    assert row["n_blocks"] == 1 and row["cand_pairs"] == 1
    assert row["n_gold"] == 1 and row["covered_matches"] == 1
    assert row["pc_milli"] == 1000
