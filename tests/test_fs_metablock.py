"""Fellegi–Sunter linkage, B-cubed evaluation, meta-blocking."""

import math

import pytest
from pyspark.sql import functions as F

from nama_spark.operators.fellegi_sunter import (
    em_fit,
    match_probability,
    match_weights,
    milli_weights,
    pattern_counts,
)


PLANTED = {
    "gx": {0: (0.10, 0.80), 1: (0.90, 0.20)},
    "gy": {0: (0.05, 0.70), 1: (0.15, 0.20), 2: (0.80, 0.10)},
    "gz": {0: (0.20, 0.90), 1: (0.80, 0.10)},
}
LAM = 0.2
LEVELS = {"gx": 2, "gy": 3, "gz": 2}


def _planted_pattern_rows(n_total=1_000_000):
    """Exact expected pattern counts under the planted FS model — EM on the
    exact mixture must recover the generator."""
    rows = []
    for x in range(2):
        for y in range(3):
            for z in range(2):
                pm = LAM
                pu = 1.0 - LAM
                for c, l in zip(("gx", "gy", "gz"), (x, y, z)):
                    m, u = PLANTED[c][l]
                    pm *= m
                    pu *= u
                rows.append(
                    {"gx": x, "gy": y, "gz": z,
                     "n_pairs": round(n_total * (pm + pu))}
                )
    return rows


def test_em_recovers_planted_params():
    lam, params = em_fit(
        _planted_pattern_rows(), ["gx", "gy", "gz"], LEVELS, iters=300
    )
    assert abs(lam - LAM) < 0.02
    for c, levels in PLANTED.items():
        for l, (m, u) in levels.items():
            assert abs(params[c][l][0] - m) < 0.05, (c, l, params[c][l])
            assert abs(params[c][l][1] - u) < 0.05, (c, l, params[c][l])


def test_pattern_counts_and_match_weights(spark):
    pairs = spark.createDataFrame(
        [(1, 1, 2, 1), (2, 1, 2, 1), (3, 0, 0, 0), (4, 1, 0, 1)],
        ["pair_id", "gx", "gy", "gz"],
    )
    pc = {tuple(r[c] for c in ("gx", "gy", "gz")): r["n_pairs"]
          for r in pattern_counts(pairs, ["gx", "gy", "gz"]).collect()}
    assert pc == {(1, 2, 1): 2, (0, 0, 0): 1, (1, 0, 1): 1}

    w = milli_weights(PLANTED)
    out = {r["pair_id"]: r["weight_milli"]
           for r in match_weights(pairs, PLANTED, ["gx", "gy", "gz"]).collect()}
    for pid, gx, gy, gz in [(1, 1, 2, 1), (3, 0, 0, 0), (4, 1, 0, 1)]:
        expect = w["gx"][gx] + w["gy"][gy] + w["gz"][gz]
        assert out[pid] == expect
    # milli weights are the rounded log2 Bayes factors
    assert w["gx"][1] == round(1000 * math.log2(0.90 / 0.20))


def test_match_probability_monotone_and_calibrated(spark):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate([-15000, -1000, 0, 1000, 15000])],
        ["i", "weight_milli"],
    )
    rows = match_probability(df, lam=0.2).orderBy("weight_milli").collect()
    ps = [r["p_match"] for r in rows]
    assert ps == sorted(ps)
    # w = 0 → Bayes factor 1 → posterior equals the prior
    assert abs(ps[2] - 0.2) < 1e-12
    assert ps[0] < 0.02 and ps[-1] > 0.98


def test_em_end_to_end_separates_on_spark(spark):
    """Full chain on generated pairs: seeded per-pair levels from the
    planted model → pattern_counts → em_fit → match_weights; matched pairs
    must score above non-matched ones."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(4000):
        is_match = rng.random() < LAM
        levels = {}
        for c, n in LEVELS.items():
            u01 = rng.random()
            acc = 0.0
            for l in range(n):
                acc += PLANTED[c][l][0] if is_match else PLANTED[c][l][1]
                if u01 <= acc or l == n - 1:
                    levels[c] = l
                    break
        rows.append((i, is_match, levels["gx"], levels["gy"], levels["gz"]))
    df = spark.createDataFrame(rows, ["i", "is_match", "gx", "gy", "gz"])
    pc = pattern_counts(df, ["gx", "gy", "gz"])
    lam, params = em_fit(pc, ["gx", "gy", "gz"], LEVELS, iters=200)
    assert abs(lam - LAM) < 0.05
    scored = match_probability(
        match_weights(df, params, ["gx", "gy", "gz"]), lam
    )
    agg = scored.groupBy("is_match").agg(F.avg("p_match").alias("p")).collect()
    p = {r["is_match"]: r["p"] for r in agg}
    assert p[True] > 0.6 > 0.25 > p[False]


def _md(spark, rows):
    from tests.conftest import md_from_rows

    return md_from_rows(spark, rows)


def test_bcubed_hand_computed(spark):
    from nama_spark.operators.evaluate import bcubed, bcubed_df

    pred = _md(spark, [(s, 1, g) for s, g in
                       [("1", "a"), ("2", "a"), ("3", "a"), ("4", "b"), ("5", "b")]])
    gold = _md(spark, [(s, 1, g) for s, g in
                       [("1", "x"), ("2", "x"), ("3", "y"), ("4", "y"), ("5", "y")]])
    per = {r["string"]: r for r in bcubed_df(pred, gold).collect()}
    assert (per["1"]["na"], per["1"]["ng"], per["1"]["nab"]) == (3, 2, 2)
    assert abs(per["3"]["p"] - 1 / 3) < 1e-12
    assert abs(per["3"]["r"] - 1 / 3) < 1e-12
    out = bcubed(pred, gold)
    assert abs(out["precision"] - 11 / 15) < 1e-12
    assert abs(out["recall"] - 11 / 15) < 1e-12
    assert abs(out["F1"] - 11 / 15) < 1e-12


def test_bcubed_perfect_and_counts(spark):
    from nama_spark.operators.evaluate import bcubed

    rows = [("a", 3, "g1"), ("b", 2, "g1"), ("c", 5, "g2")]
    md1 = _md(spark, rows)
    md2 = _md(spark, [("a", 3, "G"), ("b", 2, "G"), ("c", 5, "H")])
    out = bcubed(md1, md2, use_counts=True)
    assert out == {"precision": 1.0, "recall": 1.0, "F1": 1.0, "n": 10}
    # brute-force count-weighted check on an imperfect partition
    md3 = _md(spark, [("a", 3, "G"), ("b", 2, "H"), ("c", 5, "H")])
    out = bcubed(md1, md3, use_counts=True)
    # records a(3): C={a,b}=5, G={a}=3∩{a,b}→nab=3 → p=3/5, r=1
    # records b(2): C=5, G=5(g1), nab over C∩G... manual:
    # pred groups: g1={a,b}, g2={c}; gold: G={a}, H={b,c}
    # a: na=5, ng=3, nab=3 → p=.6 r=1 ; b: na=5, ng=7, nab=2 → p=2/5 r=2/7
    # c: na=5, ng=7, nab=5 → p=1 r=5/7
    p = (3 * 0.6 + 2 * 0.4 + 5 * 1.0) / 10
    r = (3 * 1.0 + 2 * 2 / 7 + 5 * 5 / 7) / 10
    assert abs(out["precision"] - p) < 1e-12
    assert abs(out["recall"] - r) < 1e-12


def test_metablock_weights_hand_computed(spark):
    from nama_spark.operators.block import metablock_weights

    assignments = spark.createDataFrame(
        [("a", "b1"), ("b", "b1"), ("a", "b2"), ("b", "b2"), ("c", "b2"),
         ("c", "b3"), ("d", "b3"),
         # purged: singleton block and an over-cap hot block
         ("e", "b_solo")] + [(f"h{i}", "hot") for i in range(20)],
        ["string", "block"],
    )
    edges = {(r["s0"], r["s1"]): r for r in
             metablock_weights(assignments, scheme="jaccard",
                               max_block_size=10).collect()}
    assert edges[("a", "b")]["cbs"] == 2
    assert edges[("a", "c")]["cbs"] == 1
    assert edges[("c", "d")]["cbs"] == 1
    assert ("e",) not in {k[:1] for k in edges}  # purged singleton
    assert not any(k[0].startswith("h") for k in edges)  # purged hot block
    # jaccard: a has blocks {b1,b2}, b {b1,b2} → 2/(2+2-2)=1
    assert abs(edges[("a", "b")]["weight"] - 1.0) < 1e-12
    # a {b1,b2}, c {b2,b3} → 1/(2+2-1)
    assert abs(edges[("a", "c")]["weight"] - 1 / 3) < 1e-12


def test_metablock_prune_wep_and_cnp(spark):
    from nama_spark.operators.block import metablock_prune, metablock_weights

    assignments = spark.createDataFrame(
        [("a", "b1"), ("b", "b1"), ("a", "b2"), ("b", "b2"), ("c", "b2"),
         ("c", "b3"), ("d", "b3")],
        ["string", "block"],
    )
    w = metablock_weights(assignments)
    # edges: (a,b) cbs 2; (a,c) 1; (b,c) 1; (c,d) 1 → mean 5/4 → WEP keeps (a,b)
    kept = metablock_prune(w, method="wep", weight_col="cbs").collect()
    assert {(r["s0"], r["s1"]) for r in kept} == {("a", "b")}
    # CNP k=1: top edge per node — a:(a,b), b:(a,b), c: (a,c) wins the
    # cbs tie by partner asc, d:(c,d) → either-endpoint retain rule
    kept = metablock_prune(w, method="cnp", weight_col="cbs", k=1).collect()
    assert {(r["s0"], r["s1"]) for r in kept} == {("a", "b"), ("a", "c"), ("c", "d")}
    with pytest.raises(ValueError):
        metablock_prune(w, method="nope")


def test_mu_from_labels_exact_fractions(spark):
    from nama_spark.operators.fellegi_sunter import mu_from_labels

    # 4 matched pairs: gx levels (1,1,1,0); 6 non-matched: gx (1,0,0,0,0,0)
    rows = [(True, 1), (True, 1), (True, 1), (True, 0),
            (False, 1), (False, 0), (False, 0), (False, 0), (False, 0),
            (False, 0)]
    df = spark.createDataFrame(rows, ["label", "gx"])
    lam, params = mu_from_labels(df, "label", ["gx"], {"gx": 2})
    assert abs(lam - 0.4) < 1e-12
    assert abs(params["gx"][1][0] - 3 / 4) < 1e-12
    assert abs(params["gx"][1][1] - 1 / 6) < 1e-12
    assert abs(params["gx"][0][0] - 1 / 4) < 1e-12
    assert abs(params["gx"][0][1] - 5 / 6) < 1e-12
    with pytest.raises(ValueError):
        mu_from_labels(
            spark.createDataFrame([(True, 1)], ["label", "gx"]),
            "label", ["gx"], {"gx": 2},
        )


def test_rand_scores_known_partitions(spark):
    from nama_spark.operators.evaluate import rand_scores

    pred = _md(spark, [(s, 1, g) for s, g in
                       [("1", "a"), ("2", "a"), ("3", "a"), ("4", "b"), ("5", "b")]])
    gold = _md(spark, [(s, 1, g) for s, g in
                       [("1", "x"), ("2", "x"), ("3", "y"), ("4", "y"), ("5", "y")]])
    s = rand_scores(pred, gold, use_counts=False)
    # pairs: TP={12,45}, pred-same={12,13,23,45}→FP=2, gold-same={34,35,45,12}
    # →FN=2, total=10 → TN=4
    assert (s["TP"], s["FP"], s["FN"], s["TN"]) == (2, 2, 2, 4)
    assert abs(s["RI"] - 0.6) < 1e-12
    # ARI = 2(2·4 − 2·2)/((4)(6)+(4)(6)) = 8/48
    assert abs(s["ARI"] - 1 / 6) < 1e-12
    # identical partitions → ARI 1; ARI is 0-centred for independent ones
    s = rand_scores(pred, pred, use_counts=False)
    assert s["ARI"] == 1.0 and s["RI"] == 1.0


def test_golden_records_rules(spark):
    from nama_spark.operators.fusion import golden_records

    rows = [
        ("g1", "aa", 5.0, "X"), ("g1", "bbb", 3.0, "Y"), ("g1", "cc", 4.0, "Y"),
        ("g2", "dddd", 1.0, "Z"),
    ]
    df = spark.createDataFrame(rows, ["grp", "name", "bal", "seg"])
    out = {r["group"]: r for r in golden_records(
        df, "grp",
        {"name": "longest", "bal": "max", "seg": "most_frequent"},
    ).collect()}
    assert out["g1"]["n_members"] == 3
    assert out["g1"]["name"] == "bbb"      # longest
    assert out["g1"]["bal"] == 5.0         # max
    assert out["g1"]["seg"] == "Y"         # mode (2 of 3)
    assert out["g2"]["name"] == "dddd" and out["g2"]["seg"] == "Z"

    # deterministic ties: equal lengths → greater value; equal counts → smaller value
    df = spark.createDataFrame(
        [("g", "ab", 1.0, "P"), ("g", "ba", 2.0, "Q")],
        ["grp", "name", "bal", "seg"])
    r = golden_records(
        df, "grp", {"name": "longest", "bal": "avg", "seg": "most_frequent"}
    ).collect()[0]
    assert r["name"] == "ba" and r["seg"] == "P"
    assert abs(r["bal"] - 1.5) < 1e-12

    # sum / min rules and unknown-rule guard
    r = golden_records(df, "grp", {"bal": "sum", "name": "min"}).collect()[0]
    assert r["bal"] == 3.0 and r["name"] == "ab"
    with pytest.raises(ValueError):
        golden_records(df, "grp", {"bal": "median"})


def test_golden_records_partition_invariant(spark):
    from nama_spark.operators.fusion import golden_records

    rows = [(f"g{i%7}", f"v{(i*13)%20:02d}", float(i % 11)) for i in range(500)]
    df = spark.createDataFrame(rows, ["grp", "val", "x"])
    rules = {"val": "most_frequent", "x": "max"}
    a = sorted(map(tuple, golden_records(df, "grp", rules).collect()))
    b = sorted(map(tuple, golden_records(
        df.repartition(17), "grp", rules).collect()))
    assert a == b


def test_fs_link_tables_unsupervised(spark):
    """FS linkage over messy two-table names: EM must put exact and
    near-exact pairs above threshold and junk pairs below, with no
    hand-picked score threshold."""
    from nama_spark.operators.fellegi_sunter import fs_link_tables

    # six name families — cross-family pairs never block together, same-
    # family non-matches share only the family token (low score), true
    # pairs share family + number (high score)
    words = ["acme", "orbit", "zenith", "quark", "nimbus", "vertex"]
    base = [f"{words[i % 6]} {i:03d}" for i in range(60)]
    left = spark.createDataFrame([(s,) for s in base], ["string"])
    right = spark.createDataFrame(
        [(s,) for s in base[:30]]                      # verbatim matches
        # near matches: a unique junk suffix per name (a SHARED suffix
        # token would outweigh the name tokens under the reference's
        # d==f weighting quirk and push near pairs below cross pairs)
        + [(f"{s} q{i}",) for i, s in enumerate(base[30:50])]
        + [(f"zzz unrelated {i}",) for i in range(10)],
        ["string"],
    )
    # exact pairs score ~1.0; near pairs converge to posterior ~0.83 on
    # this fixture (their pattern shares g_exact=0 with the cross mass)
    links, lam, params = fs_link_tables(left, right, threshold=0.8)
    got = {(r["s0"], r["s1"]) for r in links.collect()}
    for s in base[:30]:
        assert (s, s) in got
    for i, s in enumerate(base[30:50]):
        assert (s, f"{s} q{i}") in got
    assert not any("zzz" in s1 for _, s1 in got)
    assert 0.0 < lam < 1.0


def test_tf_adjusted_weights(spark):
    """Rare agreed values gain weight, common ones lose it, disagreements
    are untouched; adjustment matches the hand formula."""
    from nama_spark.operators.fellegi_sunter import (
        term_frequencies,
        tf_adjusted_weights,
    )

    recs = spark.createDataFrame(
        [("smith",)] * 8 + [("zyzmund",)] * 2, ["surname"]
    )
    tf = term_frequencies(recs, "surname")
    tfd = {r["value"]: r for r in tf.collect()}
    assert tfd["smith"]["n_value"] == 8 and abs(tfd["smith"]["tf"] - 0.8) < 1e-12
    u_bar = 0.8**2 + 0.2**2  # 0.68

    pairs = spark.createDataFrame(
        [(1, "smith", "smith", 1000), (2, "zyzmund", "zyzmund", 1000),
         (3, "smith", "zyzmund", 1000)],
        ["pid", "v0", "v1", "weight_milli"],
    )
    out = {r["pid"]: r for r in
           tf_adjusted_weights(pairs, tf, "v0", "v1").collect()}
    assert out[1]["tf_adj_milli"] == round(1000 * math.log2(u_bar / 0.8))
    assert out[2]["tf_adj_milli"] == round(1000 * math.log2(u_bar / 0.2))
    assert out[3]["tf_adj_milli"] == 0
    assert out[1]["tf_adj_milli"] < 0 < out[2]["tf_adj_milli"]
    for p in (1, 2, 3):
        assert (out[p]["weight_tf_milli"]
                == out[p]["weight_milli"] + out[p]["tf_adj_milli"])


# ---------------------------------------------------------------------------
# missing-data (null-level) handling
# ---------------------------------------------------------------------------


def test_null_aware_levels(spark):
    from pyspark.sql import functions as F

    from nama_spark.operators.fellegi_sunter import null_aware

    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), (None, "a"), ("a", None), (None, None)],
        ["x", "y"],
    )
    got = [r["g"] for r in df.select(null_aware(
        F.when(F.col("x") == F.col("y"), 1).otherwise(0),
        F.col("x"), F.col("y")).alias("g")).collect()]
    assert got == [1, 0, -1, -1, -1]


def test_match_weights_null_level_is_zero_evidence(spark):
    from nama_spark.operators.fellegi_sunter import match_weights, milli_weights

    params = {"g_a": {0: (0.05, 0.9), 1: (0.9, 0.05)},
              "g_b": {0: (0.1, 0.8), 1: (0.8, 0.1)}}
    w = milli_weights(params)
    df = spark.createDataFrame(
        [(1, 1, 1), (2, 1, -1), (3, -1, -1)], ["id", "g_a", "g_b"])
    got = {r["id"]: r["weight_milli"] for r in
           match_weights(df, params, ["g_a", "g_b"]).collect()}
    assert got[1] == w["g_a"][1] + w["g_b"][1]
    assert got[2] == w["g_a"][1]          # missing g_b contributes 0
    assert got[3] == 0                    # all comparisons missing


def test_em_fit_marginalizes_null_levels():
    """An always-missing comparison must not disturb the fit: em_fit over
    (g_a, g_b=-1) patterns returns the same lambda and g_a params as the
    fit without g_b at all."""
    from nama_spark.operators.fellegi_sunter import em_fit

    base = [((1,), 300.0), ((0,), 700.0)]
    rows1 = [{"g_a": g[0], "n_pairs": n} for g, n in base]
    lam1, p1 = em_fit(rows1, ["g_a"], {"g_a": 2}, iters=40)
    rows2 = [{"g_a": g[0], "g_b": -1, "n_pairs": n} for g, n in base]
    lam2, p2 = em_fit(rows2, ["g_a", "g_b"], {"g_a": 2, "g_b": 2}, iters=40)
    assert abs(lam1 - lam2) < 1e-12
    for l in (0, 1):
        assert abs(p1["g_a"][l][0] - p2["g_a"][l][0]) < 1e-12
        assert abs(p1["g_a"][l][1] - p2["g_a"][l][1]) < 1e-12


def test_em_fit_partial_nulls_reweight_observed_mass():
    """Pairs where a comparison is unobservable shift that comparison's
    m/u to the observed subset only — the estimate equals the fit on JUST
    the observed rows when the missingness is independent of class."""
    from nama_spark.operators.fellegi_sunter import em_fit

    # one fully-observed comparison drives class assignment; g_b is missing
    # on half of each pattern's mass
    rows = [
        {"g_a": 1, "g_b": 1, "n_pairs": 100.0},
        {"g_a": 1, "g_b": -1, "n_pairs": 100.0},
        {"g_a": 0, "g_b": 0, "n_pairs": 400.0},
        {"g_a": 0, "g_b": -1, "n_pairs": 400.0},
    ]
    lam, p = em_fit(rows, ["g_a", "g_b"], {"g_a": 2, "g_b": 2}, iters=60)
    rows_obs = [
        {"g_a": 1, "g_b": 1, "n_pairs": 100.0},
        {"g_a": 0, "g_b": 0, "n_pairs": 400.0},
    ]
    lam_o, p_o = em_fit(rows_obs, ["g_a", "g_b"], {"g_a": 2, "g_b": 2},
                        iters=60)
    for l in (0, 1):
        assert abs(p["g_b"][l][0] - p_o["g_b"][l][0]) < 1e-6
        assert abs(p["g_b"][l][1] - p_o["g_b"][l][1]) < 1e-6


def test_mu_from_labels_excludes_null_levels(spark):
    from fractions import Fraction

    from nama_spark.operators.fellegi_sunter import mu_from_labels

    rows = [
        # (g_a, label): 4 matches (one unobservable), 4 non-matches (one -1)
        (1, True), (1, True), (0, True), (-1, True),
        (0, False), (0, False), (1, False), (-1, False),
    ]
    df = spark.createDataFrame(rows, ["g_a", "label"])
    lam, params = mu_from_labels(df, "label", ["g_a"], {"g_a": 2})
    # lambda still counts ALL labeled pairs
    assert abs(lam - 0.5) < 1e-12
    # m/u normalized over the 3 OBSERVED rows per class
    assert abs(params["g_a"][1][0] - Fraction(2, 3)) < 1e-12
    assert abs(params["g_a"][0][0] - Fraction(1, 3)) < 1e-12
    assert abs(params["g_a"][1][1] - Fraction(1, 3)) < 1e-12
    assert abs(params["g_a"][0][1] - Fraction(2, 3)) < 1e-12


# ---------------------------------------------------------------------------
# incremental golden records
# ---------------------------------------------------------------------------


def test_golden_records_delta_equals_full_recompute(spark):
    """The delta contract: re-fusing only the changed clusters and carrying
    the rest yields EXACTLY the full recompute over the current records."""
    import random

    from nama_spark.operators.fusion import golden_records, golden_records_delta

    rng = random.Random(13)
    v1 = [(f"g{rng.randrange(12)}", f"name{i:03d}" + "x" * rng.randrange(4),
           rng.randrange(1000), rng.choice("ABC"))
          for i in range(120)]
    rules = {"name": "longest", "bal": "max", "seg": "most_frequent"}
    cols = ["grp", "name", "bal", "seg"]
    df1 = spark.createDataFrame(v1, cols)
    prev = golden_records(df1, "grp", rules).localCheckpoint()

    # day-2 churn: move some rows between clusters, add rows, drop rows
    v2 = []
    touched = set()
    for i, (g, n, b, s) in enumerate(v1):
        if i % 17 == 0:
            g2 = f"g{rng.randrange(12)}"
            touched |= {g, g2}
            v2.append((g2, n, b, s))
        elif i % 23 == 0:
            touched.add(g)          # dropped row
        else:
            v2.append((g, n, b, s))
    for i in range(10):             # arrivals
        g = f"g{rng.randrange(12)}"
        touched.add(g)
        v2.append((g, f"new{i:02d}", rng.randrange(1000), rng.choice("ABC")))
    df2 = spark.createDataFrame(v2, cols)
    changed = spark.createDataFrame([(g,) for g in sorted(touched)], ["group"])

    got = {r["group"]: tuple(r) for r in
           golden_records_delta(prev, df2, "grp", rules, changed).collect()}
    want = {r["group"]: tuple(r) for r in
            golden_records(df2, "grp", rules).collect()}
    assert got == want


def test_golden_records_delta_superset_of_changed_is_safe(spark):
    """Passing MORE groups than actually changed (a conservative caller)
    still equals the full recompute."""
    from pyspark.sql import functions as F

    from nama_spark.operators.fusion import golden_records, golden_records_delta

    rows = [("a", "x", 1), ("a", "yy", 2), ("b", "zzz", 3)]
    rules = {"name": "longest", "bal": "max"}
    df = spark.createDataFrame(rows, ["grp", "name", "bal"])
    prev = golden_records(df, "grp", rules)
    all_groups = df.select(F.col("grp").alias("group")).distinct()
    got = {r["group"]: tuple(r) for r in
           golden_records_delta(prev, df, "grp", rules, all_groups).collect()}
    want = {r["group"]: tuple(r) for r in
            golden_records(df, "grp", rules).collect()}
    assert got == want
