"""Model-based quality classifier (operators/classifier.py): relational
logistic regression over hashed bag-of-words, plus the integer-exact
NB-share scorer the oracles use."""

import math

import pytest
from pyspark.sql import functions as F

from nama_spark.operators.classifier import (
    hashed_token_features,
    logreg_fit,
    logreg_score,
    nb_share_score,
    nb_share_weights,
    quality_filter,
)


def _fixture_docs(spark):
    """40 separable docs: positives talk about science, negatives are
    casino spam; two held-out docs of each kind."""
    pos = [
        f"careful {w} analysis of the experiment results number {i}"
        for i, w in enumerate(
            ["thorough", "detailed", "rigorous", "novel", "replicated"] * 4
        )
    ]
    neg = [
        f"win big casino bonus jackpot click now offer {i}"
        for i in range(20)
    ]
    rows = [(i, t, 1) for i, t in enumerate(pos)] + [
        (100 + i, t, 0) for i, t in enumerate(neg)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_hashed_token_features_modes(spark):
    docs = spark.createDataFrame(
        [(1, "Alpha beta ALPHA"), (2, ""), (3, "   ")],
        ["doc_id", "text"],
    )
    sp = hashed_token_features(docs, n_features=1 << 10).collect()
    # case-folded: 'alpha' counted twice, one row per (doc, feature)
    assert {(r["doc_id"], r["x"]) for r in sp} == {(1, 2), (1, 1)}
    assert all(0 <= r["f"] < (1 << 10) for r in sp)
    # token-less docs produce no rows
    assert {r["doc_id"] for r in sp} == {1}

    md = hashed_token_features(docs, n_features=4096, hash="md5").collect()
    assert {(r["doc_id"], r["x"]) for r in md} == {(1, 2), (1, 1)}
    assert all(0 <= r["f"] < 4096 for r in md)
    # engine-portable index: first 4 md5 hex digits mod n
    exp = {int("0x" + __import__("hashlib").md5(t.encode()).hexdigest()[:4], 16) % 4096
           for t in ("alpha", "beta")}
    assert {r["f"] for r in md} == exp

    with pytest.raises(ValueError):
        hashed_token_features(docs, n_features=1 << 17, hash="md5")
    with pytest.raises(ValueError):
        hashed_token_features(docs, hash="sha")

    binary = hashed_token_features(docs, n_features=1 << 10, binary=True)
    assert {r["x"] for r in binary.collect()} == {1}


def test_logreg_fit_separates(spark):
    docs = _fixture_docs(spark)
    train = docs.where(F.col("doc_id") % 10 != 7)
    test = docs.where(F.col("doc_id") % 10 == 7)
    feats = hashed_token_features(train, n_features=1 << 12)
    weights, b = logreg_fit(
        feats, train.select("doc_id", "label"), n_iter=40, lr=1.0
    )
    scored = logreg_score(
        hashed_token_features(test, n_features=1 << 12), weights, b
    ).join(test.select("doc_id", "label"), "doc_id")
    rows = scored.collect()
    assert len(rows) == 4
    # perfect held-out separation on the separable fixture
    assert all((r["prob"] >= 0.5) == (r["label"] == 1) for r in rows)
    # signed weights: a clear spam token scores below a clear science token
    wmap = {r["f"]: r["w"] for r in weights.collect()}
    fmap = {
        r["__tok"]: r["f"]
        for r in spark.createDataFrame(
            [("casino",), ("experiment",)], ["__tok"]
        )
        .select("__tok", F.pmod(F.hash("__tok"), F.lit(1 << 12)).alias("f"))
        .collect()
    }
    assert wmap[fmap["casino"]] < 0 < wmap[fmap["experiment"]]


def test_logreg_score_matches_numpy(spark):
    docs = _fixture_docs(spark)
    feats = hashed_token_features(docs, n_features=1 << 12)
    weights, b = logreg_fit(
        feats, docs.select("doc_id", "label"), n_iter=5, lr=0.5
    )
    wmap = {r["f"]: r["w"] for r in weights.collect()}
    got = {r["doc_id"]: r["logit"] for r in logreg_score(feats, weights, b).collect()}
    exp = {}
    for r in feats.collect():
        exp[r["doc_id"]] = exp.get(r["doc_id"], b) + r["x"] * wmap.get(r["f"], 0.0)
    assert set(got) == set(exp)
    for k in got:
        assert got[k] == pytest.approx(exp[k], abs=1e-9)


def test_quality_filter_and_empty_docs(spark):
    docs = _fixture_docs(spark)
    feats = hashed_token_features(docs, n_features=1 << 12)
    weights, b = logreg_fit(
        feats, docs.select("doc_id", "label"), n_iter=40, lr=1.0
    )
    with_empty = docs.select("doc_id", "text").union(
        spark.createDataFrame([(999, "")], ["doc_id", "text"])
    )
    kept = quality_filter(
        with_empty, weights, b, min_prob=0.5, n_features=1 << 12
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids.issuperset(set(range(20))) and ids.isdisjoint(
        set(range(100, 120))
    )
    # the token-less doc falls back to the intercept-only prior
    assert (999 in ids) == (1.0 / (1.0 + math.exp(-b)) >= 0.5)
    assert kept.columns == ["doc_id", "text"]


def test_nb_share_weights_exact(spark):
    """Integer weights match a python-int oracle exactly, and the score
    separates the corpora by construction."""
    docs = _fixture_docs(spark)
    n = 4096
    feats = hashed_token_features(docs, n_features=n, hash="md5")
    target = feats.join(
        docs.where(F.col("label") == 1).select("doc_id"), "doc_id", "left_semi"
    )
    rest = feats.join(
        docs.where(F.col("label") == 0).select("doc_id"), "doc_id", "left_semi"
    )
    wdf = nb_share_weights(target, rest)
    # python oracle over collected counts
    tc, rc = {}, {}
    for r in target.collect():
        tc[r["f"]] = tc.get(r["f"], 0) + r["x"]
    for r in rest.collect():
        rc[r["f"]] = rc.get(r["f"], 0) + r["x"]
    exp = {
        f: (1000 * (tc.get(f, 0) + 1)) // (tc.get(f, 0) + rc.get(f, 0) + 2) - 500
        for f in set(tc) | set(rc)
    }
    got = {r["f"]: r["w_milli"] for r in wdf.collect()}
    assert got == exp

    scores = nb_share_score(feats, wdf).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    rows = scores.collect()
    pos = [r["logit_milli"] for r in rows if r["label"] == 1]
    neg = [r["logit_milli"] for r in rows if r["label"] == 0]
    assert min(pos) > 0 > max(neg)
    # n_toks is the document token count
    assert all(r["n_toks"] == 9 for r in rows if r["label"] == 0)


# ---------- DSIR importance resampling ----------

def _split_feats(spark, docs, n=4096):
    feats = hashed_token_features(docs, n_features=n, hash="md5")
    target = feats.join(
        docs.where(F.col("label") == 1).select("doc_id"), "doc_id", "left_semi"
    )
    raw = feats.join(
        docs.where(F.col("label") == 0).select("doc_id"), "doc_id", "left_semi"
    )
    return feats, target, raw


def test_dsir_weights_exact(spark):
    from nama_spark.operators.classifier import dsir_score, dsir_weights

    docs = _fixture_docs(spark)
    feats, target, raw = _split_feats(spark, docs)
    wdf = dsir_weights(target, raw)
    rows = wdf.collect()
    tc, rc = {}, {}
    for r in target.collect():
        tc[r["f"]] = tc.get(r["f"], 0) + r["x"]
    for r in raw.collect():
        rc[r["f"]] = rc.get(r["f"], 0) + r["x"]
    nt, nr, v = sum(tc.values()), sum(rc.values()), len(set(tc) | set(rc))
    for r in rows:
        ct, cr = tc.get(r["f"], 0), rc.get(r["f"], 0)
        exp_log2 = (
            math.log2((ct + 1) / (nt + v)) - math.log2((cr + 1) / (nr + v))
        )
        assert r["w_log2"] == pytest.approx(exp_log2, abs=1e-9)
        exp_hbits = ((ct + 1) ** 2).bit_length() - 1 - (
            ((cr + 1) ** 2).bit_length() - 1
        )
        assert r["w_hbits"] == exp_hbits
        assert (r["ct"], r["cr"]) == (ct, cr)

    scored = dsir_score(feats, wdf).join(
        docs.select("doc_id", "label"), "doc_id"
    ).collect()
    pos = [r["logit_log2"] for r in scored if r["label"] == 1]
    neg = [r["logit_log2"] for r in scored if r["label"] == 0]
    assert min(pos) > max(neg)
    posh = [r["logit_hbits"] for r in scored if r["label"] == 1]
    negh = [r["logit_hbits"] for r in scored if r["label"] == 0]
    assert min(posh) > max(negh)


def test_dsir_resample(spark):
    from nama_spark.operators.classifier import (
        dsir_resample,
        dsir_score,
        dsir_weights,
    )

    docs = _fixture_docs(spark)
    feats, target, raw = _split_feats(spark, docs)
    scored = dsir_score(feats, dsir_weights(target, raw)).localCheckpoint()

    a = {r["doc_id"] for r in dsir_resample(scored, 10, seed="s1").collect()}
    b = {r["doc_id"] for r in dsir_resample(scored, 10, seed="s1").collect()}
    c = {r["doc_id"] for r in dsir_resample(scored, 10, seed="s2").collect()}
    assert a == b and len(a) == 10
    assert c != a  # a different seed redraws the Gumbel noise
    # noise is id-keyed: partition layout cannot change the draw
    d = {
        r["doc_id"]
        for r in dsir_resample(scored.repartition(13), 10, seed="s1").collect()
    }
    assert d == a
    # T->0: deterministic top-k by length-normalized logit
    t0 = {
        r["doc_id"]
        for r in dsir_resample(scored, 10, temperature=0).collect()
    }
    byscore = sorted(
        scored.collect(),
        key=lambda r: (-r["logit_log2"] / max(r["n_toks"], 1), r["doc_id"]),
    )
    assert t0 == {r["doc_id"] for r in byscore[:10]}
    # importance sampling at T=1 still prefers the target-like docs
    assert sum(1 for i in a if i < 100) >= 8

    with pytest.raises(ValueError):
        dsir_resample(scored, 0)


# ---------- multiclass NB-share (trained lang-ID shape) ----------

def test_nb_share_multiclass(spark):
    from nama_spark.operators.classifier import (
        nb_share_classify,
        nb_share_multiclass_weights,
    )

    docs = spark.createDataFrame(
        [(i, "der hund läuft durch den wald heute", "de") for i in range(5)]
        + [(10 + i, "the dog runs through the forest today", "en")
           for i in range(5)]
        + [(20 + i, "le chien court dans la forêt aujourd'hui", "fr")
           for i in range(5)]
        # held out, unlabeled at fit time
        + [(90, "the dog runs again through the forest", None),
           (91, "der hund läuft wieder durch den wald", None)],
        ["doc_id", "text", "class"],
    )
    feats = hashed_token_features(docs, n_features=4096, hash="md5")
    weights = nb_share_multiclass_weights(
        feats, docs.where(F.col("class").isNotNull()).select("doc_id", "class")
    )
    assert set(r["class"] for r in weights.select("class").distinct().collect()) \
        == {"de", "en", "fr"}
    pred = {r["doc_id"]: r["class"]
            for r in nb_share_classify(feats, weights).collect()}
    # training docs classify to their own language, held-out follow vocab
    for i in range(5):
        assert pred[i] == "de" and pred[10 + i] == "en" and pred[20 + i] == "fr"
    assert pred[90] == "en" and pred[91] == "de"

    # integer-exactness: python oracle over collected counts
    ccf, cf = {}, {}
    labels = {r["doc_id"]: r["class"] for r in docs.collect()
              if r["class"] is not None}
    rows = feats.collect()
    for r in rows:
        if r["doc_id"] in labels:
            key = (labels[r["doc_id"]], r["f"])
            ccf[key] = ccf.get(key, 0) + r["x"]
            cf[r["f"]] = cf.get(r["f"], 0) + r["x"]
    exp_w = {(c, f): (1000 * (n + 1)) // (cf[f] + 2) - 500
             for (c, f), n in ccf.items()}
    got_w = {(r["class"], r["f"]): r["w_milli"] for r in weights.collect()}
    assert got_w == exp_w
