"""Round-6 soft_tfidf_scores internals: the collected-corpus fast path
(driver df table + one mapInPandas pair stage) must reproduce the
relational plan's rows exactly — same V weights, same jw5 rounding, same
argmax tie-break, same round-5 outputs."""

import pytest
from pyspark.sql import functions as F

from nama_spark.operators import score as S


@pytest.fixture(scope="module")
def spark():
    from nama_spark.session import get_spark

    return get_spark("test_soft_tfidf_paths", cores=4, shuffle_partitions=8)


def _fixture(spark):
    corpus_names = [
        "acme data systems", "acme data solutions", "globex labs",
        "initech networks", "umbrella analytics", "acme", "data corp",
        "unmatched zq", "", "single",
    ]
    corpus = spark.createDataFrame(
        [(s,) for s in corpus_names], ["string"]
    )
    pairs = spark.createDataFrame(
        [
            ("Acme Data Systems", "acme data solutions"),
            ("globex labs", "globex lab"),
            ("initech networks", "umbrella analytics"),
            ("out of corpus name", "another unseen one"),
            ("acme", "acme"),
            ("", "acme"),
        ],
        ["s0", "s1"],
    )
    return pairs, corpus


def _rows(df):
    return sorted(
        (r["s0"], r["s1"], r["soft01"], r["soft10"], r["soft_sym"])
        for r in df.collect()
    )


def test_fast_and_relational_paths_agree_exactly(spark, monkeypatch):
    pairs, corpus = _fixture(spark)
    monkeypatch.setattr(S, "_SOFT_TFIDF_DRIVER_CORPUS_ROWS", 10**9)
    fast = _rows(S.soft_tfidf_scores(pairs, corpus))
    monkeypatch.setattr(S, "_SOFT_TFIDF_DRIVER_CORPUS_ROWS", -1)
    slow = _rows(S.soft_tfidf_scores(pairs, corpus))
    assert [r[:2] for r in fast] == [r[:2] for r in slow]
    for a, b in zip(fast, slow):
        assert a[2:] == pytest.approx(b[2:], abs=1e-9), (a, b)


def test_fast_path_identity_pair_scores_one(spark):
    pairs, corpus = _fixture(spark)
    out = {
        (r["s0"], r["s1"]): r["soft_sym"]
        for r in S.soft_tfidf_scores(pairs, corpus).collect()
    }
    assert out[("acme", "acme")] == pytest.approx(1.0)
    assert out[("", "acme")] == 0.0
