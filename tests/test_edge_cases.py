"""Degenerate-input behavior: empty universes, singletons, and
normalize-to-nothing strings must flow through every operator family without
crashing — at 100 TB an empty partition, an empty daily delta, or a filter
that matches nothing is routine, not exceptional."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from nama_spark.operators.matchdata import MatchData

NAMES = StructType([StructField("string", StringType())])
DOCS = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)
EMB = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_empty_universe_through_matchdata_and_tokensim(spark):
    from nama_spark.operators.token_similarity import TokenSimilarity

    md = MatchData.from_unmatched(_empty(spark, NAMES))
    assert md.df.count() == 0
    assert md.to_df().count() == 0
    ts = TokenSimilarity()
    ts.fit(md.df.select("string"))
    out = ts.predict(md, threshold=0.5)
    assert out.df.count() == 0


def test_single_string_universe(spark):
    from nama_spark.operators.token_similarity import TokenSimilarity

    md = MatchData.from_unmatched(
        spark.createDataFrame([("acme corp",)], ["string"])
    )
    ts = TokenSimilarity()
    ts.fit(md.df.select("string"))
    rows = ts.predict(md, threshold=0.5).df.collect()
    assert len(rows) == 1
    assert rows[0]["group"] is not None


def test_empty_documents_through_dedup_family(spark):
    from nama_spark.operators.dedup import (
        exact_dup_groups,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
        winnow_near_pairs,
        word_shingles,
    )

    docs = _empty(spark, DOCS)
    assert word_shingles(docs).count() == 0
    assert exact_dup_groups(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0
    assert minhash_lsh_pairs(docs).count() == 0
    assert simhash_near_pairs(docs).count() == 0
    assert winnow_near_pairs(docs).count() == 0


def test_empty_embeddings_through_ann(spark):
    from nama_spark.operators.ann import cosine_topk_bruteforce, ivf_topk, lsh_topk

    emb = _empty(spark, EMB)
    assert cosine_topk_bruteforce(emb, emb, k=5).count() == 0
    assert lsh_topk(emb, emb, k=5).count() == 0
    assert ivf_topk(emb, emb, k=5).count() == 0


def test_ivf_corpus_smaller_than_cells(spark):
    """k-means throws when k > points — ivf_topk must clamp, not crash."""
    from nama_spark.operators.ann import ivf_topk

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        ["vec_id", "embedding"],
    )
    out = ivf_topk(emb, emb, k=2, n_cells=16, nprobe=16).collect()
    assert len(out) > 0


def test_empty_universe_through_embedding_lsh(spark):
    from pyspark.sql.types import ArrayType, DoubleType

    from nama_spark.operators.embed import lsh_candidates

    emb = _empty(
        spark,
        StructType(
            [
                StructField("string", StringType()),
                StructField("vec", ArrayType(DoubleType())),
            ]
        ),
    )
    assert lsh_candidates(emb, 0.8).count() == 0


def test_empty_events_through_sessionize(spark):
    from nama_spark.streaming.stateful import sessionize_capped
    from nama_spark.streaming.windows import sessionize, sessionize_window

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    ev = _empty(spark, schema)
    assert sessionize(ev).count() == 0
    assert sessionize_window(ev).count() == 0
    assert sessionize_capped(ev).count() == 0


def test_single_event_session(spark):
    from datetime import datetime

    from nama_spark.streaming.stateful import sessionize_capped

    ev = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 12, 0, 0), 7, 1.0)],
        ["event_id", "ts", "user_id", "value"],
    )
    rows = sessionize_capped(ev, max_events=1).collect()
    assert len(rows) == 1
    assert rows[0]["n_events"] == 1 and rows[0]["session_seq"] == 1


def test_linkage_disjoint_token_spaces(spark):
    from nama_spark.operators.linkage import link_tables

    left = spark.createDataFrame([("alpha beta",), ("gamma delta",)], ["string"])
    right = spark.createDataFrame([("epsilon zeta",)], ["string"])
    assert link_tables(left, right, threshold=0.1).count() == 0


def test_all_strings_normalize_to_empty(spark):
    from nama_spark.functions.normalize import simplify

    md = MatchData.from_unmatched(
        spark.createDataFrame([("!!!",), ("???",), ("...",)], ["string"])
    )
    out = md.unite(simplify)
    # ''-keys never merge (the hottest key in any corpus by construction):
    # all three stay singletons
    assert out.df.select("group").distinct().count() == 3


def test_empty_edge_set_unite_is_identity(spark):
    md = MatchData.from_unmatched(
        spark.createDataFrame([("a",), ("b",)], ["string"])
    )
    edges = spark.createDataFrame(
        [], StructType([StructField("src", StringType()), StructField("dst", StringType())])
    )
    out = md.unite(edges)
    assert out.df.select("group").distinct().count() == 2


def test_sessionize_capped_random_with_ties(spark):
    """Seeded random events with many duplicate timestamps per user: the
    distributed fold must agree with a driver-side replay under the
    (ts, event_id) tie order."""
    import numpy as np
    from datetime import datetime, timedelta

    from nama_spark.streaming.stateful import sessionize_capped

    rng = np.random.default_rng(7)
    base = datetime(2026, 3, 1)
    rows = []
    eid = 0
    for u in range(40):
        t = 0
        for _ in range(int(rng.integers(1, 30))):
            # 30% exact ties, else gaps up to 2 h
            t += 0 if rng.random() < 0.3 else int(rng.integers(1, 7200))
            rows.append((eid, base + timedelta(seconds=t), u, 0.0))
            eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    got = {
        (r["user_id"], r["session_seq"]): r["n_events"]
        for r in sessionize_capped(ev, gap="30 minutes", max_events=4).collect()
    }
    want = {}
    per_user = {}
    for e, ts, u, _ in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        per_user.setdefault(u, []).append(ts)
    for u, ts_list in per_user.items():
        seq, n, last = 1, 0, None
        for ts in ts_list:
            if n > 0 and ((ts - last).total_seconds() > 1800 or n == 4):
                want[(u, seq)] = n
                seq, n = seq + 1, 0
            n, last = n + 1, ts
        want[(u, seq)] = n
    assert got == want


def test_sessionize_capped_sql_equals_fold(spark):
    """The relational capped-sessionize (windows-only, no Python) must agree
    with the fold-based form on the fixture AND on a tie-heavy random set."""
    import numpy as np
    from datetime import datetime, timedelta

    from nama_spark.streaming.stateful import (
        sessionize_capped,
        sessionize_capped_sql,
    )

    def as_set(df):
        return {
            (r["user_id"], r["session_seq"]): (
                r["session_start"], r["session_end"], r["n_events"]
            )
            for r in df.collect()
        }

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for cap in (1, 2, 3, 100):
        a = as_set(sessionize_capped(ev, gap="30 minutes", max_events=cap))
        b = as_set(sessionize_capped_sql(ev, gap="30 minutes", max_events=cap))
        assert a == b, cap

    rng = np.random.default_rng(11)
    base = datetime(2026, 4, 1)
    rows, eid = [], 0
    for u in range(25):
        t = 0
        for _ in range(int(rng.integers(1, 40))):
            t += 0 if rng.random() < 0.4 else int(rng.integers(1, 5400))
            rows.append((eid, base + timedelta(seconds=t), u, 0.0))
            eid += 1
    ev2 = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    a = as_set(sessionize_capped(ev2, gap="30 minutes", max_events=4))
    b = as_set(sessionize_capped_sql(ev2, gap="30 minutes", max_events=4))
    assert a == b


def test_empty_documents_through_text_ops(spark):
    from nama_spark.functions.text import chunk_documents, doc_keywords, pack_chunks

    docs = _empty(spark, DOCS)
    chunks = chunk_documents(docs)
    assert chunks.count() == 0
    assert pack_chunks(chunks).count() == 0
    assert doc_keywords(docs).count() == 0
