"""Training-corpus preparation operators (operators/corpus.py):
decontamination, temperature mixture sampling, deterministic shuffle-shard.

Each test checks the operator against a small from-spec python oracle, plus
the properties that matter at scale: determinism under repartitioning,
append-stability of sampling decisions, and exact shard balance.
"""
import hashlib

import pytest
from pyspark.sql import functions as F

from nama_spark.operators.corpus import (
    decontaminate,
    mixture_rates,
    ngram_overlap,
    sample_mixture,
    shuffle_shard,
)


def _u48(*parts) -> float:
    h = hashlib.md5(":".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:12], 16) / float(1 << 48)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # two docs sharing a long benchmark phrase, one clean, one short
        (0, "the quick brown fox jumps over the lazy dog", "en", "web"),
        (1, "a quick brown fox jumps over the lazy cat today", "en", "web"),
        (2, "completely unrelated words about spark shuffles", "en", "code"),
        (3, "tiny doc", "fr", "web"),
        (4, "the quick brown fox jumps over the lazy dog again", "de", "books"),
        (5, "spark shuffles partition data across the cluster nodes", "en", "code"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_ngram_overlap_fraction_matches_oracle(spark, docs):
    ev = docs.where(F.col("doc_id") == 0)
    tr = docs.where(F.col("doc_id") != 0)
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_hit"], r["overlap_frac"])
        for r in ngram_overlap(tr, ev, n=5).collect()
    }
    # python oracle: distinct 5-gram sets
    def grams(text, n=5):
        ts = text.lower().split()
        if len(ts) < n:
            return {" ".join(ts)}
        return {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}

    evset = grams("the quick brown fox jumps over the lazy dog")
    for r in docs.where(F.col("doc_id") != 0).collect():
        g = grams(r["text"])
        hits = len(g & evset)
        assert got[r["doc_id"]] == (len(g), hits, hits / len(g))
    # doc 4 contains the full eval phrase → contaminated; doc 2 clean
    assert got[4][1] > 0 and got[2][1] == 0


def test_decontaminate_drops_contaminated_and_preserves_schema(spark, docs):
    ev = docs.where(F.col("doc_id") == 0)
    tr = docs.where(F.col("doc_id") != 0)
    kept = decontaminate(tr, ev, n=5, max_overlap=0.0)
    assert kept.columns == docs.columns
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 4 not in ids  # shares a 5-gram with the eval doc
    assert {2, 3, 5} <= ids  # clean docs survive
    # the soft gate keeps a mildly-overlapping doc
    soft = decontaminate(tr, ev, n=5, max_overlap=0.9)
    assert 4 in {r["doc_id"] for r in soft.select("doc_id").collect()}


def test_mixture_rates_temperature_shape(spark, docs):
    rates = {
        r["domain"]: (r["n_docs"], r["rate"])
        for r in mixture_rates(docs, temperature=2.0, domain_col="lang").collect()
    }
    counts = {"en": 4, "fr": 1, "de": 1}
    assert {d: n for d, (n, _) in rates.items()} == counts
    # smallest domains keep rate 1.0; larger domains downsampled at n^-0.5
    assert rates["fr"][1] == pytest.approx(1.0)
    assert rates["de"][1] == pytest.approx(1.0)
    assert rates["en"][1] == pytest.approx(4 ** -0.5)
    # T=1 keeps natural proportions: every rate 1.0
    nat = mixture_rates(docs, temperature=1.0, domain_col="lang").collect()
    assert all(r["rate"] == pytest.approx(1.0) for r in nat)
    with pytest.raises(ValueError):
        mixture_rates(docs, temperature=0.0)


def test_sample_mixture_deterministic_and_append_stable(spark, docs):
    rates = spark.createDataFrame(
        [("en", 0.5), ("fr", 1.0), ("de", 1.0)], ["domain", "rate"]
    )
    kept1 = {r["doc_id"] for r in sample_mixture(docs, rates, seed=7, domain_col="lang").collect()}
    # oracle: u48(doc_id, seed) < rate(lang)
    rate_of = {"en": 0.5, "fr": 1.0, "de": 1.0}
    expect = {
        r["doc_id"]
        for r in docs.collect()
        if _u48(r["doc_id"], 7) < rate_of[r["lang"]]
    }
    assert kept1 == expect
    # repartitioning never changes the decision
    kept2 = {
        r["doc_id"]
        for r in sample_mixture(docs.repartition(7), rates, seed=7, domain_col="lang").collect()
    }
    assert kept2 == kept1
    # append-stability: adding docs never flips an existing keep/drop
    more = docs.union(
        spark.createDataFrame(
            [(100 + i, f"extra doc {i}", "en", "web") for i in range(20)],
            docs.schema,
        )
    )
    kept3 = {r["doc_id"] for r in sample_mixture(more, rates, seed=7, domain_col="lang").collect()}
    assert kept3 & set(range(6)) == kept1
    # a domain absent from the rate table is dropped, not kept by default
    partial = spark.createDataFrame([("fr", 1.0)], ["domain", "rate"])
    only_fr = sample_mixture(docs, partial, seed=7, domain_col="lang")
    assert {r["lang"] for r in only_fr.collect()} == {"fr"}


def test_shuffle_shard_is_balanced_seeded_permutation(spark, docs):
    big = spark.range(0, 103).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    out = shuffle_shard(big, n_shards=4, seed=3)
    rows = out.collect()
    assert len(rows) == 103
    # exact balance: shard sizes differ by at most 1
    sizes = {}
    for r in rows:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # (shard, pos) is a bijection over ranks; pos contiguous from 0
    assert {(r["shard"], r["pos"]) for r in rows} == {
        (rk % 4, rk // 4) for rk in range(103)
    }
    # the permutation is the u48 order — replay in python
    order = sorted(range(103), key=lambda i: (_u48(i, 3), i))
    expect = {(doc, (rk % 4, rk // 4)) for rk, doc in enumerate(order)}
    assert {(r["doc_id"], (r["shard"], r["pos"])) for r in rows} == expect
    # same seed → identical assignment; different seed → different order
    again = {(r["doc_id"], r["shard"], r["pos"])
             for r in shuffle_shard(big, n_shards=4, seed=3).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    other = {(r["doc_id"], r["shard"], r["pos"])
             for r in shuffle_shard(big, n_shards=4, seed=4).collect()}
    assert other != again
    with pytest.raises(ValueError):
        shuffle_shard(big, n_shards=0)


# ---------- duplicated-span profile (ExactSubstr signal, dedup.py) ----------

def test_duplicated_span_profile_matches_python_oracle(spark):
    from nama_spark.operators.dedup import (
        drop_duplicated_span_docs,
        duplicated_span_profile,
    )

    boiler = "all rights reserved contact us for details"
    rows = [
        (0, "unique words alpha beta gamma delta " + boiler),
        (1, "other phrasing entirely epsilon zeta eta " + boiler),
        (2, "totally fresh content nothing shared here at all"),
        (3, "short doc"),
        # within-doc repetition also counts (every occurrence, not df)
        (4, "repeat me now four times repeat me now four times"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    k = 4
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup"], r["dup_frac"])
        for r in duplicated_span_profile(docs, k=k).collect()
    }

    def windows(text):
        ts = text.lower().split()
        if len(ts) < k:
            return [" ".join(ts)]
        return [" ".join(ts[i : i + k]) for i in range(len(ts) - k + 1)]

    from collections import Counter

    occ = Counter()
    for _, text in [(r[0], r[1]) for r in rows]:
        occ.update(windows(text))
    for doc_id, text in [(r[0], r[1]) for r in rows]:
        ws = windows(text)
        dup = sum(1 for w in ws if occ[w] >= 2)
        assert got[doc_id] == (len(ws), dup, dup / len(ws)), doc_id
    # the shared boilerplate spans mark docs 0/1 but not 2/3
    assert got[0][1] > 0 and got[1][1] > 0
    assert got[2][1] == 0 and got[3][1] == 0
    # within-doc repeat detected
    assert got[4][1] > 0
    # the gate drops the heavy-duplication doc, keeps the clean one
    kept = {
        r["doc_id"]
        for r in drop_duplicated_span_docs(docs, k=k, max_dup_frac=0.3)
        .select("doc_id").collect()
    }
    assert 2 in kept and 3 in kept
    assert 4 not in kept  # 100% duplicated windows
    assert kept == {d for d, (nw, nd, f) in got.items() if f <= 0.3}


# ---------- Gopher repetition signals (corpus.py) ----------

def test_repetition_profile_matches_python_oracle(spark):
    from collections import Counter

    from nama_spark.operators.corpus import (
        gopher_repetition_filter,
        repetition_profile,
    )

    rows = [
        (0, "spam spam spam spam spam spam"),
        (1, "a varied document with mostly distinct words in it"),
        (2, "the cat sat on the mat the cat sat on the mat again"),
        (3, "tiny"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_profile(docs, top_ns=(2, 3), dup_ns=(2, 5)).collect()
    }

    def grams(ws, n):
        return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]

    for doc_id, text in rows:
        ws = [w for w in text.lower().strip().split() if w]
        exp = {"n_chars_norm": len(" ".join(ws))}
        for n, kind in [(2, "top"), (3, "top"), (2, "dup"), (5, "dup")]:
            c = Counter(grams(ws, n))
            if kind == "top":
                exp[f"top{n}_gram_chars"] = max(
                    (o * len(g) for g, o in c.items()), default=0
                )
            else:
                exp[f"dup{n}_gram_chars"] = sum(
                    o * len(g) for g, o in c.items() if o >= 2
                )
        assert got[doc_id] == {"doc_id": doc_id, **exp}, doc_id
    # every doc gets a row, even empty / shorter-than-n ones
    assert set(got) == {0, 1, 2, 3, 4}
    # the gate: spam doc fails top-2 (one gram is the whole text), varied
    # doc passes everything, repeated-sentence doc fails dup-5
    kept = {
        r["doc_id"]
        for r in gopher_repetition_filter(
            docs, top_thresholds={2: 0.30}, dup_thresholds={5: 0.15}
        ).select("doc_id").collect()
    }
    assert 1 in kept and 0 not in kept and 2 not in kept
    # empty + tiny docs trivially pass
    assert {3, 4} <= kept


# ---------- per-domain caps (corpus.py) ----------

def test_cap_per_domain_matches_python_oracle(spark):
    import hashlib

    import pytest

    from nama_spark.operators.corpus import cap_per_domain

    # skewed domains: hot has 40 docs, warm 7, cold 2
    rows = (
        [(i, "hot", i * 10) for i in range(40)]
        + [(100 + i, "warm", i) for i in range(7)]
        + [(200, "cold", 5), (201, "cold", 99)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "source", "score"])

    def u48(doc_id, seed=0):
        h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()
        return int(h[:12], 16) / float(1 << 48)

    # default: seeded-hash random sample, cap 5
    got = {
        r["doc_id"]
        for r in cap_per_domain(docs, 5, n_salts=4).select("doc_id").collect()
    }
    exp = set()
    for dom in ("hot", "warm", "cold"):
        ids = [d for d, s, _ in rows if s == dom]
        ids.sort(key=lambda d: (-u48(d), d))
        exp |= set(ids[:5])
    assert got == exp
    # cap binds only where the domain exceeds it
    assert len([d for d in got if 100 <= d < 200]) == 5
    assert {200, 201} <= got

    # priority column: keep the HIGHEST scores, ties impossible here
    got_p = {
        r["doc_id"]
        for r in cap_per_domain(docs, 3, priority_col="score", n_salts=4)
        .select("doc_id").collect()
    }
    exp_p = set()
    for dom in ("hot", "warm", "cold"):
        dd = [(d, sc) for d, s, sc in rows if s == dom]
        dd.sort(key=lambda x: (-x[1], x[0]))
        exp_p |= {d for d, _ in dd[:3]}
    assert got_p == exp_p

    # two-phase result == naive single-phase (n_salts=1)
    got_1 = {
        r["doc_id"]
        for r in cap_per_domain(docs, 5, n_salts=1).select("doc_id").collect()
    }
    assert got_1 == got

    with pytest.raises(ValueError):
        cap_per_domain(docs, 0)


# ---------- canonical survivor per near-dup cluster (dedup.py) ----------

def test_select_canonical_docs(spark):
    from nama_spark.operators.dedup import select_canonical_docs

    docs = spark.createDataFrame(
        [
            (1, "a", 10), (2, "b", 30), (3, "c", 30),   # cluster A: tie on 30
            (4, "d", 5),                                # singleton
            (5, "e", 7), (6, "f", 2),                   # cluster B
        ],
        ["doc_id", "text", "quality"],
    )
    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 101), (5, 102), (6, 102)],
        ["doc_id", "cluster_id"],
    )
    # priority: max quality wins, tie -> min id (doc 2 beats doc 3)
    kept = {
        r["doc_id"]
        for r in select_canonical_docs(docs, clusters, priority_col="quality")
        .select("doc_id").collect()
    }
    assert kept == {2, 4, 5}
    # default: min id per cluster
    kept_min = {
        r["doc_id"]
        for r in select_canonical_docs(docs, clusters).select("doc_id").collect()
    }
    assert kept_min == {1, 4, 5}
    # schema-preserving
    out = select_canonical_docs(docs, clusters, priority_col="quality")
    assert out.columns == docs.columns


# ---------- PII redaction (functions/pii.py + corpus.redact_documents) ----------

def test_redact_pii(spark):
    from nama_spark.operators.corpus import redact_documents
    from nama_spark.functions.pii import redact_pii, pii_count
    import pytest as _pytest
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-y.co.uk and d@e.io today"),
            (2, "ssn 123-45-6789 phone 555-123-4567 ip 192.168.0.1"),
            (3, "version 1.2.3 is not an ip, 10.0.0.1 is; dot phone 555.123.4567"),
            (4, "nothing to see here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_documents(docs).collect()}
    assert out[1]["text"] == "mail <EMAIL> and <EMAIL> today"
    assert out[1]["n_email"] == 2 and out[1]["n_ssn"] == 0
    assert out[2]["text"] == "ssn <SSN> phone <PHONE> ip <IPV4>"
    assert (out[2]["n_ssn"], out[2]["n_phone"], out[2]["n_ipv4"]) == (1, 1, 1)
    # 1.2.3 has only three octets -> not IPv4; dotted phone matches
    assert out[3]["text"] == "version 1.2.3 is not an ip, <IPV4> is; dot phone <PHONE>"
    assert out[4]["text"] == "nothing to see here"
    # kind subset: only emails touched
    sub = redact_documents(docs, kinds=("email",), with_counts=False)
    assert sub.columns == docs.columns
    assert {r["doc_id"]: r["text"] for r in sub.collect()}[2] == \
        "ssn 123-45-6789 phone 555-123-4567 ip 192.168.0.1"
    with _pytest.raises(ValueError):
        redact_pii(F.col("text"), kinds=("nope",))
    with _pytest.raises(ValueError):
        pii_count("text", "nope")


# ---------- C4 line-level filtering (corpus.py) ----------

def test_c4_line_filter(spark):
    from nama_spark.operators.corpus import c4_line_filter, line_quality_profile

    docs = spark.createDataFrame(
        [
            (1, "The ship sailed at dawn toward open water.\n"
                "- home\n- about us\n"
                "Read the full story here...\n"
                "Cargo manifests were checked twice by the harbourmaster.\n"
                "ok.\n"
                "Please enable JavaScript to view comments."),
            (2, "lorem ipsum dolor sit amet consectetur.\n"
                "A perfectly fine sentence stands here."),      # doc gate
            (3, "var f = function() { return 1; }\nAnother fine line here."),
            (4, "Only one good sentence survives in this page.\nnope"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in c4_line_filter(docs, min_kept_lines=2).collect()}
    # docs 2 (lorem ipsum) and 3 ({) fail the doc gate; doc 4 keeps 1 line < 2
    assert set(out) == {1}
    assert out[1]["text_clean"] == (
        "The ship sailed at dawn toward open water.\n"
        "Cargo manifests were checked twice by the harbourmaster."
    )
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 5

    prof = {r["doc_id"]: r for r in line_quality_profile(docs).collect()}
    assert prof[1]["n_lines"] == 7
    # dawn. / here... / harbourmaster. / ok. / comments. ('...' ends in '.')
    assert prof[1]["n_terminal"] == 5
    assert prof[1]["n_bullet"] == 2
    assert prof[1]["n_ellipsis"] == 1
    assert prof[1]["n_short"] == 2         # "- home" (2w), "ok." (1w)


# ---------- URL canonicalization + dedup ----------

def test_normalize_url_and_dedup(spark):
    from nama_spark.functions.url import normalize_url, url_host
    from nama_spark.operators.dedup import url_dedup
    from pyspark.sql import functions as F

    rows = [
        (0, "HTTP://Example.com:80/Path/7/?utm_source=x&b=2&a=1"),
        (1, "http://www.example.com/Path/7?a=1&b=2"),
        (2, "http://example.com/Path/7/?b=2&a=1#section"),
        (3, "https://Shop.example.com:443/item/9"),
        (4, "  not a url at all  "),
        (5, "http://x.com/?utm_source=1&gclid=2&fbclid=3"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "url"])
    n = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", normalize_url("url").alias("n")).collect()}
    assert n[0] == n[1] == n[2] == "http://example.com/Path/7?a=1&b=2"
    assert n[3] == "https://shop.example.com/item/9"
    assert n[4] == "not a url at all"       # unparseable: trimmed only
    assert n[5] == "http://x.com"           # tracking-only query drops
    h = {r["doc_id"]: r["h"] for r in docs.select(
        "doc_id", url_host("url").alias("h")).collect()}
    assert h[0] == "example.com" and h[3] == "shop.example.com" and h[4] == ""
    out = {r["doc_id"]: r["canonical_id"] for r in url_dedup(docs).collect()}
    assert out[0] == out[1] == out[2] == 0
    assert out[3] == 3 and out[4] == 4 and out[5] == 5


# ---------- n-gram LM perplexity filtering (operators/lm.py) ----------

def test_ngram_lm_matches_python_oracle(spark):
    import math

    from nama_spark.operators.lm import (
        ngram_lm_filter,
        ngram_lm_fit,
        ngram_lm_score,
        ngram_lm_surprisal,
    )

    ref = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the dog sat on the rug")],
        ["doc_id", "text"],
    )
    model = ngram_lm_fit(ref, n=2)
    got = {(r["context"], r["token"]): r["c"] for r in model.collect()}

    def py_rows(text):
        toks = text.lower().split()
        return [("<s>" if i == 0 else toks[i - 1], t) for i, t in enumerate(toks)]

    expect = {}
    for t in ["the cat sat on the mat", "the dog sat on the rug"]:
        for ct in py_rows(t):
            expect[ct] = expect.get(ct, 0) + 1
    assert got == expect

    cand = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zebra quantum flux")], ["doc_id", "text"]
    )
    v = len({t for (_, t) in expect})
    ctx_tot = {}
    for (c, _), n in expect.items():
        ctx_tot[c] = ctx_tot.get(c, 0) + n

    def py_score(text):
        lps, bits = [], 0
        for c, t in py_rows(text):
            cnt = expect.get((c, t), 0)
            ctx = ctx_tot.get(c, 0)
            lps.append(math.log2((cnt + 1) / (ctx + v)))
            bits += (ctx + v).bit_length() - 1 - ((cnt + 1).bit_length() - 1)
        return sum(lps) / len(lps), bits

    sc = {r["doc_id"]: r for r in ngram_lm_score(cand, model).collect()}
    su = {r["doc_id"]: r for r in ngram_lm_surprisal(cand, model).collect()}
    for did, text in [(10, "the cat sat"), (11, "zebra quantum flux")]:
        avg, bits = py_score(text)
        assert sc[did]["avg_logprob"] == pytest.approx(avg)
        assert sc[did]["perplexity"] == pytest.approx(2 ** -avg)
        assert su[did]["surprisal_bits"] == bits
    # gibberish scores strictly worse on both scales
    assert sc[11]["perplexity"] > sc[10]["perplexity"]
    assert su[11]["surprisal_bits"] > su[10]["surprisal_bits"]
    # the gate keeps fluent text, drops gibberish; schema-preserving
    kept = ngram_lm_filter(cand, model, max_avg_bits=2.1)
    assert kept.columns == cand.columns
    assert {r["doc_id"] for r in kept.collect()} == {10}
    with pytest.raises(ValueError):
        ngram_lm_fit(ref, n=1)


# ---------- ExactSubstr span removal (dedup.py) ----------

def test_remove_duplicated_spans(spark):
    from nama_spark.operators.dedup import remove_duplicated_spans

    boiler = "all rights reserved contact us"          # 5 tokens
    docs = spark.createDataFrame(
        [
            (0, "unique alpha beta gamma " + boiler),
            (1, boiler + " other phrasing entirely here"),
            (2, "totally fresh content nothing shared"),
            (3, "tiny doc"),                            # < k, unique
            (4, "tiny doc"),                            # < k, duplicated whole
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(docs, k=5, min_occ=2).collect()
    }
    # the 5-token boilerplate window occurs twice -> cut from both docs
    assert out[0]["text_clean"] == "unique alpha beta gamma"
    assert out[0]["n_tokens"] == 9 and out[0]["n_removed"] == 5
    assert out[1]["text_clean"] == "other phrasing entirely here"
    # untouched docs
    assert out[2]["n_removed"] == 0 and out[2]["text_clean"] == docs.collect()[2]["text"]
    # short docs hash whole-text: the duplicated pair empties, uniqueness impossible
    assert out[3]["text_clean"] == "" and out[4]["text_clean"] == ""
    assert out[3]["n_removed"] == 2

    # python oracle on a longer overlap: a 6-token shared span with k=5
    # duplicates 2 windows covering all 6 tokens
    span = "one two three four five six"
    docs2 = spark.createDataFrame(
        [(10, "start " + span + " finish"), (11, span)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(docs2, k=5, min_occ=2).collect()
    }
    assert got[10]["text_clean"] == "start finish"
    assert got[10]["n_removed"] == 6
    # doc 11 is exactly the span (len 6 >= k): both its windows duplicated
    assert got[11]["text_clean"] == ""


# ---------- containment pairs (dedup.py) ----------

def test_containment_pairs_catches_quoted_subset(spark):
    """A short doc quoted verbatim inside a long one: containment = 1.0
    while symmetric Jaccard ≈ |A|/|B| stays below any usable threshold."""
    from nama_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    quote = "the quick brown fox jumps over the lazy dog"
    long_doc = (
        "a very long page about many topics " + quote
        + " followed by much more unrelated prose that keeps going on"
        + " and on about completely different things entirely forever"
    )
    docs = spark.createDataFrame(
        [(0, long_doc), (1, quote),
         (2, "an unrelated document about gardening in early spring")],
        ["doc_id", "text"],
    )
    got = containment_pairs(docs, k=3, threshold=0.8).collect()
    assert [(r["id0"], r["id1"]) for r in got] == [(0, 1)]
    r = got[0]
    # every shingle of the quote appears in the long doc
    assert r["containment"] == 1.0 and r["n1"] == 7 and r["n0"] > r["n1"]
    # symmetric Jaccard misses the same pair at the same bar
    assert ngram_jaccard_pairs(docs, k=3, threshold=0.8).count() == 0
    # python cross-check of the statistic on the one emitted pair
    def sh(t, k=3):
        w = t.lower().split()
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)} or {" ".join(w)}
    a, b = sh(long_doc), sh(quote)
    assert r["containment"] == len(a & b) / min(len(a), len(b))


def test_perplexity_buckets(spark):
    """CCNet tertiles: reference-like docs land in 'head', noise in
    'tail', and bucket sizes split n into thirds by integer rank."""
    from nama_spark.operators.lm import ngram_lm_fit, perplexity_buckets

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat on the rug")
         for i in range(6)],
        ["doc_id", "text"],
    )
    cand = spark.createDataFrame(
        # reference-like (low surprisal) … unseen-vocab noise (high)
        [(10, "the cat sat on the mat"),
         (11, "the dog sat on the rug"),
         (12, "the cat sat on the rug and the dog"),
         (13, "zx qv wk jj pf zz"),
         (14, "qq ww ee rr tt yy"),
         (15, "mixed the cat zx qv unknown words here")],
        ["doc_id", "text"],
    )
    model = ngram_lm_fit(ref, n=2)
    out = {r["doc_id"]: r for r in
           perplexity_buckets(cand, model, n=2).collect()}
    assert len(out) == 6
    from collections import Counter
    assert Counter(r["bucket"] for r in out.values()) == {
        "head": 2, "middle": 2, "tail": 2
    }
    assert {out[10]["bucket"], out[11]["bucket"]} == {"head"}
    # 13/14/15 tie at whole-bit resolution (all-unseen tokens quantize
    # identically); the (score, id) total order breaks the tie
    # deterministically: 13 → middle, 14/15 → tail
    assert out[12]["bucket"] == out[13]["bucket"] == "middle"
    assert out[14]["bucket"] == out[15]["bucket"] == "tail"
    # scores are non-negative integers; head has the lowest
    assert all(r["milli_bits_per_tok"] >= 0 for r in out.values())
    assert (out[10]["milli_bits_per_tok"] < out[12]["milli_bits_per_tok"]
            < out[13]["milli_bits_per_tok"]
            == out[14]["milli_bits_per_tok"])
