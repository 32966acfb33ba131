"""BPE tokenizer (operators/bpe.py) vs a from-spec Python oracle
(Sennrich et al. 2016: count adjacent pairs over the word-frequency
table, merge the argmax greedily left-to-right, repeat)."""

import pytest
from pyspark.sql import functions as F

from nama_spark.operators.bpe import (
    _EOW,
    _initial_symbols,
    bpe_encode_words,
    bpe_fit,
    bpe_token_counts,
    pair_counts,
    word_counts,
)


def _py_bpe(wc: dict, n_merges: int, min_pair: int = 2):
    """Reference implementation over a {word: count} dict."""
    syms = {w: list(w[:-1]) + [w[-1] + _EOW] for w in wc}
    merges = []
    for rank in range(n_merges):
        pc = {}
        for w, n in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + n
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair:
            break
        merges.append((rank, l, r, c))
        for w in syms:
            out = []
            for x in syms[w]:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


FIX = [
    (0, "low low low low low"),
    (1, "lower lower newer newer newer"),
    (2, "newest newest wider wide wide"),
    (3, "low lower lowest wide widest"),
]


def test_bpe_fit_matches_python_oracle(spark):
    docs = spark.createDataFrame(FIX, ["doc_id", "text"])
    wc = {
        r["word"]: r["n"] for r in word_counts(docs).collect()
    }
    exp_merges, exp_syms = _py_bpe(wc, 12)
    got = [
        (r["rank"], r["left"], r["right"], r["cnt"])
        for r in bpe_fit(docs, n_merges=12).orderBy("rank").collect()
    ]
    assert got == exp_merges

    # encoding the training vocabulary reproduces the training-time
    # symbol state (merge-by-rank == greedy training application here)
    enc = {
        r["word"]: r["tokens"]
        for r in bpe_encode_words(
            word_counts(docs).select("word"),
            bpe_fit(docs, n_merges=12),
        ).collect()
    }
    assert enc == {w: list(s) for w, s in exp_syms.items()}
    # lossless: tokens concatenate back to word + end marker
    for w, toks in enc.items():
        assert "".join(toks) == w + _EOW


def test_bpe_fit_deterministic_and_early_stop(spark):
    docs = spark.createDataFrame(FIX, ["doc_id", "text"])
    a = [tuple(r) for r in bpe_fit(docs, n_merges=6).collect()]
    b = [tuple(r) for r in bpe_fit(docs.repartition(7), n_merges=6).collect()]
    assert a == b  # (count desc, pair asc) argmax is partition-invariant

    # a corpus of unique characters has no pair reaching min_pair_count=2
    tiny = spark.createDataFrame([(0, "abc xyz")], ["doc_id", "text"])
    assert bpe_fit(tiny, n_merges=5).count() == 0
    with pytest.raises(ValueError):
        bpe_fit(tiny, n_merges=0)


def test_bpe_token_counts(spark):
    docs = spark.createDataFrame(FIX, ["doc_id", "text"])
    merges = bpe_fit(docs, n_merges=12)
    out = {r["doc_id"]: r for r in bpe_token_counts(docs, merges).collect()}
    wc = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    _, syms = _py_bpe(wc, 12)
    # doc 0: five 'low' words, each fully merged or not per the oracle
    per_word = {w: len(s) for w, s in syms.items()}
    for doc_id, text in FIX:
        words = text.split()
        assert out[doc_id]["n_words"] == len(words)
        assert out[doc_id]["n_bpe_tokens"] == sum(per_word[w] for w in words)
    # BPE can only compress: token count per word never exceeds chars+1
    assert all(
        out[i]["n_bpe_tokens"] <= sum(len(w) + 1 for w in t.split())
        for i, t in FIX
    )


def test_pair_counts_unicode(spark):
    """Multibyte text: pairs are per CHARACTER in both engines (the
    oracle query runs over the zh fixture docs too)."""
    docs = spark.createDataFrame([(0, "数据 数据 库")], ["doc_id", "text"])
    pc = {
        (r["left"], r["right"]): r["cnt"]
        for r in pair_counts(
            _initial_symbols(word_counts(docs))
        ).collect()
    }
    assert pc == {("数", "据" + _EOW): 2}
