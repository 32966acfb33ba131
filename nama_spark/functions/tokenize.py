"""Tokenizers as pure Column expressions (array-valued) — no UDFs.

Reference semantics: ``ngrams`` / ``nmgrams`` / ``words`` in nama's
token_similarity module (absent from the code snapshot; embedded source in
docs/nama/token_similarity.html — lines cited as token_similarity[html]:N):

- ngrams(s, n): every char n-gram, token_similarity[html]:12-30
- nmgrams(s, n, m): all j-grams for j in [n, m], token_similarity[html]:33-54
  (TokenSimilarity default tokenizer = nmgrams(s, 2, 3))
- words(s): [A-Za-z0-9]+ matches, token_similarity[html]:57-73

All produce *multisets* in the reference (generators, duplicates included);
``tokens_table`` keeps per-(string, token) term frequency so downstream weights
reproduce the reference exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def ngrams(c: Column | str, n: int = 2) -> Column:
    """Array of all character n-grams (with duplicates), empty if len(s) < n."""
    s = _col(c)
    return F.when(
        F.length(s) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - F.lit(n - 1)),
            lambda i: s.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def nmgrams(c: Column | str, n: int = 2, m: int = 3) -> Column:
    """Array of all j-grams for j in [n, m] (reference default 2..3)."""
    parts = [ngrams(c, j) for j in range(n, m + 1)]
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def words(c: Column | str) -> Column:
    """Array of [A-Za-z0-9]+ word tokens."""
    arr = F.split(_col(c), "[^A-Za-z0-9]+")
    return F.filter(arr, lambda w: w != F.lit(""))


def tokenizer_expr(kind: str = "nmgrams23") -> "callable":
    """Named tokenizer registry (the reference's pluggable ``tokenizer``
    callable, token_similarity[html]:152-157)."""
    table = {
        "nmgrams23": lambda c: nmgrams(c, 2, 3),
        "bigrams": lambda c: ngrams(c, 2),
        "trigrams": lambda c: ngrams(c, 3),
        "words": words,
    }
    if kind not in table:
        raise ValueError(f"unknown tokenizer: {kind}")
    return table[kind]


def tokens_table(
    strings_df: DataFrame,
    string_col: str = "string",
    tokenizer: str = "nmgrams23",
) -> DataFrame:
    """Exploded token table: (string, token, tf).

    ``tf`` is the within-string occurrence count, preserving the reference's
    multiset tokenization (token_similarity[html] fit(): Counter over token
    *lists*). One narrow shuffle on (string, token); partial aggregation is
    map-side (Catalyst hash agg).
    """
    tok = tokenizer_expr(tokenizer)
    return (
        strings_df.select(F.col(string_col).alias("string"))
        .distinct()
        .select("string", F.explode(tok(F.col("string"))).alias("token"))
        .groupBy("string", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def token_weights(
    tokens: DataFrame,
    weighting: str = "tf-idf",
    reference_doc_counts: bool = True,
) -> DataFrame:
    """Per-token weight table: (token, f, d, weight).

    Reference formulas (token_similarity[html] __init__ weight funcs):
      tf → w = f;  idf → w = 1/ln(1+d);  tf-idf → w = f/ln(1+d)

    Reference quirk, reproduced when ``reference_doc_counts=True``: the
    reference computes ``doc_counts`` by re-counting the token *lists* (not the
    sets), so d equals the total occurrence count f, duplicates included
    (token_similarity[html] fit()). With False, d = distinct-string count (the
    textbook document count).
    """
    agg = tokens.groupBy("token").agg(
        F.sum("tf").alias("f"),
        F.count(F.lit(1)).alias("n_strings"),
    )
    d = F.col("f") if reference_doc_counts else F.col("n_strings")
    if weighting == "tf":
        w = F.col("f").cast("double")
    elif weighting == "idf":
        w = F.lit(1.0) / F.log(F.lit(1.0) + d)
    elif weighting == "tf-idf":
        w = F.col("f") / F.log(F.lit(1.0) + d)
    elif weighting is None or weighting == "none":
        w = F.lit(1.0)
    else:
        raise ValueError(f"unknown weighting: {weighting}")
    return agg.select("token", "f", d.alias("d"), w.alias("weight"))
