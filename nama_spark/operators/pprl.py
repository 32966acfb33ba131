"""Privacy-preserving record linkage (PPRL) — Bloom-filter name encodings.

The reference matches cleartext names; the standard technique when two
parties must link WITHOUT exchanging cleartext is the cryptographic
long-term-key (CLK) Bloom-filter encoding of Schnell, Bachteler & Reiher
(BMC Med Inf & Decision Making, 2009): each string's character q-grams are
hashed by k independent hash functions into an m-bit filter, and pairs are
compared by the Dice coefficient of their bit sets —

    dice(A, B) = 2·|A ∩ B| / (|A| + |B|)

— which approximates q-gram Dice on the cleartext while only bit positions
ever leave each party. Widely deployed (German cancer registries,
Australian AURIN/PPRL stacks) and the foundation of the anonlink/clkhash
open-source ecosystem.

Spark realization:

- ``bloom_encode``: k·|q-grams| bit positions as pure JVM column
  expressions — ``transform`` over the q-gram array per hash index, md5 →
  first 6 hex digits → int → mod m (the repo's engine-portable hash idiom,
  classifier.py:65) — then ``array_distinct``/``array_sort``. The filter
  is represented as the SORTED ARRAY OF SET POSITIONS (popcount-friendly,
  exact set semantics); no UDF, no shuffle.
- ``bloom_dice_pairs``: encodes each DISTINCT string once (two equi-joins
  fan encodings onto the pair stream — never re-hash per pair) and emits
  the Dice coefficient in EXACT INTEGER MILLI units via
  ``array_intersect`` sizes: floor(2000·|∩| / (|A|+|B|)), 1000 when both
  filters are empty, 0 when exactly one is.

Scale shape: encoding is a linear projection over the distinct-string
table; the pair stage is two hash joins + a JVM array intersection per
pair — no Python anywhere, no window, no skew beyond the pair stream
itself. At 100 TB the encode table is the same size class as the token
weight table every other scorer already carries.

No reference counterpart (nama is cleartext-only); included because PPRL
is the standard answer to "link two registries that cannot share names".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nama_spark.functions.tokenize import ngrams


def _bit_positions(s: Column, m: int, k: int, q: int) -> Column:
    """Sorted distinct bit positions of the CLK filter for string ``s``."""
    grams = ngrams(F.lower(s), q)

    # NB: a two-parameter lambda would make F.transform bind the SECOND
    # parameter to the array index — the hash index must come in via a
    # closure, not a default argument.
    def _hash_fn(i: int):
        def f(g: Column) -> Column:
            return (
                F.conv(
                    F.substring(F.md5(F.concat(g, F.lit(f"|{i}"))), 1, 6),
                    16,
                    10,
                ).cast("long")
                % m
            ).cast("int")

        return f

    per_hash = [F.transform(grams, _hash_fn(i)) for i in range(1, k + 1)]
    cat = per_hash[0] if k == 1 else F.concat(*per_hash)
    return F.array_sort(F.array_distinct(cat))


def bloom_encode(
    df: DataFrame,
    string_col: str = "string",
    m: int = 256,
    k: int = 3,
    q: int = 2,
    out_col: str = "bloom",
) -> DataFrame:
    """Append the CLK Bloom encoding of ``string_col`` as a sorted array of
    set bit positions. ``m`` bits, ``k`` hash functions, character
    ``q``-grams of the lowercased string (Schnell et al. 2009 §2). Strings
    shorter than ``q`` encode to the empty filter."""
    return df.withColumn(out_col, _bit_positions(F.col(string_col), m, k, q))


def dice_milli(b0: Column, b1: Column) -> Column:
    """Dice coefficient of two position-array filters in exact integer
    milli units: floor(2000·|∩| / (|A|+|B|)); both-empty → 1000."""
    inter = F.size(F.array_intersect(b0, b1)).cast("long")
    tot = (F.size(b0) + F.size(b1)).cast("long")
    return (
        F.when(tot > 0, F.floor(inter * 2000 / tot))
        .otherwise(F.lit(1000))
        .cast("long")
    )


def bloom_dice_pairs(
    pairs: DataFrame,
    s0: str = "s0",
    s1: str = "s1",
    m: int = 256,
    k: int = 3,
    q: int = 2,
    out_col: str = "dice_milli",
) -> DataFrame:
    """Score candidate pairs on their CLK encodings: each DISTINCT string
    is encoded once, encodings join onto the pair stream, and the Dice
    milli score is appended. The cleartext columns stay only because the
    caller already has them — a real PPRL deployment would run
    ``bloom_encode`` per party and ship positions only."""
    strs = (
        pairs.select(F.col(s0).alias("_s"))
        .union(pairs.select(F.col(s1).alias("_s")))
        .distinct()
    )
    enc = strs.withColumn("_b", _bit_positions(F.col("_s"), m, k, q))
    e0 = enc.select(F.col("_s").alias(s0), F.col("_b").alias("_b0"))
    e1 = enc.select(F.col("_s").alias(s1), F.col("_b").alias("_b1"))
    return (
        pairs.join(e0, s0)
        .join(e1, s1)
        .withColumn(out_col, dice_milli(F.col("_b0"), F.col("_b1")))
        .drop("_b0", "_b1")
    )
