"""Unit tests for normalization column expressions.

Cases ported from the reference's own suite (tests/test_utils.py:8-69) plus
edge cases; each asserts input→output equality of the Spark expression
against the reference-documented behavior (nama/utils.py:6-57).
"""

import pytest
from pyspark.sql import functions as F

from nama_spark.functions.normalize import (
    remove_stopwords,
    simplify,
    simplify_corp,
)

SIMPLIFY_CASES = [
    ("ABC", "abc"),
    ("A.B.C.", "abc"),           # inner periods stripped, trailing collapsed
    ("  white   space  ", "white space"),
    ("Dog & Cat", "dog and cat"),
    ("O'Brien", "obrien"),
    ("O’Brien", "obrien"),       # unicode apostrophe
    ("semi;colon", "semi colon"),  # ';' is in the punct-run class (utils.py:23)
    ("under_score-dash", "under score dash"),
    ("(parens)", "parens"),
    ('"quoted"', "quoted"),
    # inner '.' removed by the apostrophe-class pass first, then ',!@#' runs
    # collapse to spaces: 'a,bc!d@e#f' → 'a bc d e f'
    ("a,b.c!d@e#f", "a bc d e f"),
    ("slash/slash", "slash slash"),
    ("em—dash", "em dash"),
    # ' & ' needs both spaces to become 'and'; bare '&' collapses to space
    ("Dog &Cat", "dog cat"),
]

SIMPLIFY_CORP_CASES = [
    ("The Walt Disney Company", "walt disney"),
    ("XYZ Holding Co LLC", "xyz"),
    ("Acme Inc", "acme"),
    ("Acme Incorporated", "acme"),
    ("Acme, Ltd.", "acme"),
    ("Acme L.L.C.", "acme"),
    ("Acme LLP", "acme"),
    ("Acme Corp", "acme"),
    ("Acme Corporation", "acme"),
    ("Acme Company", "acme"),
    ("Acme Co", "acme"),
    ("Acme Group", "acme"),
    ("Acme PLC", "acme"),
    ("Acme SA", "acme"),
    ("Acme SE", "acme"),
    ("The The Co", "the"),          # only one leading 'the ' stripped
    ("Theodore Inc", "theodore"),   # 'the ' prefix requires the space
    ("Grouper", "grouper"),         # suffix must be a whole trailing word
]


def _apply(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r["out"] for r in df.select(fn(F.col("s")).alias("out")).collect()]


def test_simplify_matches_reference_semantics(spark):
    ins = [c[0] for c in SIMPLIFY_CASES]
    outs = _apply(spark, simplify, ins)
    for (i, expected), got in zip(SIMPLIFY_CASES, outs):
        assert got == expected, f"simplify({i!r}) = {got!r}, want {expected!r}"


def test_simplify_matches_python_reference_impl(spark):
    """Property check: our Column expr ≡ a from-spec Python reimplementation
    of utils.py:6-26 on a stress alphabet."""
    import itertools
    import re

    def py_simplify(s):
        s = s.lower()
        s = re.sub(" & ", " and ", s)
        s = re.sub(r"(?<=\S)['’´\.](?=\S)", "", s)
        s = re.sub(r"[\s\.,!@#$%^&*:;/\'\"`´‘’“”\(\)_—\-]+", " ", s)
        return s.strip()

    alphabet = ["a", "B", ".", "'", "&", " ", "-", "’", "(", "#"]
    cases = ["".join(p) for p in itertools.product(alphabet, repeat=3)]
    got = _apply(spark, simplify, cases)
    for s, g in zip(cases, got):
        assert g == py_simplify(s), f"{s!r}: spark={g!r} py={py_simplify(s)!r}"


def test_simplify_corp(spark):
    ins = [c[0] for c in SIMPLIFY_CORP_CASES]
    outs = _apply(spark, simplify_corp, ins)
    for (i, expected), got in zip(SIMPLIFY_CORP_CASES, outs):
        assert got == expected, f"simplify_corp({i!r}) = {got!r}, want {expected!r}"


def test_remove_stopwords(spark):
    cases = [
        ("the cat and the hat", "cat hat"),
        ("The Cat", "Cat"),  # lowercase match but original case kept
        ("nothing here", "nothing"),  # 'here' is a stopword
    ]
    outs = _apply(spark, remove_stopwords, [c[0] for c in cases])
    for (i, expected), got in zip(cases, outs):
        assert got == expected, f"remove_stopwords({i!r}) = {got!r}, want {expected!r}"


def test_clean_name_reference_cases(spark):
    """Reference-exact cases computed from the published clean_name
    (training/build_opensecrets_training_data.py:27-41): whitespace
    standardization, on-behalf-of/obo extraction (including the no-word-
    boundary 'obo' quirk), multi-name drop list."""
    from nama_spark.functions.normalize import clean_name

    cases = [
        ("  Acme   Corp  ", "Acme Corp"),
        ("Smith LLP on behalf of Acme Corp", "Acme Corp"),
        ("Smith obo Acme Corp", "Acme Corp"),
        # capture stops at a closing paren; check runs on the extracted part
        ("Smith (on behalf of Acme) Partners", "Acme"),
        # nested on-behalf-of chains drop (the drop check sees the remainder)
        ("X on behalf of Y on behalf of Z", None),
        # multi-name indicators → NULL
        ("Acme f/k/a Bolt", None),
        ("Acme fka Bolt", None),
        ("Acme, formerly Bolt", None),
        ("Acme d/b/a Bolt", None),
        ("Acme dba Bolt", None),
        ("Acme [Bolt]", None),
        ("Acme / Bolt", None),
        ("Acme in affiliation with Bolt", None),
        # 'obo' has no word boundary in the reference pattern
        ("Robo Corp", "Corp"),
        # plain names pass through
        ("Acme Corp", "Acme Corp"),
        # ';' is NOT in the reference drop list
        ("Acme; Bolt", "Acme; Bolt"),
    ]
    outs = _apply(spark, clean_name, [c[0] for c in cases])
    for (i, expected), got in zip(cases, outs):
        assert got == expected, f"clean_name({i!r}) = {got!r}, want {expected!r}"


def test_soundex_key_spec_examples_and_unite(spark):
    """soundex_key pins the published US-census examples (incl. the H/W
    collapse: Ashcraft → A261) and composes with unite() as a phonetic
    blocking key."""
    from nama_spark.functions.normalize import norm_key, soundex_key
    from nama_spark.operators.matchdata import MatchData

    cases = {
        "Robert": "R163", "Rupert": "R163",
        "Ashcraft": "A261", "Ashcroft": "A261",
        "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Smith": "S530", "Smyth": "S530",
        "!!!": None,
    }
    df = spark.createDataFrame([(s,) for s in cases], ["string"])
    got = {r["string"]: r["sx"] for r in
           df.select("string", soundex_key("string").alias("sx")).collect()}
    assert got == cases

    md = MatchData.from_unmatched(
        spark.createDataFrame(
            [("Smith Industries",), ("Smyth Industries",), ("Jackson Co",)],
            ["string"],
        )
    )
    out = md.unite(lambda c: norm_key(c, "soundex"))
    groups = {r["string"]: r["group"] for r in out.df.collect()}
    assert groups["Smith Industries"] == groups["Smyth Industries"]
    assert groups["Jackson Co"] != groups["Smith Industries"]


def test_fingerprint_key_collisions(spark):
    """OpenRefine fingerprint: word order, case, punctuation and repeats
    collapse; distinct word sets stay apart."""
    from nama_spark.functions.normalize import fingerprint_key

    df = spark.createDataFrame(
        [("Acme Corp",), ("corp. ACME",), ("acme acme corp",),
         ("Acme Ltd",), ("!!!",)],
        ["string"],
    )
    got = {r["string"]: r["fp"] for r in
           df.select("string", fingerprint_key("string").alias("fp")).collect()}
    assert got["Acme Corp"] == got["corp. ACME"] == got["acme acme corp"] == "acme corp"
    assert got["Acme Ltd"] == "acme ltd"
    assert got["!!!"] is None
