"""Scalar function library (functions/text.py) — unit + parity tests."""

import pytest
from pyspark.sql import functions as F

from language_identification_spark.functions import (
    casefold_udf,
    char_ngrams_expr,
    clamp_repeats_expr,
    damerau_levenshtein_udf,
    label_strip_expr,
    tokenize_approx_expr,
    truncate_utf8_udf,
    word_ngrams_expr,
)
from language_identification_spark.functions.text import _damerau_levenshtein
from language_identification_spark.oracle.tokenize import char_ngrams


def _one(spark, col, value, schema="s string"):
    df = spark.createDataFrame([(value,)], schema=schema)
    return df.select(col.alias("out")).first()["out"]


def test_char_ngrams_matches_oracle(spark):
    for text in ["hello", "ab", "a", "", "日本語のテキスト"]:
        got = _one(spark, char_ngrams_expr("s", 3), text)
        assert got == char_ngrams(text, 3), text


def test_word_ngrams(spark):
    got = _one(spark, word_ngrams_expr("s", 2), "a b c d")
    assert got == ["a b", "b c", "c d"]
    assert _one(spark, word_ngrams_expr("s", 2), "solo") == []


def test_clamp_repeats(spark):
    # single-char runs clamp to 5 (arXiv 1608.03030: at most five repetitions)
    assert (
        _one(spark, clamp_repeats_expr("s"), "helloooooooo!!!!!!!!")
        == "hellooooo!!!!!"
    )
    # multi-char repeating units (1-4 chars) clamp too
    assert _one(spark, clamp_repeats_expr("s"), "ha" * 10) == "ha" * 5
    assert _one(spark, clamp_repeats_expr("s"), "argh" * 8) == "argh" * 5
    # five or fewer repetitions untouched
    assert _one(spark, clamp_repeats_expr("s"), "hahahahaha") == "hahahahaha"
    assert _one(spark, clamp_repeats_expr("s"), "normal text") == "normal text"


def test_label_strip(spark):
    assert _one(spark, label_strip_expr("s"), "__label__en") == "en"
    assert _one(spark, label_strip_expr("s"), "en") == "en"


def test_tokenize_approx(spark):
    got = _one(spark, tokenize_approx_expr("s"), "Hello, world! 42 fois-ci")
    assert got == ["Hello", "world", "42", "fois", "ci"]


def test_casefold_udf(spark):
    # casefold != lower: ß -> ss (the reference uses str.casefold, F6)
    assert _one(spark, casefold_udf(F.col("s")), "Straße") == "strasse"
    assert _one(spark, F.lower(F.col("s")), "Straße") == "straße"


def test_truncate_utf8(spark):
    trunc = truncate_utf8_udf(10)
    assert _one(spark, trunc(F.col("s")), "short") == "short"
    # 10-byte cap: the backoff window is 10//100 = 0 chars, so the reference
    # contract is a HARD cut (utils.py:124-130 searches the last 1% only)
    assert _one(spark, trunc(F.col("s")), "hello world again") == "hello worl"
    # multibyte chars never split mid-codepoint
    out = _one(spark, trunc(F.col("s")), "日本語テキスト")  # 3 bytes each
    assert out == "日本語"  # 9 bytes <= 10, 4th char would overflow


@pytest.mark.parametrize(
    "a,b,d",
    [
        ("abc", "abc", 0),
        ("abc", "acb", 1),  # transposition = 1 (plain levenshtein: 2)
        ("abc", "axc", 1),
        ("abc", "ab", 1),
        ("", "abc", 3),
        ("ca", "abc", 3),  # classic restricted-DL case
    ],
)
def test_damerau_levenshtein_py(a, b, d):
    assert _damerau_levenshtein(a, b) == d


def test_damerau_levenshtein_udf(spark):
    df = spark.createDataFrame(
        [("abc", "acb"), ("kitten", "sitting"), (None, "x")],
        schema="a string, b string",
    )
    rows = df.select(
        damerau_levenshtein_udf(F.col("a"), F.col("b")).alias("d")
    ).collect()
    assert [r["d"] for r in rows] == [1, 3, None]
