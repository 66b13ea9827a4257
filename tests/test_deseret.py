"""F14 Deseret transliteration (reference deseret/deseret_conversion.py:1-81)."""

import pyspark.sql.functions as F

from language_identification_spark.functions.deseret import (
    deseret_phonemes,
    deseret_phonemes_py,
    fix_deseret,
    fix_deseret_py,
)
from language_identification_spark.oracle._deseret import (
    DESERET_CHARS,
    N_LETTERS,
    PHONEMES,
    WEIRD_CHARS,
)


def test_alphabet_structure():
    assert len(WEIRD_CHARS) == len(DESERET_CHARS) == len(PHONEMES) == 2 * N_LETTERS
    assert len(set(WEIRD_CHARS)) == len(set(DESERET_CHARS)) == 2 * N_LETTERS
    # codepoint order: uppercase block then lowercase block, lower = upper + 0x28
    for i in range(N_LETTERS):
        assert ord(DESERET_CHARS[i]) == 0x10400 + i
        assert ord(DESERET_CHARS[N_LETTERS + i]) == 0x10428 + i


def test_reference_quirks_preserved():
    # voiced-TH lowercase reads uppercase 'TH'; uppercase ZHEE reads 'z'
    assert deseret_phonemes_py("\U00010444") == "TH"
    assert deseret_phonemes_py("\U00010420") == "z"
    # regular case pair
    assert deseret_phonemes_py("\U00010415\U0001043D") == "CHch"


def test_py_roundtrip_full_alphabet():
    assert fix_deseret_py(WEIRD_CHARS) == DESERET_CHARS
    assert deseret_phonemes_py(DESERET_CHARS) == "".join(PHONEMES)
    # unmapped characters pass through both stages unchanged
    assert fix_deseret_py("abc 𠀀") == "abc 𠀀"
    assert deseret_phonemes_py("abc 𠀀") == "abc 𠀀"


def test_spark_matches_py(spark):
    samples = [
        WEIRD_CHARS,
        "plain ascii text",
        "mixed Ä¥ weird ∑ and plain",
        "astral passthrough 𠀀𐒀",
        "",
        "ı¢ßﬁﬂ",  # ligature + dotless-i weird keys
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    rows = df.select(
        "text",
        fix_deseret("text").alias("des"),
        deseret_phonemes(fix_deseret("text")).alias("ph"),
    ).collect()
    for r in rows:
        assert r.des == fix_deseret_py(r.text), r.text
        assert r.ph == deseret_phonemes_py(fix_deseret_py(r.text)), r.text


def test_spark_phonemes_on_deseret_input(spark):
    df = spark.createDataFrame([(DESERET_CHARS,)], "text string")
    out = df.select(deseret_phonemes("text").alias("ph")).collect()[0].ph
    assert out == "".join(PHONEMES)
