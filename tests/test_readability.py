"""Flesch / Flesch-Kincaid readability (operators/readability.py):
hand-counted fixtures, the zero-sentence guard, and exactness of the
corpus-as-one-text aggregation."""

from __future__ import annotations

from language_identification_spark.operators.readability import (
    readability_by_lang,
)

# "the cat sat on the mat." -> words 6, sentences 1,
# vowel groups: e,a,a,o,e,a -> 6
SENT = "the cat sat on the mat."


def _row(df, lang):
    return {r.lang: r for r in df.collect()}[lang]


def test_hand_counted(spark):
    docs = spark.createDataFrame(
        [("en", SENT), ("en", "why?! stop... now")],
        schema="lang string, text string",
    )
    r = _row(readability_by_lang(docs), "en")
    # doc 2: words 3, sentence runs 2 ('?!' and '...'), vowel groups:
    # 'why' -> y; 'stop' -> o; 'now' -> o  => 3
    assert (r.sum_words, r.sum_sentences, r.sum_syllables) == (9, 3, 9)
    wps, spw = 9 / 3, 9 / 9
    assert abs(r.reading_ease - round(206.835 - 1.015 * wps - 84.6 * spw, 6)) < 1e-9
    assert abs(r.fk_grade - round(0.39 * wps + 11.8 * spw - 15.59, 6)) < 1e-9


def test_zero_sentences_null_scores(spark):
    docs = spark.createDataFrame(
        [("xx", "no terminal punctuation here at all")],
        schema="lang string, text string",
    )
    r = _row(readability_by_lang(docs), "xx")
    assert r.sum_sentences == 0
    assert r.reading_ease is None and r.fk_grade is None


def test_null_text_excluded(spark):
    docs = spark.createDataFrame(
        [("en", SENT), ("en", None)], schema="lang string, text string"
    )
    r = _row(readability_by_lang(docs), "en")
    assert r.n_docs == 1 and r.sum_words == 6


def test_corpus_as_one_text_not_mean_of_docs(spark):
    # two docs with very different shapes: the corpus score uses summed
    # integers, not the average of per-doc scores
    docs = spark.createDataFrame(
        [("en", "a b c d e f g h i j."), ("en", "hi.")],
        schema="lang string, text string",
    )
    r = _row(readability_by_lang(docs), "en")
    assert (r.sum_words, r.sum_sentences) == (11, 2)
    wps = 11 / 2
    spw = r.sum_syllables / 11
    assert abs(r.fk_grade - round(0.39 * wps + 11.8 * spw - 15.59, 6)) < 1e-9
