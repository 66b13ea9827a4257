"""Readability scoring — Flesch reading ease / Flesch-Kincaid grade level.

Web-curation pipelines use readability alongside the Gopher/C4 rule battery
as a cheap fluency prior (e.g. educational-quality filtering a la
FineWeb-Edu samples by grade-level bands). Formulas are the published
Flesch (1948) / Kincaid et al. (1975) constants:

    reading_ease = 206.835 - 1.015 * (words/sentences) - 84.6 * (syllables/words)
    fk_grade     =   0.39  * (words/sentences) + 11.8  * (syllables/words) - 15.59

Engine discipline (the split_token_budget / pack_sequences pattern): every
per-document quantity is an EXACT INTEGER —

  - words      = non-empty chunks of an ASCII-whitespace split
                 (``[ \\t\\n\\x0b\\f\\r]+`` — the explicit class, not ``\\s``,
                 because Java regex includes \\x0b in ``\\s`` while RE2 does
                 not; tokens joined by newlines/tabs in multi-line documents
                 count as separate words, per the Flesch definition),
  - syllables  = count of ``[aeiouy]+`` runs in the lowercased text (the
                 standard vowel-group proxy; exact syllabification needs a
                 hyphenation dictionary and is locale-bound),
  - sentences  = count of ``[.!?]+`` runs (an ellipsis is one terminator)

— aggregated per language as exact bigint sums (map-side combined, one
exchange, no Python). The corpus-level scores are then ONE float expression
over those exact sums (corpus-as-one-text semantics), so the result is
order-independent and bit-identical across engines: no per-doc double is
ever summed.

Scale shape: narrow per-doc map (two native regexp_counts + a split) into a
groupBy(lang) with |langs| output rows. At 10^12 docs this is scan-bound —
the same shape as quality_stats_sql.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SYLLABLE_PATTERN = "[aeiouy]+"
SENTENCE_PATTERN = "[.!?]+"
# Explicit ASCII whitespace class — identical in Java regex and RE2
# (DuckDB); `\s` is NOT (Java includes \x0b, RE2 does not).
WORD_SPLIT_PATTERN = "[ \t\n\x0b\f\r]+"


def readability_counts(text_col: str = "text") -> list[Column]:
    """Exact-integer per-document (words, sentences, syllables) columns."""
    t = F.col(text_col)
    return [
        F.size(F.filter(F.split(t, WORD_SPLIT_PATTERN), lambda w: w != ""))
        .cast("bigint")
        .alias("words"),
        F.regexp_count(t, F.lit(SENTENCE_PATTERN)).cast("bigint").alias(
            "sentences"
        ),
        F.regexp_count(F.lower(t), F.lit(SYLLABLE_PATTERN))
        .cast("bigint")
        .alias("syllables"),
    ]


def readability_by_lang(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language exact count sums + corpus-as-one-text Flesch scores."""
    per_doc = docs.filter(F.col(text_col).isNotNull()).select(
        "lang", *readability_counts(text_col)
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("sum_words"),
        F.sum("sentences").cast("bigint").alias("sum_sentences"),
        F.sum("syllables").cast("bigint").alias("sum_syllables"),
    )
    sw, ss, sy = (
        F.col("sum_words"),
        F.col("sum_sentences"),
        F.col("sum_syllables"),
    )
    ok = (ss > 0) & (sw > 0)
    wps = sw / ss
    spw = sy / sw
    return agg.select(
        "lang",
        "n_docs",
        "sum_words",
        "sum_sentences",
        "sum_syllables",
        F.when(
            ok,
            F.round(
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
            ),
        ).alias("reading_ease"),
        F.when(
            ok,
            F.round(
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
            ),
        ).alias("fk_grade"),
    )
