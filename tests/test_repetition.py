"""Gopher repetition rules (operators/repetition.py) vs the DuckDB oracle
(queries.SQL_GOPHER_REPETITION) on an adversarial corpus, plus hand-computed
expected values for the definitional corners (tie-breaks, overlap upper
bound, paragraph vs line splits, null/empty docs)."""

from __future__ import annotations

import duckdb
import pytest

from language_identification_spark.operators.repetition import (
    GOPHER_REPETITION_THRESHOLDS,
    repetition_stats,
)
from language_identification_spark.queries import SQL_GOPHER_REPETITION

ADVERSARIAL_DOCS: list[tuple[int, str | None]] = [
    (0, None),
    (1, ""),
    (2, "   \n  \n\t"),  # whitespace-only: zero tokens/lines after trims
    # long enough that even the count-1 top-gram fractions clear the
    # thresholds (Gopher pairs these rules with a min-50-words gate; a
    # 9-token doc legitimately fails top_3gram at count 1)
    (
        3,
        "unique words only here nothing repeats anywhere today because "
        "every single token differs from neighbours keeping fractions "
        "small across the whole document span without duplication",
    ),
    # duplicated lines (4 lines, 2 distinct): dup_line_frac = 0.5
    (4, "same line here\nsame line here\nother line there\nother line there"),
    # duplicated paragraphs across blank-line splits
    (5, "para one text\n\npara one text\n\npara two text"),
    # heavy 2-gram repetition: 'ab cd' * many
    (6, "ab cd " * 12),
    # dup 5-gram: a 5-token phrase appearing twice with filler between
    (7, "one two three four five filler one two three four five ending"),
    # top-gram COUNT tie with DIFFERENT masses: 'aa bb' (mass 4) and
    # 'ccc ddd' (mass 6) both appear twice -> tie broken by gram ASC
    # ('aa bb' wins), observable because the masses differ
    (8, "aa bb x aa bb y ccc ddd z ccc ddd"),
    # overlap-counting upper bound: 'a a a a a a' -> the 2-gram 'a a'
    # occurs 5 times, mass 2, denom 6 -> frac 10/6 > 1.0
    (9, "a a a a a a"),
    # mixed whitespace tokenization (\t, \x0b, \r all split)
    (10, "tab\tsep\x0bmix\rline end tab\tsep"),
    # case folding: tokens lowercase before n-grams
    (11, "The THE the tHe other words fill this doc out"),
    # single token / shorter than every n
    (12, "word"),
]


@pytest.fixture(scope="module")
def frames(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", ADVERSARIAL_DOCS)
    odf = (
        con.execute(SQL_GOPHER_REPETITION)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = spark.createDataFrame(ADVERSARIAL_DOCS, "doc_id bigint, text string")
    sdf = (
        repetition_stats(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return sdf, odf


def test_full_parity(frames):
    sdf, odf = frames
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(ADVERSARIAL_DOCS) == len(odf)
    for i in range(len(sdf)):
        for col in sdf.columns:
            a, b = sdf.iloc[i][col], odf.iloc[i][col]
            if col == "keep_repetition":
                assert bool(a) == bool(b), (i, col, a, b)
            else:
                assert float(a) == pytest.approx(float(b), abs=0), (
                    i, col, a, b,
                )


def _row(frames, doc_id: int):
    sdf, _ = frames
    return sdf[sdf.doc_id == doc_id].iloc[0]


def test_null_empty_and_whitespace_docs_keep_with_zero_stats(frames):
    for doc_id in (0, 1, 2, 12):
        r = _row(frames, doc_id)
        assert bool(r.keep_repetition)
        for name, _ in GOPHER_REPETITION_THRESHOLDS:
            assert float(r[name]) == 0.0, (doc_id, name)


def test_duplicate_line_fractions(frames):
    r = _row(frames, 4)
    # 4 lines, 2 distinct -> count frac 0.5; every line duplicated -> char
    # frac = all 58 line chars / 58 = 1.0
    assert float(r.dup_line_frac) == 0.5
    assert float(r.dup_line_char_frac) == 1.0
    assert not bool(r.keep_repetition)


def test_duplicate_paragraph_fractions(frames):
    r = _row(frames, 5)
    # 3 paragraphs, 2 distinct -> 1/3; dup chars = 2*13 of 39
    assert float(r.dup_para_frac) == pytest.approx(1 / 3, abs=5e-7)
    assert float(r.dup_para_char_frac) == pytest.approx(26 / 39, abs=5e-7)
    # the \n-splits see the same 3 non-empty lines (blank lines dropped)
    assert float(r.dup_line_frac) == pytest.approx(1 / 3, abs=5e-7)
    assert float(r.dup_line_char_frac) == pytest.approx(26 / 39, abs=5e-7)


def test_top_gram_tie_breaks_to_lexicographically_smaller(frames):
    r = _row(frames, 8)
    # 'aa bb' (mass 4) and 'ccc ddd' (mass 6) both occur twice; tie ->
    # 'aa bb' (gram ASC); denom = 23 token chars -> 2*4/23 (the wrong
    # tie-break would give 12/23)
    assert float(r.top_2gram_char_frac) == pytest.approx(8 / 23, abs=5e-7)


def test_overlap_counting_upper_bound_exceeds_one(frames):
    r = _row(frames, 9)
    # 'a a' occurs 5 times (overlapping), mass 2, denom 6 -> 10/6 > 1
    assert float(r.top_2gram_char_frac) == pytest.approx(10 / 6, abs=5e-7)
    assert not bool(r.keep_repetition)


def test_dup_5gram_detected(frames):
    r = _row(frames, 7)
    # 'one two three four five' twice: mass 19, denom = 50 token chars
    assert float(r.dup_5gram_char_frac) == pytest.approx(2 * 19 / 50, abs=5e-7)
    assert not bool(r.keep_repetition)


def test_case_folding_before_ngrams(frames):
    r = _row(frames, 11)
    # 'the the' 2-gram appears 3 times after lowercasing (tokens: the x4)
    assert float(r.top_2gram_char_frac) > 0.2


def test_clean_doc_keeps(frames):
    r = _row(frames, 3)
    assert bool(r.keep_repetition)
