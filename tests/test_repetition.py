"""Gopher repetition rules (operators/repetition.py) vs the DuckDB oracle
(queries.SQL_GOPHER_REPETITION) on an adversarial corpus, plus hand-computed
expected values for the definitional corners (tie-breaks, span de-overlap,
paragraph vs line splits, null/empty docs). Both variants are pinned:
the exact de-overlapped default (fractions provably <= 1.0) and the
overlap-counting upper bound (deoverlap=False, vs its own oracle)."""

from __future__ import annotations

import duckdb
import pytest

from language_identification_spark.operators.repetition import (
    GOPHER_REPETITION_THRESHOLDS,
    repetition_stats,
)
from language_identification_spark.queries import (
    SQL_GOPHER_REPETITION,
    SQL_GOPHER_REPETITION_UPPER,
)

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
    # the degenerate overlap doc: 'a a a a a a' -> the 2-gram 'a a'
    # occurs 5 times OVERLAPPING; de-overlapped cover = all 6 tokens ->
    # frac exactly 1.0 (the upper bound double-counts to 10/6)
    (9, "a a a a a a"),
    # mixed whitespace tokenization (\t, \x0b, \r all split)
    (10, "tab\tsep\x0bmix\rline end tab\tsep"),
    # case folding: tokens lowercase before n-grams
    (11, "The THE the tHe other words fill this doc out"),
    # single token / shorter than every n
    (12, "word"),
]


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", ADVERSARIAL_DOCS)
    return con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def frames(spark):
    odf = _oracle(SQL_GOPHER_REPETITION)
    docs = spark.createDataFrame(ADVERSARIAL_DOCS, "doc_id bigint, text string")
    sdf = (
        repetition_stats(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return sdf, odf


@pytest.fixture(scope="module")
def frames_upper(spark):
    odf = _oracle(SQL_GOPHER_REPETITION_UPPER)
    docs = spark.createDataFrame(ADVERSARIAL_DOCS, "doc_id bigint, text string")
    sdf = (
        repetition_stats(docs, deoverlap=False)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return sdf, odf


def _assert_parity(sdf, odf):
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


def test_full_parity(frames):
    _assert_parity(*frames)


def test_full_parity_upper_bound(frames_upper):
    _assert_parity(*frames_upper)


def test_exact_fractions_never_exceed_one(frames):
    """The round-3 verdict's acceptance bar: span de-overlap keeps every
    fraction <= 1.0, including on the degenerate overlap doc."""
    sdf, _ = frames
    for name, _thr in GOPHER_REPETITION_THRESHOLDS:
        assert (sdf[name] <= 1.0).all(), name


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
    # tie-break would give 12/23); no overlap, so de-overlap == count*mass
    assert float(r.top_2gram_char_frac) == pytest.approx(8 / 23, abs=5e-7)


def test_degenerate_overlap_doc_caps_at_one(frames):
    r = _row(frames, 9)
    # 'a a' occurs 5 times overlapping; de-overlapped cover = all 6 tokens
    # -> exactly 1.0 (Gopher: "careful not to count characters twice")
    assert float(r.top_2gram_char_frac) == 1.0
    # 5-gram 'a a a a a' occurs twice overlapping -> cover = 6/6 = 1.0
    assert float(r.dup_5gram_char_frac) == 1.0
    assert not bool(r.keep_repetition)


def test_upper_bound_overlap_counting_exceeds_one(frames_upper):
    r = _row(frames_upper, 9)
    # deoverlap=False keeps the documented Dolma-style upper bound:
    # count * mass double-counts overlapping occurrences -> 10/6 > 1
    assert float(r.top_2gram_char_frac) == pytest.approx(10 / 6, abs=5e-7)
    assert not bool(r.keep_repetition)


def test_dup_5gram_detected(frames):
    r = _row(frames, 7)
    # 'one two three four five' twice, non-overlapping: cover = 10 tokens
    # = 38 chars, denom = 50 token chars (same as count*mass here)
    assert float(r.dup_5gram_char_frac) == pytest.approx(2 * 19 / 50, abs=5e-7)
    assert not bool(r.keep_repetition)


def test_case_folding_before_ngrams(frames):
    r = _row(frames, 11)
    # 'the the' 2-gram appears 3 times after lowercasing (tokens: the x4)
    assert float(r.top_2gram_char_frac) > 0.2


def test_clean_doc_keeps(frames):
    r = _row(frames, 3)
    assert bool(r.keep_repetition)


def test_exact_path_is_zero_shuffle_single_arrow_pass(spark):
    """The de-overlap is per-doc-local: the exact plan must be ONE
    MapInPandas narrow map with NO shuffle exchange of any kind."""
    docs = spark.createDataFrame(
        [(i, "some text here") for i in range(10)], "doc_id bigint, text string"
    )
    plan = (
        repetition_stats(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan, plan
