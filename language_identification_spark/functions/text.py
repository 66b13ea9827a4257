"""Scalar text functions (SURVEY.md §2.7), native-expression-first.

Each function exists at the fastest viable tier:

1. **native Column expr** — whole-stage codegen, zero Python: n-grams via
   ``transform(sequence(...))``, repeated-char clamping, label stripping,
   log2 math, the regex word tokenizer approximation;
2. **pandas UDF** — only where exact Python semantics are the contract:
   ``str.casefold`` (full Unicode case folding, differs from ``lower`` on
   ß→ss etc. — reference F6, datatypes.py:595), UTF-8 byte-limit truncation
   (bisection semantics of utils.py:91-132), Damerau-Levenshtein (F11,
   dictionary_langid/datatypes.py:344-387 — Spark ships only plain
   levenshtein).

The exact unicode-category tokenizer lives in oracle/tokenize.py and runs
inside the fused enrichment UDF; ``tokenize_approx_expr`` is its native
approximation for stats-only paths where byte-parity is not required
(SURVEY.md F1 note).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType


# ---------------------------------------------------------------------------
# native exprs
# ---------------------------------------------------------------------------


def char_ngrams_expr(col: Column | str, n: int) -> Column:
    """F4: all length-n substrings as array<string> (tokenizer.py:469-474),
    pure codegen — no Python, no explode until the caller wants one.

    Guarded for short inputs: Spark's ``sequence(1, 0)`` yields a DESCENDING
    [1, 0] (not empty like DuckDB's range), which would fabricate phantom
    n-grams for texts shorter than n."""
    c = F.col(col) if isinstance(col, str) else col
    body = F.expr(
        f"transform(sequence(1, length({_sql(c)}) - {n - 1}),"
        f" i -> substring({_sql(c)}, i, {n}))"
    )
    return F.when(F.length(c) >= n, body).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams_expr(col: Column | str, n: int, sep: str = " ") -> Column:
    """F5: sliding word n-grams joined by sep (tokenizer.py:477-505).
    Same short-input guard as char_ngrams_expr. ``sep`` is escaped both as a
    Java regex (split pattern) and as a SQL string literal, so separators
    containing regex metacharacters or quotes cannot mis-split or break the
    generated expression.

    The token array is LET-BOUND via a single-element ``transform`` (the
    ``toks`` lambda variable) so the split runs ONCE per row: expressions
    referenced inside HOF lambdas are re-evaluated per element (no CSE —
    the content_blocks lesson, operators/blocks.py), so inlining the
    split into the per-gram lambda re-tokenizes the whole text once per
    gram position, O(T^2) chars per doc."""
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    # SQL string literal escape (' -> '', \ -> \\) then regex-quote for split
    sql_sep = sep.replace("\\", "\\\\").replace("'", "''")
    sql_sep_re = _re.escape(sep).replace("\\", "\\\\").replace("'", "''")
    size = F.size(F.split(c, _re.escape(sep)))
    body = F.expr(
        f"transform(array(split({_sql(c)}, '{sql_sep_re}')), toks ->"
        f" transform(sequence(1, size(toks) - {n - 1}),"
        f" i -> concat_ws('{sql_sep}', slice(toks, i, {n}))))[0]"
    )
    return F.when(size >= n, body).otherwise(F.array().cast("array<string>"))


def clamp_repeats_expr(col: Column | str, max_reps: int = 5) -> Column:
    """P12: clamp repeating sequences to at most ``max_reps`` repetitions,
    repeating unit 1-4 chars — the full arXiv 1608.03030 rule the reference
    cites (README.md:149-153): "hellloooo" AND "hahahaha"/"arghhhh" style.
    Lazy quantifier prefers the shortest repeating unit; backreference works
    in both Java regex (this expr) and Python re (same pattern usable in the
    oracle chain)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        c, f"(.{{1,4}}?)\\1{{{max_reps},}}", "$1" * max_reps
    )


def label_strip_expr(col: Column | str) -> Column:
    """F8: strip the fastText __label__ prefix (fasttext_wrapper.py:36,43)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "^__label__", "")


def log2_expr(col: Column | str) -> Column:
    """F10: log2 scoring math (scripts_langid.py:63-71)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.log2(c)


def tokenize_approx_expr(col: Column | str) -> Column:
    """F1 (approximate): split on non-(letter|mark|digit) — the Spark-native
    stand-in for unicode_tokenize where byte-parity is not required. Java
    regex \\p classes cover the same L*/M*/N* categories the reference's
    is_word_char uses (tokenizer.py:148-162) minus the Co private-use class
    and the apostrophe-merge state machine."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(c, r"[^\p{L}\p{M}\p{N}]+"), lambda w: w != F.lit("")
    )


def find_words_expr(col: Column | str) -> Column:
    """F7 as a native expression: maximal runs of letter/mark chars
    (datasets/tmp.py:18-32 find_words; digits break words, no apostrophe
    merge). Exact mirror of oracle/tokenize.py:find_words."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"[\p{L}\p{M}]+"), F.lit(0))


def norm_text_expr(col: Column | str, exact_casefold: bool = True) -> Column:
    """P8 companion ``norm_text`` (cleanup.ipynb cell 2): the dictionary
    cleanup key — distinct find_words tokens, sorted (binary codepoint
    order, matching Python ``sorted``), space-joined, then casefolded.
    ``exact_casefold=False`` substitutes ``lower()`` for the casefold UDF —
    the SQL-expressible gate variant (lower == casefold on the testdata;
    diverges on ß/ǅ-class chars, which the exact path handles)."""
    joined = F.array_join(
        F.array_sort(F.array_distinct(find_words_expr(col))), " "
    )
    return casefold_udf(joined) if exact_casefold else F.lower(joined)


def _sql(c: Column) -> str:
    # SQL-embed a column reference; only used with plain column refs
    return c._jc.toString()


# ---------------------------------------------------------------------------
# pandas UDFs (exact Python semantics)
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def casefold_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """F6: full Unicode casefold — NOT lower() (datatypes.py:595,634;
    'Straße'.casefold() == 'strasse' but lower() keeps ß)."""
    for series in batches:
        yield series.str.casefold()


def truncate_utf8_udf(limit_bytes: int):
    """P5: cap text at limit_bytes of UTF-8 — delegates to the oracle's
    exact reference contract (utils.py:91-132: char-length bisection,
    whitespace backoff within the LAST 1% of the window only, final strip),
    so the UDF and the row-wise oracle cannot drift."""
    from language_identification_spark.oracle.extract import truncate_text

    @F.pandas_udf(StringType())
    def _trunc(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            yield series.map(lambda t: truncate_text(t, limit_bytes))

    return _trunc


@F.pandas_udf(IntegerType())
def damerau_levenshtein_udf(
    batches: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    """F11: restricted Damerau-Levenshtein (adjacent transposition counts 1),
    the edit distance of dictionary_langid/datatypes.py:344-387. Spark's
    built-in levenshtein lacks transpositions."""
    for a_s, b_s in batches:
        out = []
        for a, b in zip(a_s, b_s):
            if a is None or b is None:
                out.append(None)
            else:
                out.append(_damerau_levenshtein(a, b))
        yield pd.Series(out, dtype="Int32")


def _damerau_levenshtein(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2: list[int] = []
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + cost)
        prev2, prev = prev, cur
    return prev[lb]
