"""Scrub operators: native regexp_replace chain (fast path) + parity UDF.

Two interchangeable implementations of oracle/scrub.py:scrub_text:

- ``scrub_expr``: a chain of Spark-native ``regexp_replace`` calls — stays in
  whole-stage codegen, zero Python cost. Valid because every SCRUB_PATTERN was
  chosen to behave identically in Python re / Java regex / RE2 (no lookaround,
  no backrefs); tests/test_parity.py asserts expr == oracle on the fixtures.
- ``scrub_udf``: Python ``re`` inside an Arrow-batched UDF, for deployments
  that need patterns outside the common dialect (the reference's scrub chain
  is Python re — cleanup.ipynb cells 4,7,12).

Default is the native expr: at 100 TB the scrub stage should never pay the
JVM<->Python Arrow round-trip for regex work the JVM does vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from language_identification_spark.oracle.scrub import (
    CARD_PATTERN,
    DEFAULT_BADWORDS,
    SCRUB_PATTERNS,
    badword_pattern,
    scrub_text,
)


def scrub_expr(
    col: Column, badwords: frozenset[str] = DEFAULT_BADWORDS
) -> Column:
    """JVM-native scrub chain, same order as the oracle (URL before EMAIL
    before HANDLE — the order is part of the contract)."""
    out = col
    for _name, pattern, repl in SCRUB_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    if badwords:
        out = F.regexp_replace(out, "(?i)" + badword_pattern(badwords), "<BAD>")
    return out


def _luhn_ok(cand: Column) -> Column:
    """Luhn checksum as a native expression: reversed digit string, double
    every second digit (−9 above 9), sum % 10 == 0. Integer arithmetic —
    bit-exact against the Python reference and the DuckDB oracle."""
    ds = F.reverse(F.regexp_replace(cand, "[ -]", ""))
    total = F.aggregate(
        F.sequence(F.lit(1), F.length(ds)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            i % 2 == F.lit(0),
            F.when(
                ds.substr(i, F.lit(1)).cast("int") * 2 > 9,
                ds.substr(i, F.lit(1)).cast("int") * 2 - 9,
            ).otherwise(ds.substr(i, F.lit(1)).cast("int") * 2),
        ).otherwise(ds.substr(i, F.lit(1)).cast("int")),
    )
    return total % 10 == F.lit(0)


def card_candidates(col: Column) -> Column:
    """array<string> of distinct card-shaped candidates (13-19 digits,
    optional single space/dash separators, word-bounded)."""
    return F.array_distinct(F.regexp_extract_all(col, F.lit(CARD_PATTERN), 0))


def scrub_cards_expr(col: Column, repl: str = "<CC>") -> Column:
    """Mask Luhn-VALID card candidates only (oracle/scrub.py:scrub_cards) —
    checksum-failing digit runs (order ids, timestamps) pass through. Pure
    narrow map: extract candidates, filter by the native Luhn expr, fold
    literal replacements over the (few) survivors. Zero Python, zero
    shuffle; stays in whole-stage codegen."""
    valids = F.array_sort(F.filter(card_candidates(col), _luhn_ok))
    return F.aggregate(
        valids, col, lambda acc, c: F.replace(acc, c, F.lit(repl))
    )


def make_scrub_udf(badwords: frozenset[str] = DEFAULT_BADWORDS):
    """Python-re parity variant (badwords captured; compiled once per worker)."""

    @F.pandas_udf(StringType())
    def _scrub(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            yield series.map(lambda t: scrub_text(t, badwords))

    return _scrub


def with_scrubbed_text(
    df: DataFrame,
    text_col: str = "extracted_text",
    out_col: str = "scrubbed_text",
    badwords: frozenset[str] = DEFAULT_BADWORDS,
    native: bool = True,
) -> DataFrame:
    scrubbed = (
        scrub_expr(F.col(text_col), badwords)
        if native
        else make_scrub_udf(badwords)(F.col(text_col))
    )
    return df.withColumn(out_col, scrubbed)
