"""Unicode NFC normalization audit — the canonicalization pass a web-text
pipeline runs before any hash-keyed dedup, so that canonically-equivalent
byte sequences ('e' + U+0301 vs precomposed U+00E9) collide instead of
surviving as spurious "distinct" documents.

Reference anchor: the reference's ensure_unicode/ftfy path
(utils.py:33, language_identification.py imports) repairs mojibake but
never canonicalizes combining sequences; NFC is the standard upstream of
both (Unicode UAX #15). This operator supplies that missing half as a
single Arrow-vectorized pass.

Scale shape: pure narrow map — zero exchanges, embarrassingly parallel;
the UDF is pandas' C-level ``Series.str.normalize`` (ICU-free, Python's
unicodedata tables), batched by Arrow. At 100 TB this rides the same
scan as extraction; cost is memcpy-bounded for already-NFC text (the
overwhelming web majority) because normalize returns the input unchanged.

Cross-engine parity: DuckDB's ``nfc_normalize`` (utf8proc) and Python's
``unicodedata.normalize('NFC', ...)`` implement the same UAX #15
algorithm over the same (Unicode 15) data tables — the gate hashes the
md5 of the normalized text, so any divergence in any doc fails loudly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


# StringType() (not a DDL string) so the decorator never needs an active
# SparkContext at import time.
@pandas_udf(StringType())
def _nfc(s: pd.Series) -> pd.Series:
    # pandas Series.str.normalize is vectorized (no per-row Python lambda);
    # nulls pass through as nulls.
    return s.str.normalize("NFC")


def nfc_audit(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc NFC audit: normalized-text hash + changed flag + char deltas.

    Returns (doc_id, changed, n_chars_raw, n_chars_nfc, nfc_md5). The
    ``changed`` flag is the curation dashboard signal (what fraction of a
    crawl slice is non-NFC — a proxy for mojibake-prone sources); the md5
    is the dedup-grade canonical key.
    """
    nfc = _nfc(F.col(text_col))
    return df.select(
        "doc_id",
        (F.col(text_col) != nfc).alias("changed"),
        F.length(text_col).cast("bigint").alias("n_chars_raw"),
        F.length(nfc).cast("bigint").alias("n_chars_nfc"),
        F.md5(nfc.cast("binary")).alias("nfc_md5"),
    )


def synth_nonnfc_docs(docs: DataFrame) -> DataFrame:
    """Deterministic non-NFC fixture: append a decomposed-sequence suffix to
    a doc_id-mod slice of the corpus (mirrored by SQL_SYNTH_NONNFC in
    queries_textops.py). Classes:
      doc_id%4==1: combining acute  ('cafe' + U+0301  -> 'café')
      doc_id%4==2: ring + diaeresis ('A'+U+030A ... 'o'+U+0308 -> 'Ångström')
      doc_id%4==3: already-NFC precomposed 'café' (must NOT change)
      doc_id%4==0: untouched ASCII (must NOT change)
    """
    did = F.col("doc_id")
    suffix = (
        F.when(did % 4 == 1, F.lit(" cafe\u0301"))
        .when(did % 4 == 2, F.lit(" A\u030angstro\u0308m"))
        .when(did % 4 == 3, F.lit(" caf\u00e9"))
        .otherwise(F.lit(""))
    )
    return docs.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )


def soft404_flag(
    text_col: Column, max_words: int = 60
) -> tuple[Column, Column, Column]:
    """Soft-404 / error-page heuristic: pages that return HTTP 200 but carry
    an error body ("page not found", "no longer available", ...) pollute a
    crawl corpus with near-empty template text. Standard curation rule
    (CCNet/RefinedWeb drop classes): flag when an error phrase occurs AND
    the page is short (a long article QUOTING "404" is not an error page).

    Returns (n_words, matched_phrase, is_soft404) columns — pure
    whole-stage-codegen relational ops (lower + contains + size), zero
    Python, zero exchanges.
    """
    low = F.lower(text_col)
    n_words = F.size(F.filter(F.split(text_col, " "), lambda w: w != ""))
    phrase = F.lit(None).cast("string")
    # reversed fold so the FIRST phrase in list order wins ties
    for p in reversed(SOFT404_PHRASES):
        phrase = F.when(low.contains(p), F.lit(p)).otherwise(phrase)
    is_404 = phrase.isNotNull() & (n_words <= max_words)
    return n_words.cast("bigint"), phrase, is_404


# Order matters: first match in this order is reported (deterministic).
SOFT404_PHRASES = [
    "page not found",
    "404 not found",
    "error 404",
    "does not exist",
    "no longer available",
    "access denied",
]


# Fullwidth ASCII block U+FF01-U+FF5E maps 1:1 onto U+0021-U+007E; the
# ideographic space U+3000 maps to the ASCII space. This is the width-fold
# subset of NFKC — the piece of ftfy's cleanup (reference utils.py:33
# ensure_unicode context) that matters for CJK web text, expressible as a
# pure translate() in BOTH engines (full NFKC has no DuckDB twin).
WIDTH_FROM = "".join(chr(0xFF01 + i) for i in range(94)) + "　"
WIDTH_TO = "".join(chr(0x21 + i) for i in range(94)) + " "

# C0 controls minus \t \n \r, plus DEL — enumerated so Java regex and RE2
# agree exactly (shorthand classes differ between engines).
_CTRL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def compat_fold(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Width-fold + control-strip canonicalization audit.

    Fullwidth ASCII ('ＡＢＣ１２３' from CJK input methods) folds to its
    ASCII twin, ideographic space to the plain space, and stray C0/DEL
    control bytes (mojibake shrapnel, terminal escapes) are removed —
    the canonicalization a tokenizer/dedup pass wants BEFORE hashing, and
    the deterministic subset of ftfy's remaining cleanup (see module
    docstring). Pure native translate + enumerated-class regexp_replace:
    zero Python, zero exchanges, codegen throughout.

    Returns (doc_id, changed, n_chars_raw, n_chars_folded, folded_md5).
    """
    folded = F.regexp_replace(
        F.translate(F.col(text_col), WIDTH_FROM, WIDTH_TO), _CTRL_CLASS, ""
    )
    return df.select(
        "doc_id",
        (F.col(text_col) != folded).alias("changed"),
        F.length(text_col).cast("bigint").alias("n_chars_raw"),
        F.length(folded).cast("bigint").alias("n_chars_folded"),
        F.md5(folded.cast("binary")).alias("folded_md5"),
    )
