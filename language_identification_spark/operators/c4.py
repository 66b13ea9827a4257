"""C4 line-level cleaning — the per-line half of web-text quality filtering.

Raffel et al. 2020 (T5/C4, §2.2) clean Common Crawl with LINE-level rules
before any document-level scoring: most boilerplate (nav bars, cookie
banners, share buttons) is a bad *line* inside a good *page*, so dropping
whole documents (the Gopher rules' granularity, operators/repetition.py)
either loses the page or keeps the junk. This operator reconstructs each
page from its surviving lines and applies C4's page-level vetoes.

Definitions (pinned here because the paper and the public tfds
``c4_utils.py`` implementation disagree on constants; both engines replay
these EXACTLY — parameters expose the knobs):

- lines: ``\\n``-splits of the raw text, space-trimmed, empties dropped.
- line kept iff ALL of:
  * ends with a terminal mark ``. ! ? "`` and does NOT end with ``...``
    (the ellipsis carve-out is tfds'),
  * >= ``min_words_per_line`` words (default 5, tfds' constant; the paper
    says 3), words = the cross-engine whitespace class split,
  * lowercased line does not contain ``javascript``,
  * lowercased line contains none of the policy-boilerplate phrases
    (``terms of use``, ``privacy policy``, ... — tfds' list).
- page kept (``keep``) iff ALL of:
  * >= ``min_sentences`` sentences in the RECONSTRUCTED text (default 3,
    tfds' constant; the paper says 5), sentence count = number of
    ``[.!?]`` occurrences,
  * raw text has no ``lorem ipsum`` (lowercased), no ``{``, and no
    word-bounded badword (the scrub stage's list, oracle/scrub.py:39).
- reconstruction: surviving lines joined with ``\\n``. A page whose every
  line fails reconstructs to ``''`` with n_sentences = 0 (and keep=false
  via the sentence rule) rather than vanishing.

Scale shape: the WHOLE operator is a narrow map — line split, per-line
predicates, and reconstruction are array ops on each row (no explode, no
exchange, no Python); at 100 TB it fuses into the scan's codegen stage.
Contrast the reference's per-document Python loops (cleanup.ipynb cell 9
walks lines row-at-a-time); here the same rules are single-pass JVM
expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from language_identification_spark.operators.repetition import WS_RE
from language_identification_spark.oracle.scrub import (
    DEFAULT_BADWORDS,
    badword_pattern,
)

# tfds c4_utils policy-boilerplate phrases (public constants)
C4_POLICY_PHRASES: tuple[str, ...] = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)

C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3


def c4_line_keep(line: Column, min_words_per_line: int = C4_MIN_WORDS_PER_LINE) -> Column:
    """The per-line C4 predicate as a pure Column expression (usable inside
    ``F.filter`` lambdas — no UDF, no explode).

    The terminal-mark test is an explicit last-character comparison, NOT a
    regex ``$`` anchor: Java's ``$`` matches before a trailing line
    terminator (\\r, \\u2028, ...) where RE2's matches only at end of
    text — a line like ``"abc.\\r"`` would diverge between the engines
    under an anchored pattern."""
    low = F.lower(line)
    words = F.filter(F.split(line, WS_RE), lambda w: w != "")
    last = F.substring(line, -1, 1)
    keep = (
        (last == ".") | (last == "!") | (last == "?") | (last == '"')
    ) & ~line.endswith("...")
    keep = keep & (F.size(words) >= min_words_per_line)
    keep = keep & ~low.contains("javascript")
    for phrase in C4_POLICY_PHRASES:
        keep = keep & ~low.contains(phrase)
    return keep


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
    min_sentences: int = C4_MIN_SENTENCES,
    badwords: frozenset[str] = DEFAULT_BADWORDS,
) -> DataFrame:
    """(doc_id, clean_text, n_kept, n_dropped, n_sentences, keep) per
    non-null-text document: the page rebuilt from its C4-surviving lines
    plus the page-level veto verdict."""
    raw = F.col(text_col)
    # NOTE: the lambda wrapper is load-bearing. F.transform introspects the
    # callable's arity and passes (element, index) to two-arg callables —
    # and F.trim's OWN second parameter is the trim-character set, so the
    # bare `F.transform(..., F.trim)` idiom silently trims each line of its
    # INDEX DIGITS instead of spaces (caught by the hostile-corpus sweep).
    lines = F.filter(
        F.transform(F.split(raw, r"\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    kept = F.filter(lines, lambda x: c4_line_keep(x, min_words_per_line))

    base = docs.filter(raw.isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        raw.alias("raw"),
        F.size(lines).alias("n_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("bigint").alias("n_kept"),
    )
    n_sentences = F.size(
        F.regexp_extract_all(F.col("clean_text"), F.lit(r"[.!?]"), 0)
    ).cast("bigint")
    raw_low = F.lower(F.col("raw"))
    page_keep = (
        (n_sentences >= min_sentences)
        & ~raw_low.contains("lorem ipsum")
        & ~F.col("raw").contains("{")
        & ~raw_low.rlike(badword_pattern(badwords))
    )
    return base.select(
        "doc_id",
        "clean_text",
        "n_kept",
        (F.col("n_lines").cast("bigint") - F.col("n_kept")).alias("n_dropped"),
        n_sentences.alias("n_sentences"),
        page_keep.alias("keep"),
    )
