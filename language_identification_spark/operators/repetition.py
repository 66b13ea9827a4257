"""Gopher repetition rules — the remaining family of the quality filter.

Rae et al. 2021 (Gopher), Table A1: beyond the line-count duplicate rule the
pipeline already enforces (``dup_line_frac``), web-scale quality filtering
drops documents dominated by REPEATED CONTENT, measured as

- duplicate line / paragraph fraction            (> 0.30 drops)
- duplicate line / paragraph CHARACTER fraction  (> 0.20 drops)
- top word-n-gram character fraction, n = 2,3,4  (> 0.20/0.18/0.16)
- duplicate word-n-gram character fraction,
  n = 5..10                                      (> 0.15/0.14/0.13/0.12/0.11/0.10)

Definitions (pinned here because the paper leaves them loose; both engines
replay these EXACTLY):

- tokens: ``lower(text)`` split on the cross-engine whitespace class
  ``[\\t\\n\\x0b\\f\\r ]+``, empties dropped (the same convention as the
  textcat/langid gates).
- lines: ``\\n``-splits, space-trimmed, empties dropped. paragraphs:
  ``\\n{2,}``-splits, space-trimmed, empties dropped.
- an n-gram's character mass = the sum of its tokens' lengths (joining
  spaces excluded) = ``length(gram) - (n - 1)``; a line/paragraph's mass is
  its full length. Denominators: total token chars for n-grams, total
  line/paragraph chars for the line/paragraph rules.
- top-n-gram char fraction = ``count(top) * mass(top) / denom`` with the
  top gram chosen by (count DESC, gram ASC) — the deterministic tie-break
  both engines share on ASCII-lowered text.
- duplicate/top n-gram char fractions are SPAN-DE-OVERLAPPED by default
  (``deoverlap=True``), matching Gopher's "careful not to count characters
  twice": the numerator is the char mass of the UNION of token positions
  covered by the relevant occurrences (the top gram's occurrences for
  n=2..4; every count>=2 gram's occurrences for n=5..10), so every
  fraction is provably <= 1.0. Lines/paragraphs are disjoint spans, so
  their occurrence-counted char fractions are already exact.
- ``deoverlap=False`` keeps the overlap-counting upper bound
  (``sum over count>=2 of count * mass``) that Dolma-style
  reimplementations use — fractions can exceed 1.0 on degenerate docs.

Scale shape, exact path (default): the de-overlap is per-document-LOCAL
(a doc's tokens never leave their row), so it runs as ONE Arrow-batched
mapInPandas projection — zero shuffle, zero exchange; the only cost is the
Python pass itself. A relational de-overlap would instead shuffle the full
(doc, n, gram, pos) occurrence table (~9x corpus chars) for the count join
plus a positions-distinct exchange — strictly worse than the narrow map.

Scale shape, upper-bound path: one explode to (doc, n, gram) instances,
partial-aggregated map-side into counts before the single (doc_id, n,
gram) exchange; the (doc_id, n) window and aggregation run on counts
(already collapsed), and the final per-doc pivot is |docs| x 13 — nothing
corpus-sized ever shuffles twice, no Python anywhere. Per-doc char totals
are computed ONCE as columns and carried through the explode (recomputing
them inside the per-gram lambda would be O(tokens^2) per document).
"""

from __future__ import annotations

import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WS_RE = r"[\t\n\x0b\f\r ]+"

# (column, threshold) — Gopher Table A1, keep iff value <= threshold
GOPHER_REPETITION_THRESHOLDS: list[tuple[str, float]] = [
    ("dup_line_frac", 0.30),
    ("dup_para_frac", 0.30),
    ("dup_line_char_frac", 0.20),
    ("dup_para_char_frac", 0.20),
    ("top_2gram_char_frac", 0.20),
    ("top_3gram_char_frac", 0.18),
    ("top_4gram_char_frac", 0.16),
    ("dup_5gram_char_frac", 0.15),
    ("dup_6gram_char_frac", 0.14),
    ("dup_7gram_char_frac", 0.13),
    ("dup_8gram_char_frac", 0.12),
    ("dup_9gram_char_frac", 0.11),
    ("dup_10gram_char_frac", 0.10),
]

NGRAM_NS = list(range(2, 11))

_STRUCT_T = "array<struct<n:int,gram:string>>"


def _char_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0), lambda acc, x: acc + F.length(x))


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    deoverlap: bool = True,
) -> DataFrame:
    """Per-document Gopher repetition stats (all 13 fractions, 6 dp) plus
    ``keep_repetition`` (true iff every fraction is within its threshold).
    Docs with NULL/empty text keep all-zero stats and keep=true — emptiness
    is the empty_text rule's job, not repetition's.

    ``deoverlap=True`` (default): exact Gopher span-de-overlapped n-gram
    char fractions via the zero-shuffle Arrow pass; every fraction <= 1.0.
    ``deoverlap=False``: the relational overlap-counting upper bound."""
    if deoverlap:
        return _repetition_stats_exact(docs, text_col, id_col)
    return _repetition_stats_upper(docs, text_col, id_col)


# exact-path output schema (shared with the Arrow worker)
_OUT_FIELDS = [name for name, _ in GOPHER_REPETITION_THRESHOLDS]
_OUT_SCHEMA = (
    "doc_id bigint, "
    + ", ".join(f"{name} double" for name in _OUT_FIELDS)
    + ", keep_repetition boolean"
)

_WS_SPLIT = re.compile(WS_RE)
_PARA_SPLIT = re.compile(r"\n{2,}")
_SIX = Decimal("0.000001")


def _round6(x: float) -> float:
    """Spark F.round semantics: HALF_UP on the EXACT binary value of the
    double (BigDecimal(double) in Spark) — Python's built-in round() is
    banker's and diverges on e.g. 1/128 = 0.0078125."""
    return float(Decimal(x).quantize(_SIX, rounding=ROUND_HALF_UP))


def _doc_stats(text: str | None) -> list[float]:
    """All 13 fractions for one document, n-gram char fractions
    span-de-overlapped. Pure function — tested directly and replayed
    relationally by the DuckDB gate oracle (positions-distinct form)."""
    out: dict[str, float] = {name: 0.0 for name in _OUT_FIELDS}
    if text is None:
        return [out[name] for name in _OUT_FIELDS]

    # identical trims to the relational path: F.trim strips 0x20 only
    lines = [s for s in (p.strip(" ") for p in text.split("\n")) if s]
    paras = [s for s in (p.strip(" ") for p in _PARA_SPLIT.split(text)) if s]
    toks = [t for t in _WS_SPLIT.split(text.lower()) if t]
    lens = [len(t) for t in toks]
    tchars = sum(lens)

    for items, cname, fname in (
        (lines, "dup_line_frac", "dup_line_char_frac"),
        (paras, "dup_para_frac", "dup_para_char_frac"),
    ):
        if not items:
            continue
        cnt = Counter(items)
        n_inst, n_distinct = len(items), len(cnt)
        out[cname] = _round6((n_inst - n_distinct) / n_inst)
        chars = sum(len(s) for s in items)
        if chars > 0:
            dup = sum(c * len(s) for s, c in cnt.items() if c >= 2)
            out[fname] = _round6(dup / chars)

    if tchars == 0:
        return [out[name] for name in _OUT_FIELDS]

    for n in NGRAM_NS:
        m = len(toks) - n + 1
        if m < 1:
            continue
        grams = [" ".join(toks[i : i + n]) for i in range(m)]
        cnt = Counter(grams)
        covered = bytearray(len(toks))
        if n <= 4:
            # top gram by (count DESC, gram ASC) — the shared tie-break
            top = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            for i, g in enumerate(grams):
                if g == top:
                    for p in range(i, i + n):
                        covered[p] = 1
            key = f"top_{n}gram_char_frac"
        else:
            for i, g in enumerate(grams):
                if cnt[g] >= 2:
                    for p in range(i, i + n):
                        covered[p] = 1
            key = f"dup_{n}gram_char_frac"
        mass = sum(l for l, c in zip(lens, covered) if c)
        out[key] = _round6(mass / tchars)

    return [out[name] for name in _OUT_FIELDS]


def _repetition_stats_exact(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact Gopher repetition stats as ONE Arrow-batched narrow map —
    zero shuffle (the de-overlap is per-doc-local, so nothing ever needs
    to leave the document's row, let alone cross an exchange)."""
    thresholds = list(GOPHER_REPETITION_THRESHOLDS)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = [_doc_stats(t) for t in pdf[text_col]]
            stats = pd.DataFrame(rows, columns=_OUT_FIELDS)
            stats.insert(0, "doc_id", pdf[id_col].to_numpy())
            keep = pd.Series(True, index=stats.index)
            for name, thr in thresholds:
                keep &= stats[name] <= thr
            stats["keep_repetition"] = keep
            yield stats

    return docs.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(compute, schema=_OUT_SCHEMA)


def _repetition_stats_upper(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The relational overlap-counting upper bound (``deoverlap=False``):
    duplicate char masses count every occurrence (``count * mass``), so
    overlapping occurrences are double-counted and fractions can exceed
    1.0 on degenerate docs."""
    c = F.col(text_col)
    did = F.col(id_col)

    toks = F.filter(F.split(F.lower(c), WS_RE), lambda x: x != "")
    # explicit one-arg lambdas: bare `F.trim` as the transform callable
    # receives (element, index) and reads the index as its trim-char-set
    # argument — trimming index digits, not spaces (see operators/c4.py)
    lines = F.filter(
        F.transform(F.split(c, r"\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    paras = F.filter(
        F.transform(F.split(c, r"\n{2,}"), lambda x: F.trim(x)),
        lambda x: x != "",
    )

    base = docs.filter(c.isNotNull()).select(
        did.alias("doc_id"),
        toks.alias("toks"),
        lines.alias("lines"),
        paras.alias("paras"),
    )
    base = base.select(
        "doc_id",
        "toks",
        "lines",
        "paras",
        _char_sum(F.col("toks")).alias("tchars"),
        _char_sum(F.col("lines")).alias("lchars"),
        _char_sum(F.col("paras")).alias("pchars"),
    )

    def _unit_structs(col: str, n: int) -> Column:
        return F.transform(
            F.col(col),
            lambda x: F.struct(F.lit(n).alias("n"), x.alias("gram")),
        )

    def _gram_structs(n: int) -> Column:
        t = F.col("toks")
        body = F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(t, i, n)).alias("gram"),
            ),
        )
        return F.when(F.size(t) >= n, body).otherwise(
            F.array().cast(_STRUCT_T)
        )

    rows = base.select(
        "doc_id",
        "tchars",
        "lchars",
        "pchars",
        F.explode(
            F.concat(
                _unit_structs("lines", 0),
                _unit_structs("paras", 1),
                *[_gram_structs(n) for n in NGRAM_NS],
            )
        ).alias("u"),
    ).select(
        "doc_id",
        F.col("u.n").alias("n"),
        F.col("u.gram").alias("gram"),
        F.when(F.col("u.n") == 0, F.col("lchars"))
        .when(F.col("u.n") == 1, F.col("pchars"))
        .otherwise(F.col("tchars"))
        .alias("denom"),
    )

    counts = rows.groupBy("doc_id", "n", "denom", "gram").agg(
        F.count("*").alias("cnt")
    )
    # mass = token chars of the gram (separators excluded; full length for
    # lines/paragraphs where n-1 <= 0)
    counts = counts.withColumn(
        "mass", F.length("gram") - F.greatest(F.lit(0), F.col("n") - 1)
    )
    w = Window.partitionBy("doc_id", "n").orderBy(
        F.col("cnt").desc(), F.col("gram").asc()
    )
    ranked = counts.withColumn("rn", F.row_number().over(w))
    per_n = ranked.groupBy("doc_id", "n").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cnt") * F.col("mass"))).alias(
            "top_mass"
        ),
        F.coalesce(
            F.sum(F.when(F.col("cnt") >= 2, F.col("cnt") * F.col("mass"))),
            F.lit(0),
        ).alias("dup_mass"),
        F.max("denom").alias("denom"),
        F.sum("cnt").alias("n_inst"),
        F.count("*").alias("n_distinct"),
    )

    def _frac(num: Column, den: Column) -> Column:
        return F.round(
            F.coalesce(
                F.max(
                    F.when(den > 0, num.cast("double") / den.cast("double"))
                ),
                F.lit(0.0),
            ),
            6,
        )

    def _n(k: int, col: str) -> Column:
        return F.when(F.col("n") == k, F.col(col))

    wide = per_n.groupBy("doc_id").agg(
        _frac(_n(0, "n_inst") - _n(0, "n_distinct"), _n(0, "n_inst")).alias(
            "dup_line_frac"
        ),
        _frac(_n(1, "n_inst") - _n(1, "n_distinct"), _n(1, "n_inst")).alias(
            "dup_para_frac"
        ),
        _frac(_n(0, "dup_mass"), _n(0, "denom")).alias("dup_line_char_frac"),
        _frac(_n(1, "dup_mass"), _n(1, "denom")).alias("dup_para_char_frac"),
        *[
            _frac(_n(k, "top_mass"), _n(k, "denom")).alias(
                f"top_{k}gram_char_frac"
            )
            for k in (2, 3, 4)
        ],
        *[
            _frac(_n(k, "dup_mass"), _n(k, "denom")).alias(
                f"dup_{k}gram_char_frac"
            )
            for k in range(5, 11)
        ],
    )

    out = docs.select(did.alias("doc_id")).join(wide, "doc_id", "left")
    for name, _thr in GOPHER_REPETITION_THRESHOLDS:
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(0.0)))
    keep = F.lit(True)
    for name, thr in GOPHER_REPETITION_THRESHOLDS:
        keep = keep & (F.col(name) <= F.lit(thr))
    return out.withColumn("keep_repetition", keep)
