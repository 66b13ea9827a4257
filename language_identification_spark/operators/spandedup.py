"""Duplicated-substring (span) removal — the span-granular dedup family.

Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better", ExactSubstr) show that web corpora repeat long token SPANS across
otherwise-distinct documents (licenses, quote chains, templated intros)
and that removing them beats document-level dedup. Their implementation
is a single-machine suffix array; the distributed re-expression here uses
the standard k-gram formulation: a span is duplicated iff its k-token
window occurs >= 2 times corpus-wide.

Pinned contract (both engines replay EXACTLY):

- tokens: whitespace-class split (``[\\t\\n\\x0b\\f\\r ]+``), empties
  dropped, 0-indexed by position.
- k-gram at pos p: tokens[p..p+k-1] joined by one space; a doc with fewer
  than k tokens contributes no grams.
- duplicated gram: total occurrence count >= 2 corpus-wide (within-doc
  repeats count).
- covered position: any p' in [p, p+k-1] of a duplicated occurrence.
- output text: UNCOVERED tokens re-joined with single spaces, per doc;
  n_tokens / n_removed report the coverage.

Two shipped forms. Default (remove-all): ALL copies of a duplicated span
are removed — what decontamination-style span scrubbing ships.
``keep_first=True`` (gate span_dedup_keep_first): the paper-shaped
keep-one-copy form at GRAM granularity — per duplicated k-gram the
globally first occurrence (min (doc_id, pos)) is elected canonical and
keeps its tokens; remaining occurrences are scrubbed. Gram granularity is
the deterministic, partition-invariant point on the spectrum; the paper's
maximal-SPAN election needs overlap resolution between elected spans
(sequential per overlap chain) and stays out — paradedup.py's keep-first
covers the paragraph granularity where a canonical copy matters most.

Scale shape: gram counting is ONE corpus-scale exchange with map-side
partial aggregation (boilerplate grams are exactly the high-count keys the
combiner absorbs); the occurrence->dup join is co-partitioned with that
exchange (both sides keyed by gram); coverage explodes k rows per DUP
occurrence only (the duplicated fraction, not the corpus), then one
doc-keyed exchange rebuilds documents. At 100 TB swap the raw gram string
for xxhash64(gram) as the count/join key — same plan, 8 B keys (kept raw
here so the DuckDB oracle replays byte-identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from language_identification_spark.operators.repetition import WS_RE


def exact_substring_dedup(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_first: bool = False,
) -> DataFrame:
    """(doc_id, dedup_text, n_tokens, n_removed) per non-null-text doc.

    ``keep_first=False`` (default) removes EVERY occurrence of a duplicated
    k-gram — the decontamination-style scrub documented in the module
    docstring. ``keep_first=True`` is the paper-shaped keep-one-copy form at
    gram granularity: per duplicated gram, the globally FIRST occurrence
    (min (doc_id, pos), a total order — ids are unique, positions within a
    doc are distinct) is elected canonical and does NOT mark its positions
    covered; all other occurrences do. A canonical copy can still lose
    tokens where a DIFFERENT duplicated gram's non-elected occurrence
    overlaps it — that is the gram-granular semantics, deterministic and
    partition-invariant, not the paper's maximal-span election (which is
    sequential per overlap chain). The election is one extra groupBy(gram)
    — co-partitioned with the dup-count exchange, map-side-combinable, and
    output-bounded by the number of DISTINCT duplicated grams.
    """
    c = F.col(text_col)
    toks = F.filter(F.split(c, WS_RE), lambda x: x != "")
    base = docs.filter(c.isNotNull()).select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    )

    n = F.size(F.col("toks"))
    grams = base.select(
        "doc_id",
        F.posexplode(
            F.when(
                n >= k,
                F.transform(
                    F.sequence(F.lit(0), n - k),
                    lambda p: F.concat_ws(
                        " ", F.slice(F.col("toks"), p + 1, k)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "gram"),
    )

    dup = grams.groupBy("gram").count().filter(F.col("count") >= 2)
    occ = grams.join(dup.select("gram"), "gram")
    if keep_first:
        # elect the globally-first occurrence per duplicated gram: min over
        # the (doc_id, pos) struct is a deterministic total order; the
        # election aggregation shares the gram-keyed partitioning of the
        # dup-count exchange and is bounded by |distinct duplicated grams|
        elected = occ.groupBy("gram").agg(
            F.min(F.struct("doc_id", "pos")).alias("keep")
        )
        occ = occ.join(elected, "gram").filter(
            (F.col("doc_id") != F.col("keep.doc_id"))
            | (F.col("pos") != F.col("keep.pos"))
        )
    # co-partitioned join (both sides keyed by gram); output rows = the
    # duplicated occurrences only
    cov = (
        occ
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("cps"))
    )

    out = base.join(cov, "doc_id", "left").select(
        "doc_id",
        F.col("toks"),
        F.coalesce(F.col("cps"), F.array().cast("array<int>")).alias("cps"),
    )
    positions = F.when(
        F.size("toks") > 0, F.sequence(F.lit(0), F.size("toks") - 1)
    ).otherwise(F.array().cast("array<int>"))
    kept = F.transform(
        F.filter(positions, lambda i: ~F.array_contains(F.col("cps"), i)),
        lambda i: F.element_at(F.col("toks"), i + 1),
    )
    return out.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("dedup_text"),
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size("cps").cast("bigint").alias("n_removed"),
    )
