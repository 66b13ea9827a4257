"""Paragraph-level global deduplication — Dolma-style boilerplate removal.

Web corpora repeat PARAGRAPHS far more than whole documents (navigation
text, subscribe boxes, copyright footers); Dolma/CCNet dedup at paragraph
granularity: every occurrence of a paragraph after its global first is
removed, and documents are reconstructed from their surviving paragraphs
(Lee et al. 2021 measure the downstream LM win from exactly this).

Definitions (cross-engine exact):

- paragraphs: ``\\n{2,}``-splits of the raw text, space-trimmed, empties
  dropped; original split position is the order key.
- first occurrence: global total order (doc_id ASC, pos ASC) over identical
  paragraph text — one winner per distinct paragraph, deterministic under
  any partitioning.
- reconstruction: surviving paragraphs re-joined with ``\\n\\n`` in original
  order. A document whose every paragraph is a duplicate reconstructs to
  ``''`` (and reports n_kept = 0) rather than vanishing.

Scale shape: ONE corpus-scale exchange — the row_number window on the
paragraph key (same cost class as exact_dedup's hash shuffle, at paragraph
granularity; swap the raw paragraph string for md5(para) as the window key
when paragraph text is large — kept raw here so the DuckDB oracle replays
byte-identically). Reconstruction groups by doc_id (second, doc-sized
exchange). Per-doc paragraph lists are web-page sized — collect_list is
row-local, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_paragraphs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dedup_text, n_kept, n_dropped) per non-null-text document:
    the document with every globally-duplicated paragraph (non-first
    occurrence) removed."""
    c = F.col(text_col)
    paras = (
        docs.filter(c.isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(c, r"\n{2,}")).alias("pos", "raw"),
        )
        .select("doc_id", "pos", F.trim(F.col("raw")).alias("para"))
        .filter(F.col("para") != "")
    )
    w = Window.partitionBy("para").orderBy("doc_id", "pos")
    flagged = paras.withColumn("kept", F.row_number().over(w) == 1)
    return flagged.groupBy("doc_id").agg(
        F.concat_ws(
            "\n\n",
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "para", "kept"))
                    ),
                    lambda x: x.kept,
                ),
                lambda x: x.para,
            ),
        ).alias("dedup_text"),
        F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
        F.sum((~F.col("kept")).cast("bigint")).alias("n_dropped"),
    )
