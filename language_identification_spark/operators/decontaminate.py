"""Benchmark decontamination — flag training docs that contain eval text.

The GPT-3/Gopher/Dolma pre-training hygiene step: a document is
CONTAMINATED when it shares at least one word n-gram (n = 8 here; published
pipelines use 8-13) with a benchmark/eval corpus. At 100 TB the shape that
matters is: the benchmark side is tiny (eval suites are megabytes), so its
distinct n-gram set is BROADCAST and the corpus side is filtered by a
map-side broadcast hash join — the corpus's exploded grams NEVER cross the
wire; only the matched rows (a vanishing fraction) reach the per-doc count
exchange. For benchmark sets too big to broadcast raw, swap the gram string
for xxhash64(gram) — same plan, 8 bytes per gram; kept as raw strings here
so the DuckDB oracle replays byte-identically.

Definitions (cross-engine exact): tokens = ``lower(text)`` split on
``[\\t\\n\\x0b\\f\\r ]+``, empties dropped (the battery-wide convention);
grams joined by a single space; a doc's contamination count is the number
of DISTINCT 8-grams it shares with the benchmark set (occurrences don't
inflate it); ``first_gram`` = the lexicographically smallest shared gram,
as human-auditable evidence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NGRAM_N = 8

WS_RE = r"[\t\n\x0b\f\r ]+"


def _tokens(c: Column) -> Column:
    return F.filter(F.split(F.lower(c), WS_RE), lambda x: x != "")


def _grams_of(toks: Column, n: int) -> Column:
    """n-grams of a token array. ``toks`` MUST be a materialized column
    (projected in its own select), never an inline expression: a column
    expression referenced inside a higher-order-function lambda is
    re-evaluated PER ELEMENT (no CSE inside lambdas — the content_blocks
    lesson, operators/blocks.py), so an inline split here re-tokenizes
    the whole text once per gram position: O(T^2) chars per doc
    (measured 2.3x on the short-doc testdata; far worse on real
    1000-token pages). Slicing a materialized column is free."""
    body = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, body).otherwise(
        F.array().cast("array<string>")
    )


def benchmark_grams(
    bench: DataFrame, text_col: str = "text", n: int = NGRAM_N
) -> DataFrame:
    """The benchmark's distinct n-gram set: one column ``gram``. Distinct
    BEFORE the broadcast so duplicated eval text costs nothing."""
    return (
        bench.filter(F.col(text_col).isNotNull())
        .select(_tokens(F.col(text_col)).alias("toks"))
        .select(F.explode(_grams_of(F.col("toks"), n)).alias("gram"))
        .distinct()
    )


def contaminated_docs(
    corpus: DataFrame,
    bench_grams_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = NGRAM_N,
) -> DataFrame:
    """(doc_id, n_contaminated, first_gram) for every corpus doc sharing at
    least one n-gram with the benchmark set. The benchmark side is
    broadcast explicitly; corpus grams are deduped per doc BEFORE the join
    (array_distinct inside the row — no extra shuffle), so the join output
    is distinct matches and the per-doc count is exact."""
    grams = (
        corpus.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            _tokens(F.col(text_col)).alias("toks"),
        )
        .select(
            "doc_id",
            F.explode(F.array_distinct(_grams_of(F.col("toks"), n))).alias(
                "gram"
            ),
        )
    )
    hits = grams.join(F.broadcast(bench_grams_df), "gram", "inner")
    return hits.groupBy("doc_id").agg(
        F.count("*").alias("n_contaminated"),
        F.min("gram").alias("first_gram"),
    )
