"""BM25 term-based retrieval over the documents table.

The training-pipeline suite (SURVEY.md 2.11) covers similarity search on
the embedding side (cosine top-k, IVF, hyperplane LSH); BM25 is the text
side of the same need — retrieval-based decontamination, data-curation
"find documents about X" probes, and sparse-retrieval baselines next to
the dense ANN path. Formula: the Robertson/Sparck-Jones BM25 with the
standard Lucene-style non-negative idf,

    idf(t)   = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d) = sum_t idf(t) * tf_td * (k1+1) / (tf_td + k1*(1 - b + b*dl_d/avgdl))

with k1=1.2, b=0.75 (the universal defaults).

Scale shape (the 100 TB contract):
- The term filter is applied DIRECTLY on the exploded token stream as an
  IN-list over a literal set — rows that match no query term die in the
  scan stage, so the (doc_id, word) shuffle carries only matching tokens
  (|terms| is user-query-sized, so this is a ~zero-selectivity filter at
  web scale).
- tf aggregation is a map-side-combinable count on (doc_id, word).
- df_t and the corpus stats (N, avgdl) aggregate to |terms| rows and TWO
  scalars respectively — both re-enter the plan via broadcast, the fact
  side never reshuffles for them.
- Top-k is orderBy+limit -> TakeOrderedAndProject (per-partition heap +
  driver merge of k rows), never a global sort.
Corpus stats (N, avgdl) are a SECOND scan of the text column — BM25
needs dl for every doc, matched or not, so some full-width pass is
unavoidable; when the corpus is iterated repeatedly (a query service),
persist the (doc_id, dl) projection once and both branches reuse it.

Query terms are SET semantics: duplicates in ``terms`` are collapsed
(each distinct term contributes once) — the common IR-library default;
weight repeated terms upstream if bag semantics are wanted.

Cross-engine determinism: scores are rounded to 4 decimals and ranked by
(rounded score desc, doc_id asc) in both engines, the same discipline as
the cosine/IVF gates (queries.py q_cosine_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    ``terms`` is query-sized (broadcast-small); ``docs`` is corpus-sized.
    Returns (doc_id, score, rank) with score rounded to 4 decimals.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = sorted(set(terms))

    # NULL text must not reach size(): with legacy sizeOfNull, size(NULL)
    # is -1 and every NULL doc would DEFLATE avgdl (review finding); the
    # DuckDB oracle's avg() skips NULLs, so dropping them keeps parity
    docs = docs.filter(F.col(text_col).isNotNull())
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("dl"),
        F.explode(words).alias("word"),
    )
    # corpus stats: two scalars, computed from the doc table (not the
    # exploded stream) so N counts empty docs too
    stats = docs.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(words)).alias("avgdl"),
    )

    matches = toks.filter(F.col("word").isin(list(terms)))
    tf = matches.groupBy("doc_id", "word", "dl").agg(
        F.count("*").alias("tf")
    )
    df_t = (
        matches.groupBy("word")
        .agg(F.count_distinct("doc_id").alias("df"))
    )

    scored = (
        tf.join(F.broadcast(df_t), "word")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.col("avgdl")
                )
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.round(F.sum("w"), 4).alias("score")
    )
    # limit first (TakeOrderedAndProject — per-partition heap, k rows to
    # the driver-side merge), THEN rank: the row_number window runs over
    # exactly k rows, not the corpus
    top = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    rank_w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "score",
        F.row_number().over(rank_w).cast("int").alias("rank"),
    )
