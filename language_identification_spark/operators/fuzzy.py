"""Fuzzy word matching: n-gram candidate join + grouped-map DL re-scoring.

The reference's ApproxWordList lookup (J7/J8: datatypes.py:733-749 candidate
generation via shared char n-grams; dictionary_langid/datatypes.py:567-617
re-scoring with a Damerau-Levenshtein tie-break and top-k) as a two-stage
Spark plan:

1. **candidate generation** — explode char bigrams of query and vocabulary,
   equi join on the bigram, distinct (the set-similarity join skeleton; at
   scale the vocabulary side is the broadcast dimension). No quadratic scan:
   a query only ever meets words it shares a bigram with.
2. **re-scoring** — ``groupBy(query).applyInPandas``: each query's candidate
   set arrives as one pandas DataFrame, restricted Damerau-Levenshtein runs
   per candidate, top-k emitted with a total (distance asc, word asc)
   tie-break. This is the engine's one grouped-map UDF (SURVEY.md §2.10) —
   the per-group state (sorting a candidate list) is what plain scalar UDFs
   cannot express.

Row-wise oracle: ``fuzzy_topk_oracle`` (tested equal).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from language_identification_spark.functions import char_ngrams_expr
from language_identification_spark.functions.text import _damerau_levenshtein
from language_identification_spark.oracle.tokenize import char_ngrams

RESULT_SCHEMA = "query string, word string, dist int, rank int"


def _grams_df(df: DataFrame, col: str, out: str) -> DataFrame:
    return df.select(
        F.col(col).alias(out),
        F.explode(char_ngrams_expr(F.lower(F.col(col)), 2)).alias("g"),
    ).distinct()


def fuzzy_topk(
    vocab: DataFrame, queries: DataFrame, k: int = 3
) -> DataFrame:
    """Top-k fuzzy matches per query word against the vocabulary.

    ``vocab``: one column ``word``; ``queries``: one column ``query``.
    """
    cands = (
        _grams_df(queries, "query", "query")
        .join(F.broadcast(_grams_df(vocab, "word", "word")), "g")
        .select("query", "word")
        .distinct()
    )

    def rescore(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["query"].iloc[0]
        ql = q.lower()
        scored = sorted(
            ((_damerau_levenshtein(ql, w.lower()), w) for w in pdf["word"]),
            key=lambda t: (t[0], t[1]),
        )[:k]
        return pd.DataFrame(
            {
                "query": [q] * len(scored),
                "word": [w for _, w in scored],
                "dist": pd.Series([d for d, _ in scored], dtype="int32"),
                "rank": pd.Series(range(1, len(scored) + 1), dtype="int32"),
            }
        )

    return cands.groupBy("query").applyInPandas(rescore, schema=RESULT_SCHEMA)


def fuzzy_topk_oracle(
    vocab: list[str], queries: list[str], k: int = 3
) -> dict[str, list[tuple[str, int]]]:
    """Row-wise reference semantics: same candidate rule (shared lowercase
    char bigram), same DL re-score, same total tie-break."""
    vocab_grams = {w: set(char_ngrams(w.lower(), 2)) for w in vocab}
    out: dict[str, list[tuple[str, int]]] = {}
    for q in queries:
        qg = set(char_ngrams(q.lower(), 2))
        cands = [w for w, gs in vocab_grams.items() if gs & qg]
        scored = sorted(
            ((_damerau_levenshtein(q.lower(), w.lower()), w) for w in cands),
            key=lambda t: (t[0], t[1]),
        )[:k]
        out[q] = [(w, d) for d, w in scored]
    return out


def fuzzy_topk_dfs(
    spark: SparkSession, vocab: list[str], queries: list[str], k: int = 3
) -> DataFrame:
    return fuzzy_topk(
        spark.createDataFrame([(w,) for w in vocab], "word string"),
        spark.createDataFrame([(q,) for q in queries], "query string"),
        k=k,
    )
