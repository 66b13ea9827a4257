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

from collections.abc import Iterator

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


def _dl_bounded(a: str, b: str, cutoff: float) -> int | None:
    """Restricted Damerau-Levenshtein with exact early abandon: returns the
    exact distance when it is <= cutoff, else None. Sound because DP row
    minima are non-decreasing (each cell derives from min over the previous
    rows' cells +>=0, including the transposition term), so once
    min(row) > cutoff the final distance must exceed cutoff. Identical
    recurrence to functions.text._damerau_levenshtein."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cutoff:
        return None
    if la == 0:
        return lb if lb <= cutoff else None
    if lb == 0:
        return la if la <= cutoff else None
    prev2: list[int] = []
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        rowmin = i
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                v = min(v, prev2[j - 2] + cost)
            cur[j] = v
            if v < rowmin:
                rowmin = v
        if rowmin > cutoff:
            return None
        prev2, prev = prev, cur
    return prev[lb] if prev[lb] <= cutoff else None


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
        # exact pruning: DL(q, w) >= |len(q) - len(w)|, so scanning
        # candidates in ascending length-difference order lets us stop as
        # soon as the bound strictly exceeds the current k-th best distance
        # (ties can still displace by word order, so equality continues).
        # Identical output to the full scan — measured 5-10x fewer DL calls
        # per probe on the real bhanot vocabulary (tests/test_bhanot_scale).
        cands = sorted(pdf["word"], key=lambda w: (abs(len(w) - len(ql)), w))
        top: list[tuple[int, str]] = []
        for w in cands:
            lb = abs(len(w) - len(ql))
            if len(top) == k and lb > top[-1][0]:
                break
            cutoff = top[-1][0] if len(top) == k else float("inf")
            d = _dl_bounded(ql, w.lower(), cutoff)
            if d is None:  # exact: true distance > current k-th best
                continue
            top.append((d, w))
            top.sort(key=lambda t: (t[0], t[1]))
            del top[k:]
        return pd.DataFrame(
            {
                "query": [q] * len(top),
                "word": [w for _, w in top],
                "dist": pd.Series([d for d, _ in top], dtype="int32"),
                "rank": pd.Series(range(1, len(top) + 1), dtype="int32"),
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


# ---------------------------------------------------------------------------
# J8: positional-EMD fuzzy matcher (ApproxWordList3 semantics,
# dictionary_langid/datatypes.py:477-617)
# ---------------------------------------------------------------------------

STX, ETX = "\x02", "\x03"


def _gram_locations(word: str, n: int) -> dict[str, tuple[float, ...]]:
    """Padded n-gram -> normalized positions (datatypes.py:544-561): word is
    wrapped in STX/ETX, gram index normalized by (count - 1). Words shorter
    than n-1 chars (a single padded gram) put it at position 0."""
    padded = f"{STX}{word}{ETX}"
    grams = [padded[i : i + n] for i in range(len(word) - n + 3)]
    locs: dict[str, list[float]] = {}
    if len(grams) > 1:
        for idx, g in enumerate(grams):
            locs.setdefault(g, []).append(idx / (len(grams) - 1))
    elif grams:
        locs.setdefault(grams[0], []).append(0.0)
    return {g: tuple(ls) for g, ls in locs.items()}


def _emd_scores(
    query: str,
    cand_rows: list[tuple[str, int, tuple[float, ...], tuple[float, ...]]],
    n_list: tuple[int, ...],
) -> dict[str, list[float]]:
    """Accumulate per-(word, n) scores: max(|q_locs|, |w_locs|) - EMD per
    shared gram, then normalize by the query's padded gram count for that n
    (datatypes.py:567-585). cand_rows: (word, n, q_locs, w_locs) per shared
    gram.

    Uses emd_1d_fast directly — the fast==slow cross-check assert stays in
    tests (the slow recursion is exponential-state; inside a Spark rescore
    a repeated-char word would make it a DoS). Queries shorter than n-2
    have ZERO grams of that n: the reference divides by their gram count
    anyway and raises ZeroDivisionError (datatypes.py:581-583); we define
    that n's contribution as 0.0 instead so one short query cannot kill a
    distributed job (intentional divergence)."""
    from language_identification_spark.oracle.emd import emd_1d_fast

    n_idx = {n: i for i, n in enumerate(n_list)}
    matches: dict[str, list[float]] = {}
    for word, n, q_locs, w_locs in cand_rows:
        scores = matches.setdefault(word, [0.0] * len(n_list))
        scores[n_idx[n]] += max(len(q_locs), len(w_locs)) - emd_1d_fast(
            list(q_locs), list(w_locs)
        )
    for word, scores in matches.items():
        matches[word] = [
            (scores[i] / denom if (denom := len(query) - n + 3) > 0 else 0.0)
            for i, n in enumerate(n_list)
        ]
    return matches


def _rank_emd_matches(
    query: str,
    matches: dict[str, list[float]],
    top_k: int,
) -> list[tuple[str, float, int, int]]:
    """Mean over n-grams sizes (dim=1), then the reference's cutoff: fetch
    top_k*2, keep score >= 0.9*top OR Damerau-Levenshtein <= 1, return
    top_k (datatypes.py:592-617). Ties broken totally (score desc, word
    asc) — the reference inherits Counter insertion order; a total order is
    required for distributed determinism. Rows: (word, score[3dp], dl, rank)."""
    if not matches:
        return []
    avg = {w: sum(s) / len(s) for w, s in matches.items()}
    ranked = sorted(avg.items(), key=lambda kv: (-kv[1], kv[0]))
    top_score = ranked[0][1]
    out = []
    for word, score in ranked[: top_k * 2]:
        dl = _damerau_levenshtein(query, word)
        if score >= top_score * 0.9 or dl <= 1:
            out.append((word, round(score, 3), dl))
    return [
        (word, score, dl, rank)
        for rank, (word, score, dl) in enumerate(out[:top_k], start=1)
    ]


def emd_fuzzy_oracle(
    vocab: list[str],
    queries: list[str],
    n_list: tuple[int, ...] = (2, 4),
    top_k: int = 10,
) -> dict[str, list[tuple[str, float, int, int]]]:
    """Row-wise ApproxWordList3: index casefolded vocab grams, score each
    query via positional EMD over shared grams."""
    index: dict[int, dict[str, dict[str, tuple[float, ...]]]] = {}
    for n in n_list:
        per_word: dict[str, dict[str, tuple[float, ...]]] = {}
        for w in vocab:
            per_word[w.casefold()] = _gram_locations(w.casefold(), n)
        index[n] = per_word
    out = {}
    for q in queries:
        qc = q.casefold()
        rows = []
        for n in n_list:
            q_locs = _gram_locations(qc, n)
            for word, w_gram_locs in index[n].items():
                for g, ql in q_locs.items():
                    wl = w_gram_locs.get(g)
                    if wl is not None:
                        rows.append((word, n, ql, wl))
        out[q] = _rank_emd_matches(qc, _emd_scores(qc, rows, n_list), top_k)
    return out


EMD_RESULT_SCHEMA = "query string, word string, score double, dl int, rank int"


def emd_fuzzy_topk(
    vocab: DataFrame,
    queries: DataFrame,
    n_list: tuple[int, ...] = (2, 4),
    top_k: int = 10,
) -> DataFrame:
    """Distributed ApproxWordList3: per-n padded-gram location rows on both
    sides, equi-join on (n, gram) — the set-similarity join again, vocab
    side broadcast — then ONE grouped-map per query replays the exact oracle
    scoring (shared helpers; bit-parity by construction, tested)."""
    from language_identification_spark.functions.text import casefold_udf

    # the reference index dedups casefolded vocabulary (add_word returns
    # early on known words) — mirror that before gram explosion, or case
    # variants would double their scores
    vocab = vocab.select(casefold_udf(F.col("word")).alias("word")).distinct()

    def gram_rows(df: DataFrame, col: str) -> DataFrame:
        @F.pandas_udf("array<struct<n int, gram string, locs array<double>>>")
        def _grams(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            def one(w):
                wc = w.casefold()
                return [
                    {"n": n, "gram": g, "locs": list(ls)}
                    for n in n_list
                    for g, ls in _gram_locations(wc, n).items()
                ]

            for series in batches:
                yield series.map(one)

        return (
            df.select(
                F.col(col).alias("orig"),
                F.explode(_grams(F.col(col))).alias("g"),
            )
            .select("orig", "g.n", "g.gram", "g.locs")
        )

    v = gram_rows(vocab, "word").withColumnRenamed("orig", "word").withColumnRenamed("locs", "w_locs")
    q = gram_rows(queries, "query").withColumnRenamed("orig", "query").withColumnRenamed("locs", "q_locs")
    cands = q.join(F.broadcast(v), ["n", "gram"]).select(
        "query", "word", "n", "q_locs", "w_locs"
    )

    def rescore(pdf: pd.DataFrame) -> pd.DataFrame:
        query = pdf["query"].iloc[0]
        qc = query.casefold()
        rows = [
            (w.casefold(), int(n), tuple(ql), tuple(wl))
            for w, n, ql, wl in zip(
                pdf["word"], pdf["n"], pdf["q_locs"], pdf["w_locs"]
            )
        ]
        ranked = _rank_emd_matches(qc, _emd_scores(qc, rows, n_list), top_k)
        return pd.DataFrame(
            {
                "query": [query] * len(ranked),
                "word": [w for w, _, _, _ in ranked],
                "score": [s for _, s, _, _ in ranked],
                "dl": pd.Series([d for _, _, d, _ in ranked], dtype="int32"),
                "rank": pd.Series([r for _, _, _, r in ranked], dtype="int32"),
            }
        )

    return cands.groupBy("query").applyInPandas(rescore, schema=EMD_RESULT_SCHEMA)
