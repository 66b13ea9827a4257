"""L5: Cavnar–Trenkle TextCat language ID, Spark-native (SURVEY.md §2.8).

The reference wraps ``nltk.classify.textcat.TextCat`` — Crubadan char-trigram
profiles scored by the classic Cavnar & Trenkle (1994) out-of-place rank
distance — and post-processes in ``nltk_wrapper.py:58-66``: score =
``1/dist``, map iso639-2 codes to iso639-1 (dropping unmapped), normalize to
sum 1, sort descending, filter to the requested codes. We re-express the
ALGORITHM from the published description (n-gram profile = frequency-ranked
top-K grams; distance = sum of rank displacements with out-of-profile
penalty K) rather than shipping Crubadan's data files: profiles are TRAINED
from the corpus with one Spark aggregation, which is what a 100 TB pipeline
wants anyway (profiles from your own traffic, not a fixed 2010 crawl).

Shapes for scale: the profile table is ``|langs| x K`` rows (tiny —
broadcast); a document's own profile costs TWO count-shaped exchanges —
(doc_id, gram) for the count (instance rows are partial-aggregated
map-side first) then doc_id for the rank window; the alternative (one
up-front repartition(doc_id) reused by both) would shuffle RAW gram
instances instead of counts, which is larger whenever the per-doc gram
distribution has repeats, so the two-count-shuffle form is kept. The
distance aggregation reuses the window's doc_id partitioning (a
(doc_id, lang) grouping is satisfied by hashpartitioning(doc_id) — subset
clustering), and the distance join is fact x broadcast(langs) x
broadcast(profiles), so the corpus never shuffles onto a language key.
Everything is native expressions — no Python in the hot path. Trigram extraction, ranking, distance, and the wrapper's
normalization are all SQL-expressible, so the gate entry
(queries.py:q_textcat_langid) has a full DuckDB oracle.

Like the reference — where TextCat itself never cleans and the WRAPPER
scores ``lang_dists(clean_text(text))`` (nltk_wrapper.py:63) — these
operators take text as-is; the caller applies clean_text (the gate query
does, natively on both engines: queries.q_textcat_langid).

Determinism contract (shared with the oracle): grams are trigrams of
``'_' + word + '_'`` over lowercased whitespace-split words. The ``lower``
step is engine-identical on the gate corpus but NOT universally: Java's
full casemap emits i+U+0307 for 'İ' and the context-sensitive final sigma
'ς', where DuckDB's simple map gives 'i'/'σ' (measured) — the same
testdata-scoped equivalence already documented for norm_text's
``exact_casefold=False`` gate variant (functions/text.py:118-128). Turkish/
Greek corpora need a casefold UDF on the Spark side or a pre-normalization
both engines share. Rank ties
break by gram ascending; distance ties break by lang ascending; the
``1/dist`` of the wrapper is guarded as ``1/greatest(dist, 1)`` — dist = 0
means the document profile IS the language profile, where the reference
would divide by zero; a distributed job must not crash on one degenerate
row (same loud-vs-robust call as the EMD short-query divergence,
operators/fuzzy.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from language_identification_spark.functions import char_ngrams_expr
from language_identification_spark.oracle._lang_dims import ISO639_2_1

__all__ = [
    "textcat_grams",
    "train_textcat_profiles",
    "textcat_distances",
    "textcat_rank",
    "DEFAULT_TOP_K",
]

DEFAULT_TOP_K = 300  # Cavnar & Trenkle's classic profile length


def textcat_grams(df: DataFrame, key: str, n: int = 3) -> DataFrame:
    """(key, text) rows -> (key, gram): char n-grams of each ``_``-padded
    lowercased whitespace-split word (C&T's per-word padding — no grams span
    a word boundary). Words shorter than ``n - 2`` still yield their padded
    grams (``'_a_'``); empty splits yield nothing. Pure native exprs.

    Splits on the explicit ASCII-whitespace class, NOT ``\\s``: Java's
    ``\\s`` includes U+000B but RE2's (DuckDB's) does not, so the oracle
    would segment vertical-tab text differently (same guard as
    queries.q_term_cleanup)."""
    words = df.select(
        key,
        F.explode(F.split(F.lower(F.col("text")), "[\t\n\x0b\f\r ]+")).alias("w"),
    ).filter(F.col("w") != "")
    padded = words.withColumn(
        "pw", F.concat(F.lit("_"), F.col("w"), F.lit("_"))
    )
    return padded.select(key, F.explode(char_ngrams_expr("pw", n)).alias("gram"))


def _ranked(grams: DataFrame, key: str, top_k: int) -> DataFrame:
    """(key, gram) rows -> (key, gram, rank) frequency-ranked top-K profile.
    Ties break by gram ascending so both engines agree."""
    counts = grams.groupBy(key, "gram").agg(F.count("*").alias("c"))
    w = Window.partitionBy(key).orderBy(F.desc("c"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(key, "gram", "rank")
    )


def train_textcat_profiles(
    corpus: DataFrame, n: int = 3, top_k: int = DEFAULT_TOP_K
) -> DataFrame:
    """corpus(lang, text) -> profile table (lang, gram, rank), rank 1..K.

    One explode + one hash agg + one |langs|-partition window — the Spark
    form of C&T "sort the n-gram frequencies, keep the top 300"."""
    return _ranked(textcat_grams(corpus, "lang", n), "lang", top_k)


def textcat_distances(
    docs: DataFrame,
    profiles: DataFrame,
    n: int = 3,
    top_k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """docs(doc_id, text) x profiles(lang, gram, rank) -> (doc_id, lang, dist).

    Out-of-place distance: for each gram of the document's own top-K
    profile, ``abs(doc_rank - lang_rank)``, or ``top_k`` when the language
    profile lacks the gram. Every (doc, lang) pair gets a row (missing =
    all-penalty, as in the algorithm)."""
    doc_prof = _ranked(textcat_grams(docs, "doc_id", n), "doc_id", top_k)
    langs = profiles.select("lang").distinct()
    return (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(profiles.withColumnRenamed("rank", "lang_rank")),
            ["lang", "gram"],
            "left",
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("rank") - F.col("lang_rank")), F.lit(top_k)
                )
            ).alias("dist")
        )
    )


def textcat_rank(
    dists: DataFrame,
    language_codes: list[str] | None = None,
    iso_map: dict[str, str] | None = None,
) -> DataFrame:
    """The wrapper post-processing (nltk_wrapper.py:58-66) relationally:
    score = 1/greatest(dist,1), optional iso639-2→1 code mapping (unmapped
    codes DROPPED, nltk_wrapper.py:61), per-doc normalization to sum 1,
    ranked descending (ties: lang asc), optional filter to allowed codes.

    Returns (doc_id, lang, dist, prob, rnk) — rnk = 1 is the prediction."""
    if iso_map is not None:
        mapping = F.create_map(
            *[F.lit(x) for kv in iso_map.items() for x in kv]
        )
        dists = dists.withColumn("lang", mapping[F.col("lang")]).filter(
            F.col("lang").isNotNull()
        )
    scored = dists.withColumn(
        "score", F.lit(1.0) / F.greatest(F.col("dist"), F.lit(1))
    )
    norm = Window.partitionBy("doc_id")
    rank_w = Window.partitionBy("doc_id").orderBy(
        F.asc("dist"), F.asc("lang")
    )
    out = scored.select(
        "doc_id",
        "lang",
        "dist",
        (F.col("score") / F.sum("score").over(norm)).alias("prob"),
        F.row_number().over(rank_w).alias("rnk"),
    )
    if language_codes is not None:
        out = out.filter(F.col("lang").isin(list(language_codes)))
    return out


def iso639_2_to_1() -> dict[str, str]:
    """The reference's iso639_2_1 dim (iso639_3.py), as used at
    nltk_wrapper.py:61 to fold Crubadan's 3-letter codes."""
    return dict(ISO639_2_1)
