"""L2-L4: the reference's remaining langid backends, Spark-native.

L2 (``langid_wrapper.py:21-27``) wraps langid.py — Lui & Baldwin (2012)'s
multinomial naive Bayes over byte n-grams — as
``LanguageIdentifier.from_modelstring(model, norm_probs=True)`` +
``set_languages(codes)`` + ``rank(clean_text(text))``. We re-express the
PUBLISHED ALGORITHM relationally rather than shipping langid.py's 97-language
model blob: byte 1-4-grams (hex-encoded so both engines agree), frequency
top-K feature selection (a deterministic public proxy for the paper's
LD-feature info-gain selection — documented divergence), add-1 multinomial
NB trained from the corpus by one Spark aggregation, and langid.py's exact
post-processing order: constrain languages FIRST (set_languages masks the
class set), THEN normalize with a max-subtracted softmax (norm_probs), rank
descending. Note the opposite order vs the nltk wrapper (operators/
textcat.py), which normalizes before filtering — both orders are
reference-exact for their respective wrappers.

L3 (``langdetect_wrapper.py:17-21``): the backend is declared unshippable
(non-deterministic Gibbs seeds — SURVEY.md §2.8); its WRAPPER semantics
(split region suffix off the code, keep only supported codes, preserve
backend order) are ``langdetect_style_filter`` over any (lang, prob)
ranking table.

L4 (``cld2_wrapper.py:12-38``): the backend is a C extension (unshippable);
its WRAPPER semantics are ``cld2_style_postprocess`` over any backend's
detail table (is_reliable, language_code, percent, score): unreliable ->
no rows, region-suffix split, supported-code filter, score >= 1 gate,
percent >= 50 gate, score scaling /500 (cld2full) or /1000 (cld2), sort by
scaled score desc (the reference's ``key=lambda x: x[1:]``). Everything is
native expressions, so both are fully SQL-oracled at the gate
(queries.q_langid_nb_rank, q_cld2_postprocess).

Scale shapes: training is explode -> hash agg -> one top-K window over a
vocabulary-shaped count table; the dense model is |langs| x K rows
(broadcast). Scoring shuffles the corpus ONCE on doc_id (gram counts), joins
the broadcast model, and partial-aggregates the |langs|-way fan-out
map-side. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "clean_text_expr",
    "byte_ngrams",
    "train_langid_nb",
    "langid_nb_rank",
    "cld2_style_postprocess",
    "langdetect_style_filter",
    "BYTE_NS",
    "DEFAULT_MAX_FEATURES",
]

BYTE_NS = (1, 2, 3, 4)  # langid.py's byte n-gram orders
DEFAULT_MAX_FEATURES = 1000

# clean_text for the L2 hot path is the shared native expr (ASCII-class
# approximation of preprocessing.py:16-27 — divergences documented there).
# The byte-exact Unicode port lives in oracle/extract.py:169-185; keeping
# ONE native implementation means a fidelity fix cannot miss a copy. Java's
# \s equals the literal [ \t\n\x0b\f\r] class the DuckDB oracle spells out,
# so the two engines split identically.
from language_identification_spark.operators.extract import clean_text_expr


def byte_ngrams(
    df: DataFrame, key: str, text_col: str = "text", ns: tuple[int, ...] = BYTE_NS
) -> DataFrame:
    """(key, text) -> (key, gram) byte n-gram instances, gram = uppercase hex
    of the n raw UTF-8 bytes (both engines hex identically, so multi-byte
    codepoints never diverge). One row per OCCURRENCE (multinomial NB weights
    by count downstream)."""
    h = F.hex(F.encode(F.col(text_col), "UTF-8"))
    per_n = []
    for n in ns:
        body = F.expr(
            f"transform(sequence(1, length(hx) div 2 - {n} + 1),"
            f" i -> substring(hx, 2 * (i - 1) + 1, {2 * n}))"
        )
        # sequence(1, 0) is DESCENDING in Spark (phantom grams) — guard
        per_n.append(
            F.when(F.length("hx") >= 2 * n, body).otherwise(
                F.array().cast("array<string>")
            )
        )
    return (
        df.select(key, h.alias("hx"))
        .select(key, F.explode(F.concat(*per_n)).alias("gram"))
    )


def train_langid_nb(
    corpus: DataFrame,
    max_features: int = DEFAULT_MAX_FEATURES,
    ns: tuple[int, ...] = BYTE_NS,
    min_gram_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """corpus(lang, text) -> (model, priors).

    model: DENSE (gram, lang, logp) — every selected gram x every lang, add-1
    smoothed: ln(c + 1) - ln(tot_lang + K); priors: (lang, logprior) from
    document counts (langid.py's nb_pc). Feature selection = top
    ``max_features`` grams by corpus count, ties by gram ascending.

    Selection is limit-first (TakeOrderedAndProject: per-partition top-K
    heap, driver merge of K x partitions) — scale-safe by default; the
    distinct-gram table never crosses a single-partition exchange
    (round-5; plan-asserted in tests/test_plans.py). ``min_gram_count``
    > 1 additionally prunes the heavy-tail vocabulary before selection
    (at 10^12 docs the distinct byte 4-gram count is billions; any gram
    that can make a top-1000 profile dwarfs any sane threshold, so
    pruning is selection-neutral in practice while shrinking the count
    table the heap scans).

    Cache ownership: only K-BOUNDED frames are ``.cache``d (``features``:
    K rows; ``lang_counts``: K x |langs|) and NOT unpersisted here — the
    returned model/priors are lazy frames that re-read them on every
    downstream action, and Spark's CacheManager dedupes identical plans so
    repeated calls over the SAME corpus share entries. Long-lived sessions
    training over MANY distinct corpora should call
    ``spark.catalog.clearCache()`` between models (or materialize the small
    model and drop the lineage). Nothing corpus-shaped or vocabulary-shaped
    is ever cached, collected, or broadcast."""
    grams = byte_ngrams(
        corpus.select("lang", clean_text_expr("text").alias("text"))
        .filter(F.col("text").isNotNull()),
        "lang",
        ns=ns,
    )
    # TWO corpus passes, K-BOUNDED caches. A single-pass variant that caches
    # the full (lang, gram) count table is faster at test scale but
    # memory-unbounded at 100 TB (distinct byte 4-grams over web text run
    # into the billions x |langs|); here only feature-filtered frames —
    # `features` (K rows) and `lang_counts` (K x |langs| rows) — are cached,
    # so every downstream reference (dense model, k, scoring broadcast)
    # replays tiny cached tables, and the corpus explode runs exactly twice
    # (global counts, then per-lang counts over the broadcast feature set).
    counts = grams.groupBy("gram").agg(F.count("*").alias("c_all"))
    if min_gram_count > 1:
        # optional thresholding of the heavy-tail vocabulary — shrinks the
        # count table before selection, selection-neutral in practice
        counts = counts.filter(F.col("c_all") >= min_gram_count)
    # top-K selection is limit-first (TakeOrderedAndProject: per-partition
    # heap of K, driver-side merge of K x partitions) — NEVER a global
    # row_number window, whose single-partition exchange would pull the
    # full distinct-gram table (billions of rows at 10^12 docs) through
    # one task. Same battery-wide discipline as zipf_rank/vocab_coverage;
    # asserted for this TRAINING plan in tests/test_plans.py.
    features = (
        counts.orderBy(F.desc("c_all"), F.asc("gram"))
        .limit(max_features)
        .select("gram")
        .cache()
    )
    lang_counts = (
        grams.join(F.broadcast(features), "gram")
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("c"))
        .cache()
    )
    langs = corpus.select("lang").distinct()
    totals = lang_counts.groupBy("lang").agg(F.sum("c").alias("tot"))
    # feature / doc counts enter as 1-row broadcast joins, NOT .count()
    # driver actions — the model build stays one lazy plan end to end
    kdf = features.agg(F.count("*").alias("k"))
    dense = (
        features.crossJoin(langs)
        .join(lang_counts, ["lang", "gram"], "left")
        .join(totals, "lang", "left")
        .crossJoin(F.broadcast(kdf))
        .select(
            "gram",
            "lang",
            (
                F.log(F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                - F.log(F.coalesce(F.col("tot"), F.lit(0)) + F.col("k"))
            ).alias("logp"),
        )
    )
    # one corpus pass for priors: per-lang doc counts, total derived from
    # the |langs|-row grouped result rather than a second scan
    per_lang_docs = (
        corpus.filter(clean_text_expr("text").isNotNull())
        .groupBy("lang")
        .agg(F.count("*").alias("nl"))
        .cache()  # |langs| rows; referenced by both the total and the ratio
    )
    ndf = per_lang_docs.agg(F.sum("nl").alias("n"))
    priors = per_lang_docs.crossJoin(F.broadcast(ndf)).select(
        "lang",
        (F.log("nl") - F.log("n")).alias("logprior"),
    )
    return dense, priors


def langid_nb_rank(
    docs: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    language_codes: list[str] | None = None,
    ns: tuple[int, ...] = BYTE_NS,
) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, lang, ll, prob, rnk): langid.py's
    ``rank`` with norm_probs. set_languages semantics: the constraint masks
    the CLASS SET before normalization (langid.py LanguageIdentifier.
    set_languages), so probs sum to 1 over the allowed languages."""
    cleaned = docs.select(
        "doc_id", clean_text_expr("text").alias("text")
    ).filter(F.col("text").isNotNull())
    dg = (
        byte_ngrams(cleaned, "doc_id", ns=ns)
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("dc"))
    )
    if language_codes is not None:
        model = model.filter(F.col("lang").isin(list(language_codes)))
        priors = priors.filter(F.col("lang").isin(list(language_codes)))
    scored = (
        dg.join(F.broadcast(model), "gram")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("dc") * F.col("logp")).alias("s"))
    )
    # doc list from dg, not from a second corpus scan: any non-null cleaned
    # text has >= 1 byte, so every scored doc appears in dg (and the
    # distinct reuses dg's doc_id shuffle instead of re-running the regex
    # clean over the corpus)
    base = dg.select("doc_id").distinct().crossJoin(F.broadcast(priors))
    ll = base.join(scored, ["doc_id", "lang"], "left").select(
        "doc_id",
        "lang",
        (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("logprior")).alias("ll"),
    )
    norm = Window.partitionBy("doc_id")
    rank_w = Window.partitionBy("doc_id").orderBy(F.desc("ll"), F.asc("lang"))
    # two selects: a window result can't be an aggregate's argument
    exed = ll.withColumn(
        "ex", F.exp(F.col("ll") - F.max("ll").over(norm))
    )
    return exed.select(
        "doc_id",
        "lang",
        "ll",
        (F.col("ex") / F.sum("ex").over(norm)).alias("prob"),
        F.row_number().over(rank_w).alias("rnk"),
    )


def cld2_style_postprocess(
    details: DataFrame,
    supported: list[str],
    use_cld2full: bool = False,
) -> DataFrame:
    """L4 wrapper (cld2_wrapper.py:22-38) over a backend detail table
    (doc_id, is_reliable, language_code, percent, score): unreliable docs
    emit NO rows; '-'-suffixed codes keep the base; unsupported codes drop;
    score < 1 drops; percent < 50 drops; scaled = score/500 (cld2full) or
    /1000 (cld2); rank by scaled desc (the reference sorts on x[1:]), ties
    by code ascending for cross-engine determinism."""
    scale = 500.0 if use_cld2full else 1000.0
    base = details.filter(F.col("is_reliable")).select(
        "doc_id",
        F.split(F.col("language_code"), "-")[0].alias("lang"),
        "percent",
        "score",
    )
    kept = base.filter(
        F.col("lang").isin(list(supported))
        & (F.col("score") >= 1)
        & (F.col("percent") >= 50)
    ).withColumn("scaled", F.col("score") / scale)
    w = Window.partitionBy("doc_id").orderBy(F.desc("scaled"), F.asc("lang"))
    return kept.select(
        "doc_id", "lang", "scaled", F.row_number().over(w).alias("rnk")
    )


def langdetect_style_filter(
    ranking: DataFrame, supported: list[str]
) -> DataFrame:
    """L3 wrapper (langdetect_wrapper.py:17-21): split the region suffix off
    each code, keep only supported codes, preserve the backend's (prob)
    order. Backend itself is a declared non-goal (non-deterministic)."""
    return ranking.select(
        "doc_id",
        F.split(F.col("lang"), "-")[0].alias("lang"),
        "prob",
    ).filter(F.col("lang").isin(list(supported)))
