"""L5 Cavnar-Trenkle TextCat (operators/textcat.py) vs a row-wise Python
oracle implementing the published algorithm directly, plus the wrapper
post-processing semantics from the reference (nltk_wrapper.py:58-66):
1/dist scores, iso639-2->1 fold with unmapped codes DROPPED, normalize,
rank. The gate entry (queries.q_textcat_langid) covers the DuckDB side;
these tests cover the algorithm and the wrapper paths the gate projects out
(iso fold, language_codes filter, zero-distance guard)."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from language_identification_spark.operators.textcat import (
    textcat_distances,
    textcat_rank,
    train_textcat_profiles,
)

WS = re.compile("[\t\n\x0b\f\r ]+")


def py_profile(texts: list[str], top_k: int) -> dict[str, int]:
    c: Counter[str] = Counter()
    for text in texts:
        for w in WS.split(text.lower()):
            if not w:
                continue
            pw = f"_{w}_"
            for i in range(len(pw) - 2):
                c[pw[i : i + 3]] += 1
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return {g: i + 1 for i, (g, _) in enumerate(ranked)}


def py_distance(doc: dict[str, int], lang: dict[str, int], top_k: int) -> int:
    return sum(
        abs(r - lang[g]) if g in lang else top_k for g, r in doc.items()
    )


CORPUS = [
    ("en", "the quick brown fox jumps over the lazy dog near the river"),
    ("en", "she sells sea shells by the sea shore every sunny morning"),
    ("en", "a stitch in time saves nine and the early bird gets the worm"),
    ("de", "der schnelle braune fuchs springt ueber den faulen hund am fluss"),
    ("de", "sie verkauft muscheln am meer jeden sonnigen morgen im sommer"),
    ("de", "ein stich zur rechten zeit spart neun und der fruehe vogel faengt"),
    ("fr", "le rapide renard brun saute par dessus le chien paresseux pres"),
    ("fr", "elle vend des coquillages au bord de la mer chaque matin"),
    ("fr", "un point a temps en vaut neuf et le monde appartient a ceux"),
]

DOCS = [
    (0, "the lazy dog sells shells by the river every morning"),
    (1, "der faule hund verkauft muscheln am fluss jeden morgen"),
    (2, "le chien paresseux vend des coquillages pres de la mer"),
    (3, "the quick brown fox"),  # short doc
]

TOP_K = 50


@pytest.fixture(scope="module")
def spark_results(spark):
    corpus = spark.createDataFrame(CORPUS, ["lang", "text"])
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    profiles = train_textcat_profiles(corpus, top_k=TOP_K)
    dists = textcat_distances(docs, profiles, top_k=TOP_K)
    return profiles, dists


def test_profiles_match_python_oracle(spark_results):
    profiles, _ = spark_results
    got = {
        (r.lang, r.gram): r.rank for r in profiles.collect()
    }
    want = {}
    for lang in ("en", "de", "fr"):
        texts = [t for lg, t in CORPUS if lg == lang]
        for g, r in py_profile(texts, TOP_K).items():
            want[(lang, g)] = r
    assert got == want


def test_distances_match_python_oracle(spark_results):
    _, dists = spark_results
    got = {(r.doc_id, r.lang): r.dist for r in dists.collect()}
    lang_profiles = {
        lang: py_profile([t for lg, t in CORPUS if lg == lang], TOP_K)
        for lang in ("en", "de", "fr")
    }
    for doc_id, text in DOCS:
        doc_prof = py_profile([text], TOP_K)
        for lang, lp in lang_profiles.items():
            assert got[(doc_id, lang)] == py_distance(doc_prof, lp, TOP_K), (
                doc_id,
                lang,
            )


def test_rank_predicts_right_language(spark_results):
    _, dists = spark_results
    top = {
        r.doc_id: r.lang
        for r in textcat_rank(dists).filter("rnk = 1").collect()
    }
    assert top == {0: "en", 1: "de", 2: "fr", 3: "en"}


def test_rank_probs_normalize_and_order(spark_results):
    _, dists = spark_results
    rows = textcat_rank(dists).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.rnk)
        assert abs(sum(r.prob for r in rs) - 1.0) < 1e-12, doc_id
        dists_sorted = [r.dist for r in rs]
        assert dists_sorted == sorted(dists_sorted), doc_id
        probs = [r.prob for r in rs]
        assert probs == sorted(probs, reverse=True), doc_id


def test_iso_map_folds_and_drops(spark):
    """The wrapper maps iso639-2 -> iso639-1 and DROPS unmapped codes
    (nltk_wrapper.py:61) before normalizing — so probs re-normalize over
    the survivors only."""
    dists = spark.createDataFrame(
        [(0, "eng", 10), (0, "deu", 20), (0, "zzz", 5)],
        ["doc_id", "lang", "dist"],
    )
    rows = textcat_rank(
        dists, iso_map={"eng": "en", "deu": "de"}
    ).collect()
    got = {r.lang: (r.dist, r.prob, r.rnk) for r in rows}
    assert set(got) == {"en", "de"}  # zzz dropped
    # scores 1/10, 1/20 -> probs 2/3, 1/3 over the survivors
    assert abs(got["en"][1] - 2 / 3) < 1e-12
    assert abs(got["de"][1] - 1 / 3) < 1e-12
    assert got["en"][2] == 1 and got["de"][2] == 2


def test_language_codes_filter(spark):
    dists = spark.createDataFrame(
        [(0, "en", 10), (0, "de", 20), (0, "fr", 30)],
        ["doc_id", "lang", "dist"],
    )
    rows = textcat_rank(dists, language_codes=["en", "fr"]).collect()
    assert {r.lang for r in rows} == {"en", "fr"}
    # probs are normalized over ALL langs before the filter (wrapper order:
    # normalize then select) — en keeps 1/10 / (1/10+1/20+1/30)
    en = next(r for r in rows if r.lang == "en")
    assert abs(en.prob - (1 / 10) / (1 / 10 + 1 / 20 + 1 / 30)) < 1e-12


def test_zero_distance_guard(spark):
    """dist = 0 (doc profile == lang profile) must not crash the job; the
    reference's 1/dist would raise ZeroDivisionError (documented
    divergence, same call as the EMD short-query guard)."""
    dists = spark.createDataFrame(
        [(0, "en", 0), (0, "de", 40)], ["doc_id", "lang", "dist"]
    )
    rows = {r.lang: r for r in textcat_rank(dists).collect()}
    assert rows["en"].rnk == 1
    assert rows["en"].prob > rows["de"].prob


def test_textcat_grams_random_unicode_sweep(spark):
    """200 seeded random strings (hostile whitespace, CJK, astral, mixed
    case) -> Spark textcat_grams == the Python reference in ONE job: pins
    lowercasing order, the explicit whitespace split class, per-word '_'
    padding, and codepoint-based trigram slicing (astral chars count as ONE
    char on both engines)."""
    import random
    from language_identification_spark.operators.textcat import textcat_grams

    rng = random.Random(505)
    pool = (
        "AbZ o.'-\t\n\x0b\f\r "
        + "ÉüÑß"
        + "中文猫"
        + "\U00020000\U00010440"
    )
    rows = [
        (i, "".join(rng.choice(pool) for _ in range(rng.randint(0, 15))))
        for i in range(200)
    ]
    got: dict[int, Counter] = {}
    for r in textcat_grams(
        spark.createDataFrame(rows, "doc_id bigint, text string"), "doc_id"
    ).collect():
        got.setdefault(r.doc_id, Counter())[r.gram] += 1
    for doc_id, text in rows:
        want: Counter[str] = Counter()
        for w in WS.split(text.lower()):
            if not w:
                continue
            pw = f"_{w}_"
            for i in range(len(pw) - 2):
                want[pw[i : i + 3]] += 1
        assert got.get(doc_id, Counter()) == want, (doc_id, repr(text))


def test_iso_fold_with_real_dim_keeps_bibliographic_duplicates(spark):
    """The REAL ISO 639-2 dim has bibliographic/terminological pairs that
    fold to one 639-1 code (fra/fre -> fr, deu/ger -> de). The reference's
    list comprehension (nltk_wrapper.py:61) keeps BOTH entries as separate
    rows and normalizes over all of them — the relational form must
    preserve that multiplicity, not dedupe."""
    from language_identification_spark.operators.textcat import iso639_2_to_1

    iso = iso639_2_to_1()
    assert iso["fra"] == iso["fre"] == "fr"
    dists = spark.createDataFrame(
        [(0, "fra", 10), (0, "fre", 40), (0, "eng", 20), (0, "zzz", 5)],
        ["doc_id", "lang", "dist"],
    )
    rows = textcat_rank(dists, iso_map=iso).collect()
    langs = sorted(r.lang for r in rows)
    assert langs == ["en", "fr", "fr"]  # two fr rows survive, zzz dropped
    # probs normalize over ALL THREE surviving entries: 1/10+1/40+1/20
    z = 1 / 10 + 1 / 40 + 1 / 20
    by = sorted((r.lang, r.dist, r.prob) for r in rows)
    assert abs(by[1][2] - (1 / 10) / z) < 1e-12  # fr (dist 10)
    assert abs(by[2][2] - (1 / 40) / z) < 1e-12  # fr (dist 40)
    assert abs(by[0][2] - (1 / 20) / z) < 1e-12  # en
