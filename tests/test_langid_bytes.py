"""L2-L4 (operators/langid_bytes.py) vs row-wise Python oracles: the
byte-ngram NB algorithm (train + rank, langid.py semantics), set_languages
masking order (constrain BEFORE normalize — opposite of the nltk wrapper),
and the cld2/langdetect wrapper rules from the reference
(cld2_wrapper.py:22-38, langdetect_wrapper.py:17-21). The gate entries
(langid_nb_rank, cld2_postprocess) cover the DuckDB side."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from language_identification_spark.operators.langid_bytes import (
    BYTE_NS,
    byte_ngrams,
    cld2_style_postprocess,
    langdetect_style_filter,
    langid_nb_rank,
    train_langid_nb,
)

_DIGITS = re.compile(r"\b\d+\b")
_WS = re.compile("[\t\n\x0b\f\r ]+")


def py_clean(text: str) -> str | None:
    t = _WS.sub(" ", _DIGITS.sub("", text)).strip()
    return t or None


def py_grams(text: str, ns=BYTE_NS) -> Counter:
    b = text.encode("utf-8")
    c: Counter[str] = Counter()
    for n in ns:
        for i in range(len(b) - n + 1):
            c[b[i : i + n].hex().upper()] += 1
    return c


CORPUS = [
    ("en", "the cat sat on the mat and 42 dogs watched the show"),
    ("en", "every good boy deserves fudge and the rain in spain"),
    ("de", "der hund sitzt auf der matte und schaut zu 7 katzen"),
    ("de", "jeder gute junge verdient schokolade und der regen"),
    ("zh", "猫坐在垫子上 狗在看"),
    ("zh", "今天天气很好 我们去公园"),
]

DOCS = [
    (0, "the dog sat on the mat"),
    (1, "der junge und der hund"),
    (2, "猫和狗在公园"),
    (3, "12 34 56"),  # clean_text strips to None -> no output rows
]

MF = 120


def py_model():
    lang_texts: dict[str, Counter] = {}
    all_counts: Counter[str] = Counter()
    n_docs: Counter[str] = Counter()
    total_docs = 0
    for lang, text in CORPUS:
        ct = py_clean(text)
        if ct is None:
            continue
        g = py_grams(ct)
        lang_texts.setdefault(lang, Counter()).update(g)
        all_counts.update(g)
        n_docs[lang] += 1
        total_docs += 1
    feats = [
        g
        for g, _ in sorted(all_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :MF
        ]
    ]
    k = len(feats)
    model = {}
    for lang, cnt in lang_texts.items():
        tot = sum(cnt[g] for g in feats)
        for g in feats:
            model[(g, lang)] = math.log(cnt[g] + 1.0) - math.log(tot + k)
    priors = {
        lang: math.log(n) - math.log(total_docs) for lang, n in n_docs.items()
    }
    return set(feats), model, priors


def py_rank(text: str, feats, model, priors, codes=None):
    ct = py_clean(text)
    if ct is None:
        return None
    g = py_grams(ct)
    langs = sorted(codes if codes is not None else priors)
    ll = {}
    for lang in langs:
        s = sum(c * model[(gr, lang)] for gr, c in g.items() if gr in feats)
        ll[lang] = s + priors[lang]
    mx = max(ll.values())
    exs = {lang: math.exp(x - mx) for lang, x in ll.items()}
    z = sum(exs.values())
    return {lang: (ll[lang], exs[lang] / z) for lang in langs}


@pytest.fixture(scope="module")
def trained(spark):
    corpus = spark.createDataFrame(CORPUS, ["lang", "text"])
    model, priors = train_langid_nb(corpus, max_features=MF)
    return spark, model, priors


def test_byte_ngrams_match_python(spark):
    df = spark.createDataFrame([(0, "hé猫")], ["doc_id", "text"])
    got = Counter(r.gram for r in byte_ngrams(df, "doc_id").collect())
    assert got == py_grams("hé猫")  # multi-byte boundaries exact


def test_rank_matches_python_oracle(trained):
    spark, model, priors = trained
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = langid_nb_rank(docs, model, priors).collect()
    feats, pmodel, ppriors = py_model()
    got = {(r.doc_id, r.lang): (r.ll, r.prob) for r in rows}
    assert not any(d == 3 for d, _ in got)  # digits-only doc cleaned away
    for doc_id, text in DOCS[:3]:
        want = py_rank(text, feats, pmodel, ppriors)
        for lang, (wll, wprob) in want.items():
            gll, gprob = got[(doc_id, lang)]
            assert abs(gll - wll) < 1e-9, (doc_id, lang)
            assert abs(gprob - wprob) < 1e-12, (doc_id, lang)


def test_rank_predicts_right_language(trained):
    spark, model, priors = trained
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    top = {
        r.doc_id: r.lang
        for r in langid_nb_rank(docs, model, priors)
        .filter("rnk = 1")
        .collect()
    }
    assert top == {0: "en", 1: "de", 2: "zh"}


def test_set_languages_masks_before_normalize(trained):
    """langid.py's set_languages removes classes BEFORE norm_probs, so the
    surviving probs re-normalize to 1 over the subset."""
    spark, model, priors = trained
    docs = spark.createDataFrame([DOCS[0]], ["doc_id", "text"])
    rows = langid_nb_rank(
        docs, model, priors, language_codes=["de", "zh"]
    ).collect()
    assert {r.lang for r in rows} == {"de", "zh"}
    assert abs(sum(r.prob for r in rows) - 1.0) < 1e-12
    feats, pmodel, ppriors = py_model()
    want = py_rank(DOCS[0][1], feats, pmodel, ppriors, codes=["de", "zh"])
    for r in rows:
        assert abs(r.prob - want[r.lang][1]) < 1e-12


def test_cld2_rules(spark):
    details = spark.createDataFrame(
        [
            # (doc, reliable, code, percent, score)
            (0, True, "zh-Hant", 80, 900.0),   # region folds -> zh, kept
            (0, True, "en", 49, 900.0),        # percent < 50 -> drop
            (0, True, "fr", 60, 0.5),          # score < 1 -> drop
            (0, True, "xx", 90, 900.0),        # unsupported -> drop
            (0, True, "de", 55, 400.0),        # kept, ranks below zh
            (1, False, "en", 99, 999.0),       # unreliable doc -> NO rows
        ],
        ["doc_id", "is_reliable", "language_code", "percent", "score"],
    )
    sup = ["de", "en", "fr", "zh"]
    rows = cld2_style_postprocess(details, sup).collect()
    got = [(r.doc_id, r.lang, r.scaled, r.rnk) for r in rows]
    assert sorted(got) == [(0, "de", 0.4, 2), (0, "zh", 0.9, 1)]
    # cld2full divides by 500 instead
    full = cld2_style_postprocess(details, sup, use_cld2full=True).collect()
    assert {r.lang: r.scaled for r in full} == {"zh": 1.8, "de": 0.8}


def test_langdetect_filter(spark):
    ranking = spark.createDataFrame(
        [(0, "zh-cn", 0.9), (0, "en", 0.05), (0, "qq", 0.05)],
        ["doc_id", "lang", "prob"],
    )
    rows = langdetect_style_filter(ranking, ["en", "zh"]).collect()
    assert sorted((r.lang, r.prob) for r in rows) == [
        ("en", 0.05),
        ("zh", 0.9),
    ]


def test_byte_ngrams_random_unicode_sweep(spark):
    """200 seeded random strings over a hostile char pool (controls, ASCII,
    Latin-1 supplement, CJK, astral, lone spaces) -> Spark byte_ngrams ==
    Python reference in ONE job. Pins the hex framing (2*(i-1)+1 arithmetic)
    and the short-input guard against Spark's descending sequence(1,0)."""
    import random

    rng = random.Random(404)
    pool = (
        "ab z09.'-\t\n\x0b\f\r "
        + "éüñßæçŷ"
        + "中文字猫狗"
        + "\U00020000\U00010440\U0001F600"
    )
    rows = [
        (i, "".join(rng.choice(pool) for _ in range(rng.randint(0, 12))))
        for i in range(200)
    ]
    got: dict[int, Counter] = {}
    for r in byte_ngrams(
        spark.createDataFrame(rows, "doc_id bigint, text string"), "doc_id"
    ).collect():
        got.setdefault(r.doc_id, Counter())[r.gram] += 1
    for doc_id, text in rows:
        want = py_grams(text)
        assert got.get(doc_id, Counter()) == want, (doc_id, repr(text))
