"""Kneser-Ney LM: oracle sanity, Spark-trainer bit-identity, UDF parity,
and the perplexity rule inside the full pipeline.

Mirrors the reference's fast-vs-slow cross-check pattern
(dictionary_langid/datatypes.py:337-341): the distributed trainer must equal
the in-memory oracle trainer exactly, not approximately.
"""

import math

import pytest
from pyspark.sql import functions as F

from language_identification_spark.fixtures import (
    build_pages,
    pages_df,
    training_corpus,
)
from language_identification_spark.operators.perplexity import (
    ppl_udf,
    train_kn_spark,
)
from language_identification_spark.oracle.kneser_ney import (
    train_kn,
    train_kn_per_lang,
)
from language_identification_spark.oracle.langid import NgramNBModel


@pytest.fixture(scope="module")
def corpus():
    return training_corpus()


@pytest.fixture(scope="module")
def oracle_models(corpus):
    return train_kn_per_lang(corpus, order=3)


def test_probs_sum_to_one(oracle_models):
    """For any context, sum_w p(w|ctx) over vocab+OOV must be ~1 (the KN
    normalization invariant, modified_kneser_ney.py:684-702)."""
    m = oracle_models["en"]
    vocab = sorted({g for g in m.counts[1]})
    for ctx in [" t", "th", "e ", "zz"]:  # seen and unseen contexts
        total = sum(m.prob(ctx, w) for w in vocab)
        total += m.prob(ctx, "\x00")  # an OOV char
        assert total == pytest.approx(1.0, abs=1e-9), ctx


def test_in_domain_ppl_lower(corpus, oracle_models):
    """An in-domain English doc must score far lower perplexity under the en
    model than random char soup — the basis of the quality gate."""
    m = oracle_models["en"]
    good = "the quick brown fox jumps over the lazy dog and the good people"
    garbage = "xq zv qkj wvx zzq jqx vvk xzj qqw kjz"
    assert m.perplexity(good) < m.perplexity(garbage) / 2


def test_perplexity_deterministic(oracle_models):
    m = oracle_models["en"]
    t = "good morning people of the world"
    assert m.perplexity(t) == m.perplexity(t)
    assert m.perplexity("") == float("inf")
    assert m.perplexity(None) == float("inf")


def test_spark_trainer_bit_identical(spark, corpus, oracle_models):
    """train_kn_spark == train_kn_per_lang exactly: same integer count tables,
    same discounts, bitwise-equal perplexities."""
    df = spark.createDataFrame(corpus, schema="lang string, text string")
    spark_models = train_kn_spark(df, order=3)
    assert sorted(spark_models) == sorted(oracle_models)
    for lang, om in oracle_models.items():
        sm = spark_models[lang]
        assert sm.counts == om.counts, lang
        assert sm.ctx_stats == om.ctx_stats, lang
        assert sm.discounts == om.discounts, lang
        assert sm.uni_total == om.uni_total and sm.vocab_size == om.vocab_size
        for _, text in corpus[:20]:
            assert sm.perplexity(text) == om.perplexity(text)


def test_ppl_udf_parity(spark, oracle_models):
    """Broadcast scoring UDF == row-wise oracle on the fixture pages."""
    rows = [
        (r["url"], r["text"], r["lang"])
        for r in build_pages(120)
        if r["lang"] in oracle_models and r["text"]
    ]
    df = spark.createDataFrame(rows, schema="url string, text string, lang string")
    got = {
        r["url"]: r["ppl"]
        for r in df.select(
            "url", ppl_udf(spark, oracle_models)(F.col("text"), F.col("lang")).alias("ppl")
        ).collect()
    }
    for url, text, lang in rows:
        expected = oracle_models[lang].perplexity(text)
        assert got[url] == expected, url
    # unknown language -> null, not a crash or a drop
    df2 = spark.createDataFrame(
        [("u", "some text", "xx")], schema="url string, text string, lang string"
    )
    assert (
        df2.select(
            ppl_udf(spark, oracle_models)(F.col("text"), F.col("lang")).alias("p")
        ).first()["p"]
        is None
    )


def test_word_kn_semantics():
    """Word-level KN (the reference's scoring unit): in-domain token
    sequences score far lower perplexity than shuffled-vocab garbage; OOV
    tokens are priced by the OOV bucket, not a crash."""
    from language_identification_spark.oracle.kneser_ney import WordKNModel

    sents = [
        "the cat sat on the mat".split(),
        "the dog sat on the rug".split(),
        "a cat and a dog sat".split(),
    ] * 4
    m = WordKNModel.train(sents, order=2)
    good = "the cat sat on the rug".split()
    garbage = "rug a mat the on dog".split()
    assert m.perplexity(good) < m.perplexity(garbage)
    with_oov = "the zyzzyva sat".split()
    p = m.perplexity(with_oov)
    assert p > 0 and p != float("inf")
    assert m.perplexity([]) == float("inf")
    # casefold: 'The' == 'the' (reference F6 semantics)
    assert m.perplexity(["The", "cat"]) == m.perplexity(["the", "cat"])


def test_word_kn_spark_bit_identical(spark, corpus):
    """Distributed word-KN trainer == oracle trainer on the same corpus."""
    from language_identification_spark.operators.perplexity import (
        train_word_kn_spark,
    )
    from language_identification_spark.oracle.kneser_ney import WordKNModel

    df = spark.createDataFrame(corpus, schema="lang string, text string")
    spark_models = train_word_kn_spark(df, order=2)
    by_lang: dict = {}
    for lang, text in corpus:
        by_lang.setdefault(lang, []).append(text.split())
    for lang, sents in sorted(by_lang.items()):
        om = WordKNModel.train(sents, order=2)
        sm = spark_models[lang]
        assert sm.word2sym == om.word2sym, lang
        assert sm.char_model.counts == om.char_model.counts, lang
        assert sm.char_model.discounts == om.char_model.discounts, lang
        probe = sents[0] + ["zyzzyva"]
        assert sm.perplexity(probe) == om.perplexity(probe), lang


def test_word_kn_vocab_bounded(spark):
    """Web-scale vocab safety: the Spark trainer's driver collect is bounded
    by max_vocab regardless of corpus vocabulary size, pruning happens
    distributively, and the pruned model still equals the oracle trained
    with the same (min_count, max_vocab) rule."""
    from language_identification_spark.operators.perplexity import (
        train_word_kn_spark,
    )
    from language_identification_spark.oracle.kneser_ney import WordKNModel

    # synthetic corpus with a long-tail vocabulary much larger than the cap:
    # 40 frequent head words + 2000 singleton tail words
    head = [f"head{i}" for i in range(40)]
    rows = []
    for d in range(200):
        words = [head[(d + j) % 40] for j in range(10)]
        words += [f"tail{d}_{j}" for j in range(10)]
        rows.append(("xx", " ".join(words)))
    df = spark.createDataFrame(rows, schema="lang string, text string")
    m = train_word_kn_spark(df, order=2, min_count=2, max_vocab=50)[
        "xx"
    ]
    assert len(m.word2sym) <= 50
    # singletons pruned by min_count; head words survive
    assert "head0" in m.word2sym and "tail5_3" not in m.word2sym
    om = WordKNModel.train(
        [r[1].split() for r in rows], order=2, min_count=2, max_vocab=50
    )
    assert m.word2sym == om.word2sym
    assert m.char_model.counts == om.char_model.counts
    probe = rows[0][1].split() + ["zyzzyva"]
    assert m.perplexity(probe) == om.perplexity(probe)


def test_kn_persist_roundtrip(spark, tmp_path, oracle_models):
    """save -> load rebuilds BIT-IDENTICAL models from the top-order count
    table alone (integer counts + deterministic float assembly)."""
    from language_identification_spark.operators.perplexity import (
        load_kn_models,
        save_kn_models,
    )

    path = str(tmp_path / "kn_model")
    save_kn_models(spark, oracle_models, path)
    loaded = load_kn_models(spark, path, order=3)
    assert sorted(loaded) == sorted(oracle_models)
    for lang, om in oracle_models.items():
        lm = loaded[lang]
        assert lm.counts == om.counts and lm.discounts == om.discounts
        probe = "the quick brown fox of the world"
        assert lm.perplexity(probe) == om.perplexity(probe)


def test_pipeline_perplexity_rule(spark, corpus, oracle_models):
    """With a tight max_ppl the perplexity_high rule fires on garbage but not
    on clean in-domain docs, end-to-end through quality_filter_plan."""
    from language_identification_spark.oracle.quality import QualityConfig
    from language_identification_spark.plans.pipeline import quality_filter_plan

    model = NgramNBModel.train(corpus)
    pages = pages_df(spark, 150)
    # threshold: geometric mean-ish cut between clean and garbage fixture ppl
    cfg = QualityConfig(max_ppl=40.0)
    res = quality_filter_plan(
        pages, model, config=cfg, kn_models=oracle_models
    ).collect()
    flagged = [r for r in res if "perplexity_high" in r["drop_reasons"]]
    clean_en = [
        r
        for r in res
        if r["lang_pred"] == "en" and r["keep"]
    ]
    assert flagged, "tight threshold must flag some documents"
    assert clean_en, "clean English docs must survive the ppl gate"
    # every flagged row's ppl really exceeds the threshold (and is non-null)
    for r in flagged:
        assert r["ppl"] is not None and r["ppl"] > 40.0
    # ppl column matches the oracle exactly for scored rows
    for r in res:
        if r["ppl"] is not None and r["lang_pred"] in oracle_models:
            expected = oracle_models[r["lang_pred"]].perplexity(r["extracted_text"])
            assert r["ppl"] == expected or (
                math.isinf(expected) and r["ppl"] is None
            ), r["url"]


def test_word_kn_spark_bit_identical_orders_4_and_5(spark, corpus):
    """Round-5 (VERDICT r4 #6): the order-generic trainer/scorer at orders
    4 and 5 — distributed training bit-matches the in-memory oracle, and
    scoring agrees on in-domain + OOV probes (deep-backoff paths fire:
    most 4/5-gram contexts are unseen on this corpus)."""
    from language_identification_spark.operators.perplexity import (
        train_word_kn_spark,
    )
    from language_identification_spark.oracle.kneser_ney import WordKNModel

    df = spark.createDataFrame(corpus, schema="lang string, text string")
    by_lang: dict = {}
    for lang, text in corpus:
        by_lang.setdefault(lang, []).append(text.split())
    for order in (4, 5):
        spark_models = train_word_kn_spark(df, order=order)
        for lang, sents in sorted(by_lang.items()):
            om = WordKNModel.train(sents, order=order)
            sm = spark_models[lang]
            assert sm.word2sym == om.word2sym, (order, lang)
            assert sm.char_model.counts == om.char_model.counts, (order, lang)
            assert sm.char_model.discounts == om.char_model.discounts, (
                order,
                lang,
            )
            probe = sents[0] + ["zyzzyva"]
            assert sm.perplexity(probe) == om.perplexity(probe), (order, lang)


def test_word_kn_sql_generator_reproduces_handwritten():
    """The order-N chained-CTE generator (oracle/kn_sql.py:word_kn_ppl_sql)
    generates the hand-written order-2/3 oracles value-for-value on the
    real testdata, and the order-4 form trains+scores without error with
    sane outputs (ppl > 0, NULL for NULL/empty text)."""
    import duckdb

    from language_identification_spark.oracle.kn_sql import (
        SQL_WORD_KN_PPL,
        SQL_WORD_KN_PPL_O3,
        word_kn_ppl_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    for handwritten, order, col in (
        (SQL_WORD_KN_PPL, 2, "word_ppl"),
        (SQL_WORD_KN_PPL_O3, 3, "word_ppl3"),
    ):
        h = con.execute(handwritten).df().sort_values("doc_id")
        g = (
            con.execute(word_kn_ppl_sql(order, out_col=col))
            .df()
            .sort_values("doc_id")
        )
        assert h.reset_index(drop=True).equals(g.reset_index(drop=True)), order
    o4 = con.execute(word_kn_ppl_sql(4)).df()
    assert len(o4) == 500 and (o4.word_ppl4.dropna() > 0).all()

    import pytest

    with pytest.raises(ValueError, match="order >= 2"):
        word_kn_ppl_sql(1)
