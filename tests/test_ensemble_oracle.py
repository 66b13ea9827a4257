"""The ensemble_langid gate oracle (oracle/ensemble_sql.py) vs the shipped
L7 cascade (oracle/langid.py:ensemble_detect_batch) — full-row parity on an
adversarial corpus, plus proof that EVERY cascade stage fires at least once
(empty, hardcode, unique-script pin, NB win, fold win), so the driver's
sf0.01 gate row is known to exercise the whole cascade, not just the happy
Latin path."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from language_identification_spark.fixtures import training_corpus
from language_identification_spark.oracle.ensemble_sql import (
    ENSEMBLE_CONCAT_CASE,
    ENSEMBLE_CONCAT_SUFFIX,
    ENSEMBLE_FIXED,
    ENSEMBLE_MOD,
    ensemble_oracle_sql,
    mutated_text_col,
)
from language_identification_spark.oracle.langid import (
    NgramNBModel,
    ensemble_detect_batch,
    ensemble_udf,
    script_langid,
)
from language_identification_spark.oracle.extract import clean_text

# else-branch texts (doc_id % 13 in {11, 12} keeps these verbatim); the
# mutation overwrites the rest, so every ENSEMBLE_FIXED case appears twice
# across doc_id 0..27
BASE_TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "dan yang untuk dengan tidak ini itu dari saya mereka bisa akan",
    None,  # null text must survive every branch as (None, 0.0)
    "!!! ??? ... ,,,",  # punctuation-only: cleans non-empty, fold is EMPTY
    "word " * 40,
    "la vie est belle et le monde est grand aujourd'hui",
]


def _mutated_py(doc_id: int, text: str | None) -> str | None:
    m = doc_id % ENSEMBLE_MOD
    if m == ENSEMBLE_CONCAT_CASE:
        return None if text is None else text + ENSEMBLE_CONCAT_SUFFIX
    return ENSEMBLE_FIXED.get(m, text)


@pytest.fixture(scope="module")
def model():
    return NgramNBModel.train(training_corpus())


def _branch(model, text: str | None) -> str:
    """Which cascade stage resolves ``text`` (mirrors ensemble_detect_batch
    stage order; used only to assert the fixture covers every branch)."""
    cleaned = clean_text(text) if text else None
    if not cleaned:
        return "empty"
    if cleaned.lower() == "assalamualaikum":
        return "hardcode"
    lang, frac = script_langid(cleaned)
    if lang is not None and frac >= 0.5:
        return "pin"
    res_lang, res_conf = ensemble_detect_batch(model, [text])[0]
    scores = model.scores(cleaned)
    if scores and res_lang == scores[0][0] and abs(res_conf - scores[0][1] * 0.8) < 1e-12:
        return "sys"
    return "fold"


def test_ensemble_oracle_full_parity_and_branch_coverage(spark, model):
    # 64 rows: every (mod-13 mutation case x base text) pairing that matters,
    # including doc 38 (NULL text surviving the keep case) and doc 62 (NULL
    # text through the NULL-propagating concat case)
    rows = [(i, BASE_TEXTS[i % len(BASE_TEXTS)]) for i in range(64)]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    odf = (
        con.execute(ensemble_oracle_sql(model))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    det = ensemble_udf(spark, model)
    sdf = (
        docs.select(
            "doc_id",
            mutated_text_col(F.col("doc_id"), F.col("text")).alias("text"),
        )
        .select("doc_id", det("text").alias("d"))
        .select(
            "doc_id",
            F.col("d.lang").alias("lang"),
            F.round("d.conf", 6).alias("conf"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    assert len(sdf) == len(rows) == len(odf)
    for i in range(len(rows)):
        s, o = sdf.iloc[i], odf.iloc[i]
        s_lang = None if s.lang != s.lang or s.lang is None else s.lang
        o_lang = None if o.lang != o.lang or o.lang is None else o.lang
        assert s_lang == o_lang, (i, s_lang, o_lang)
        assert round(float(s.conf), 6) == round(float(o.conf), 6), (
            i, float(s.conf), float(o.conf),
        )

    branches = {
        _branch(model, _mutated_py(doc_id, text)) for doc_id, text in rows
    }
    assert branches == {"empty", "hardcode", "pin", "sys", "fold"}, branches


def test_punctuation_only_doc_has_empty_fold_but_nb_answer(model):
    """'!!!' cleans to a non-empty string with NO fold tokens (P* chars are
    neither word chars nor S-category), so the cascade must fall back to the
    NB answer — the fold-empty branch of step 6."""
    lang, conf = ensemble_detect_batch(model, ["!!! ??? ,,,"])[0]
    scores = model.scores(clean_text("!!! ??? ,,,"))
    assert lang == scores[0][0]
    assert conf == pytest.approx(scores[0][1] * 0.8, abs=1e-12)
