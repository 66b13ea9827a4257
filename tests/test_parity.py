"""The core correctness gate: Spark pipeline == row-wise oracle, byte-identical.

BASELINE.json input_hint: "per-row invariant vs the reference: byte-identical
extracted text per url" and "F1 >= 0.99 vs reference labels". The oracle module
plays the reference role (same semantics, pure Python, row-at-a-time); the
Spark pipeline must reproduce it exactly per url.
"""

import pytest

from language_identification_spark.fixtures import build_pages, pages_df, training_corpus
from language_identification_spark.oracle.extract import extract_text
from language_identification_spark.oracle.langid import NgramNBModel
from language_identification_spark.oracle.quality import (
    QualityConfig,
    apply_rules,
    doc_stats,
)
from language_identification_spark.oracle.scrub import scrub_text
from language_identification_spark.plans.pipeline import quality_filter_plan

N_PAGES = 300


@pytest.fixture(scope="module")
def model():
    return NgramNBModel.train(training_corpus())


@pytest.fixture(scope="module")
def oracle_results(model):
    cfg = QualityConfig()
    out = {}
    for row in build_pages(N_PAGES):
        text = extract_text(row["html"])
        lang, conf = model.detect(text)
        reasons = apply_rules(
            doc_stats(text), cfg, lang_conf=conf, empty=text is None, lang=lang
        )
        out[row["url"]] = {
            "extracted_text": text,
            "scrubbed_text": scrub_text(text),
            "lang_pred": lang,
            "lang_conf": conf,
            "keep": not reasons,
            "drop_reasons": reasons,
            "true_lang": row["lang"],
        }
    return out


@pytest.fixture(scope="module")
def spark_results(spark, model):
    plan = quality_filter_plan(pages_df(spark, N_PAGES), model, QualityConfig())
    return {r["url"]: r.asDict() for r in plan.collect()}


def test_row_counts(oracle_results, spark_results):
    assert len(spark_results) == len(oracle_results) == N_PAGES


def test_extracted_text_byte_identical(oracle_results, spark_results):
    for url, o in oracle_results.items():
        assert spark_results[url]["extracted_text"] == o["extracted_text"], url


def test_scrubbed_text_identical(oracle_results, spark_results):
    for url, o in oracle_results.items():
        assert spark_results[url]["scrubbed_text"] == o["scrubbed_text"], url


def test_lang_and_conf_identical(oracle_results, spark_results):
    for url, o in oracle_results.items():
        s = spark_results[url]
        assert s["lang_pred"] == o["lang_pred"], url
        assert s["lang_conf"] == pytest.approx(o["lang_conf"], abs=1e-12), url


def test_keep_drop_identical(oracle_results, spark_results):
    for url, o in oracle_results.items():
        s = spark_results[url]
        assert s["keep"] == o["keep"], (url, s["drop_reasons"], o["drop_reasons"])
        assert list(s["drop_reasons"]) == o["drop_reasons"], url


def test_langid_f1_vs_reference_labels(oracle_results, spark_results):
    """Micro-F1 (=accuracy, single-label) on rows with a real language label
    must clear the 0.99 bar (BASELINE.json metric)."""
    labeled = [
        (o["true_lang"], spark_results[url]["lang_pred"])
        for url, o in oracle_results.items()
        if o["true_lang"] != "und" and o["extracted_text"]
    ]
    assert len(labeled) > 100
    f1 = sum(1 for t, p in labeled if t == p) / len(labeled)
    assert f1 >= 0.99, f"lang F1 {f1:.4f} on {len(labeled)} rows"


def test_keep_f1_vs_oracle_labels(oracle_results, spark_results):
    """Keep/drop F1 vs the oracle's labels (the 'reference labels' of the
    north rule). Byte-identity above implies 1.0; assert explicitly."""
    tp = fp = fn = 0
    for url, o in oracle_results.items():
        s, t = spark_results[url]["keep"], o["keep"]
        tp += s and t
        fp += s and not t
        fn += (not s) and t
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99
