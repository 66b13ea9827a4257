"""classification_metrics vs hand-computed P/R/F1, incl. degenerate classes."""

from pyspark.sql import Row

from language_identification_spark.operators.evalmetrics import (
    classification_metrics,
)

# labels: en x4, de x3, fr x2 ; predictions craft every edge:
# - 'fr' never predicted (precision 0 by zero_division convention)
# - 'xx' predicted but never true (support 0, recall 0)
PAIRS = [
    ("en", "en"),
    ("en", "en"),
    ("en", "de"),
    ("en", "xx"),
    ("de", "de"),
    ("de", "de"),
    ("de", "en"),
    ("fr", "de"),
    ("fr", "en"),
]


def test_metrics_match_hand_computation(spark):
    df = spark.createDataFrame([Row(label=l, pred=p) for l, p in PAIRS])
    got = {r.cls: r for r in classification_metrics(df).collect()}
    assert set(got) == {"en", "de", "fr", "xx"}

    en = got["en"]  # tp=2, fp=2 (de->en, fr->en), fn=2, support=4
    assert (en.tp, en.fp, en.fn, en.support) == (2, 2, 2, 4)
    assert en.precision == 0.5 and en.recall == 0.5 and en.f1 == 0.5

    de = got["de"]  # tp=2, fp=2 (en->de, fr->de), fn=1, support=3
    assert (de.tp, de.fp, de.fn, de.support) == (2, 2, 1, 3)
    assert de.precision == 0.5
    assert de.recall == round(2 / 3, 6)
    p, r = 0.5, 2 / 3
    assert de.f1 == round(2 * p * r / (p + r), 6)

    fr = got["fr"]  # never predicted: zero_division=0 convention
    assert (fr.tp, fr.fp, fr.fn, fr.support) == (0, 0, 2, 2)
    assert fr.precision == 0.0 and fr.recall == 0.0 and fr.f1 == 0.0

    xx = got["xx"]  # predicted but never true: appears with support 0
    assert (xx.tp, xx.fp, xx.fn, xx.support) == (0, 1, 0, 0)
    assert xx.precision == 0.0 and xx.recall == 0.0 and xx.f1 == 0.0


def test_perfect_classifier_f1_one(spark):
    df = spark.createDataFrame(
        [Row(label=c, pred=c) for c in ["a", "b", "a"]]
    )
    for r in classification_metrics(df).collect():
        assert r.precision == 1.0 and r.recall == 1.0 and r.f1 == 1.0
        assert r.fp == 0 and r.fn == 0


def test_corpus_crosses_once_as_counts(spark):
    """The only corpus-scale exchange is the (label, pred) count agg with a
    map-side partial below it; everything after is classes^2-sized."""
    df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).selectExpr("lang AS label", "source AS pred")
    plan = (
        classification_metrics(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    first = plan.rindex("Exchange hashpartitioning")
    assert "HashAggregate" in plan[first:], "no partial agg below the corpus exchange"
    assert "Python" not in plan
