"""Distributed classification metrics — the north rule's own scorecard.

The acceptance criterion for the quality-filter pipeline is stated as an
F1 (keep/drop and langid vs reference labels, BASELINE.json); at corpus
scale that evaluation is itself a distributed job, so it ships as a
first-class operator: per-class confusion counts, precision, recall, F1
and support from a (label, prediction) frame.

Scale shape: the corpus crosses the wire exactly once, as (label, pred)
COUNTS (map-side-combined groupBy) — everything after operates on the
|classes|^2-row confusion table (languages: a few hundred rows). tp/fp/fn
are exact integers; precision/recall/F1 are integer-ratio doubles
computed in a fixed expression order and rounded to 6 dp, so any engine
produces identical values.

Conventions (scikit-learn's zero_division=0): a class with no predicted
rows has precision 0, no true rows recall 0, and F1 0 when P+R = 0.
Classes are the UNION of label and prediction values, so a spurious
predicted class shows up as a (0-support, 0-recall) row instead of
disappearing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classification_metrics(
    df: DataFrame, label_col: str = "label", pred_col: str = "pred"
) -> DataFrame:
    """Per-class (cls, tp, fp, fn, support, precision, recall, f1).

    Single-pass shape: the confusion table is NOT fanned out to separate
    by-label / by-pred / tp branches (each extra consumer would re-evaluate
    the whole upstream prediction DAG — measured 2.5x on the langid_eval
    gate, and at 10^12 docs that is two extra corpus passes). Instead each
    confusion cell explodes into its two class contributions (one to the
    label's support, one to the prediction's predicted-count, tp riding
    the label side), and ONE tiny groupBy(cls) sums them."""
    conf = (
        df.select(
            F.col(label_col).alias("label"), F.col(pred_col).alias("pred")
        )
        .groupBy("label", "pred")
        .agg(F.count("*").alias("c"))
    )
    contrib = conf.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("label").alias("cls"),
                    F.col("c").alias("sup_c"),
                    F.lit(0).cast("bigint").alias("pred_c"),
                    F.when(F.col("label") == F.col("pred"), F.col("c"))
                    .otherwise(F.lit(0))
                    .cast("bigint")
                    .alias("tp_c"),
                ),
                F.struct(
                    F.col("pred").alias("cls"),
                    F.lit(0).cast("bigint").alias("sup_c"),
                    F.col("c").alias("pred_c"),
                    F.lit(0).cast("bigint").alias("tp_c"),
                ),
            )
        ).alias("x")
    ).select("x.*")
    m = contrib.groupBy("cls").agg(
        F.sum("sup_c").cast("bigint").alias("support"),
        F.sum("pred_c").cast("bigint").alias("predicted"),
        F.sum("tp_c").cast("bigint").alias("tp"),
    )
    precision = F.when(
        F.col("predicted") > 0, F.col("tp") / F.col("predicted")
    ).otherwise(F.lit(0.0))
    recall = F.when(
        F.col("support") > 0, F.col("tp") / F.col("support")
    ).otherwise(F.lit(0.0))
    m = m.withColumn("p_raw", precision).withColumn("r_raw", recall)
    f1 = F.when(
        F.col("p_raw") + F.col("r_raw") > 0,
        2.0 * F.col("p_raw") * F.col("r_raw") / (F.col("p_raw") + F.col("r_raw")),
    ).otherwise(F.lit(0.0))
    return m.select(
        "cls",
        "tp",
        (F.col("predicted") - F.col("tp")).cast("bigint").alias("fp"),
        (F.col("support") - F.col("tp")).cast("bigint").alias("fn"),
        "support",
        F.round("p_raw", 6).alias("precision"),
        F.round("r_raw", 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
