"""Char-entropy quality signal (operators/quality.py:char_entropy_col)."""

import math

import pytest
from pyspark.sql import functions as F

from language_identification_spark.operators.quality import char_entropy_col


def _ent(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(char_entropy_col("text").alias("h")).first().h


def test_known_entropies(spark):
    assert _ent(spark, "aaaa") == 0.0
    assert abs(_ent(spark, "abab") - 1.0) < 1e-12
    assert abs(_ent(spark, "abcd") - 2.0) < 1e-12
    # 3:1 split -> H = 2 - 0.75*log2(3)
    expected = 2.0 - 0.75 * math.log2(3)
    assert abs(_ent(spark, "aaab") - expected) < 1e-12
    assert _ent(spark, "") is None
    assert _ent(spark, None) is None


def test_low_entropy_flags_padding_not_prose(spark):
    prose = "the quick brown fox jumps over the lazy dog"
    padding = "a" * 60 + "b" * 4
    assert _ent(spark, prose) > 3.0
    assert _ent(spark, padding) < 1.0


def test_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame([("some text",)], "text string")
    plan = (
        df.select(char_entropy_col("text").alias("h"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
