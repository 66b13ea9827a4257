"""Checksum-validated credit-card scrub (operators/scrub.py:scrub_cards_expr
+ oracle/scrub.py:scrub_cards/luhn_valid).

Pins the Presidio-style contract: a candidate regex alone over-matches, so
only Luhn-VALID candidates are masked; checksum failures (order numbers,
timestamps) must pass through. The native expr must agree byte-for-byte
with the Python reference, and the whole thing must stay a zero-shuffle
narrow map.
"""

import pytest
from pyspark.sql import functions as F

from language_identification_spark.operators.scrub import (
    card_candidates,
    scrub_cards_expr,
)
from language_identification_spark.oracle.scrub import luhn_valid, scrub_cards

VALID = ["4111111111111111", "378282246310005", "4222222222222",
         "5555555555554444", "6011111111111117"]
INVALID = ["4111111111111112", "1234567890123", "4222222222223"]


def test_luhn_known_vectors():
    for v in VALID:
        assert luhn_valid(v), v
    for v in INVALID:
        assert not luhn_valid(v), v
    assert luhn_valid("4111-1111-1111-1111")  # separators stripped


def test_reference_masks_valid_only():
    assert scrub_cards("pay 4111111111111111 now") == "pay <CC> now"
    assert (
        scrub_cards("order 4111111111111112 stays")
        == "order 4111111111111112 stays"
    )
    assert scrub_cards("a 4111 1111 1111 1111 b") == "a <CC> b"
    # 20+ digit runs are not candidates (\b can't fall inside a digit run)
    long_run = "id 41111111111111111111111 x"
    assert scrub_cards(long_run) == long_run
    assert scrub_cards(None) is None


HOSTILE = [
    "pay 4111-1111-1111-1111 now",
    "amex 378282246310005 ok",
    "bad 4111111111111112 stays",
    "short 4222222222222.",
    "long 41111111111111111111111 run",
    "two 4111 1111 1111 1111 and 378282246310005",
    "dup 4111111111111111 and 4111111111111111 twice",
    "edge4111111111111111touching",  # letter-digit IS a \b boundary
    "ip 10.0.0.1 phone +1 555 123 4567",
    "none here",
    "",
    None,
]


def test_expr_matches_reference_on_hostile_corpus(spark):
    df = spark.createDataFrame([(t,) for t in HOSTILE], "text string")
    rows = df.select(
        "text", scrub_cards_expr(F.col("text")).alias("sc")
    ).collect()
    for r in rows:
        assert r.sc == scrub_cards(r.text), r.text


def test_scrub_is_zero_shuffle_narrow_map(spark):
    df = spark.createDataFrame([(t,) for t in HOSTILE if t], "text string")
    plan = (
        df.select(
            scrub_cards_expr(F.col("text")).alias("sc"),
            F.size(card_candidates(F.col("text"))).alias("n"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
