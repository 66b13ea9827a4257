"""Sharded Bloom-filter membership (operators/bloomdedup.py).

Pins the structure's defining guarantees — zero false negatives, a false-
positive rate near the classical bound, determinism — and the plan shapes
that make it the cross-snapshot dedup primitive at 10^12 keys: a build
whose exchange is map-side combined to filter-table size, and a check that
joins the batch against the bit table without ever touching history.
"""

import math

import pytest
from pyspark.sql import functions as F

from language_identification_spark.operators.bloomdedup import (
    K_HASHES,
    M_BITS,
    N_SHARDS,
    bloom_build,
    bloom_check,
)


def _keys(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives(spark):
    """Every inserted key must come back maybe_dup — a Bloom filter's one
    hard guarantee."""
    hist = _keys(spark, 0, 500, "k")
    filt = bloom_build(hist, "key")
    res = bloom_check(hist, filt, "key")
    assert res.filter(~F.col("maybe_dup")).count() == 0


def test_false_positive_rate_near_theory(spark):
    """Non-members flag at roughly (1 - e^{-kn/m})^k. With n=500 keys in
    n_shards*m = 8*4096 bits and k=3 that's ~0.0016; allow a generous
    ceiling (hash variance at this n) and require BELOW 2%."""
    hist = _keys(spark, 0, 500, "k")
    filt = bloom_build(hist, "key")
    fresh = _keys(spark, 0, 2000, "other")
    res = bloom_check(fresh, filt, "key")
    fp = res.filter(F.col("maybe_dup")).count()
    theory = (1 - math.exp(-K_HASHES * 500 / (N_SHARDS * M_BITS))) ** K_HASHES
    assert fp / 2000 < max(0.02, 5 * theory), (fp, theory)


def test_deterministic_across_partitionings(spark):
    """Same keys, different physical layout -> identical filter words and
    identical verdicts (bit_or is commutative; addressing is pure md5)."""
    hist = _keys(spark, 0, 300, "k")
    f1 = bloom_build(hist.repartition(1), "key").collect()
    f8 = bloom_build(hist.repartition(8), "key").collect()
    assert sorted(map(tuple, f1)) == sorted(map(tuple, f8))


def test_filter_table_is_bounded(spark):
    """The bit table never exceeds n_shards * ceil(m/32) rows no matter how
    many keys are folded in — the bounded-memory property that lets 10^12
    history keys live in a few fixed MB per shard."""
    filt = bloom_build(_keys(spark, 0, 5000, "k"), "key")
    assert filt.count() <= N_SHARDS * math.ceil(M_BITS / 32)


def test_build_is_one_mapside_combined_exchange(spark):
    """Build plan: exactly one shuffle exchange, with a partial bit_or
    BELOW it — each mapper emits at most filter-table rows, so the wire
    cost is independent of history size."""
    plan = (
        bloom_build(_keys(spark, 0, 100, "k"), "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    assert len(shuffles) == 1, shuffles
    assert "partial_bit_or" in plan


def test_check_joins_filter_not_history(spark):
    """Check plan must reference only the batch probes and the bit table —
    the history relation (its scan/range) may not appear anywhere in the
    check side's plan once the filter table is materialized."""
    hist = _keys(spark, 0, 500, "marker_history_tag")
    filt_rows = bloom_build(hist, "key").collect()
    filt = (
        bloom_check(
            _keys(spark, 0, 50, "b"),
            hist.sparkSession.createDataFrame(
                filt_rows, "shard bigint, word_idx bigint, word bigint"
            ),
            "key",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "marker_history_tag" not in filt
