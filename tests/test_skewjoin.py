"""salted_skew_join: row parity with the plain join + salt-spread evidence."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from language_identification_spark.operators.hoststats import (
    salted_skew_join,
)


def _fixture(spark):
    # 80% of rows on one hot key
    fact = spark.createDataFrame(
        [
            Row(doc_id=i, host="hot.com" if i % 5 != 0 else f"h{i}.com", v=i)
            for i in range(100)
        ]
    )
    dim = fact.select("host").distinct().withColumn(
        "score", F.length("host").cast("bigint")
    )
    return fact, dim


def test_salted_join_row_identical_to_plain_join(spark):
    fact, dim = _fixture(spark)
    got = sorted(
        (r.doc_id, r.host, r.score)
        for r in salted_skew_join(fact, dim, "host").collect()
    )
    want = sorted(
        (r.doc_id, r.host, r.score) for r in fact.join(dim, "host").collect()
    )
    assert got == want and len(got) == 100


def test_salt_is_in_the_shuffle_key(spark):
    """With broadcast disabled (the mid-size-dim scenario this operator
    exists for), both exchange keys must include _salt — that is the
    mechanism that splits a Zipf-head key across salt_buckets reducers."""
    fact, dim = _fixture(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            salted_skew_join(fact, dim, "host")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # the JOIN keys carry the salt...
    join_lines = [
        ln
        for ln in plan.splitlines()
        if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
    ]
    assert join_lines and all("_salt" in ln for ln in join_lines), plan
    # ...and so do both join-input exchanges (the fixture's dim-building
    # distinct() has its own salt-free exchange, which is fine)
    salted_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "_salt" in ln
    ]
    assert len(salted_exchanges) >= 2, plan


def test_hot_key_spreads_over_salt_partitions(spark):
    """The hot key's rows must occupy > 1 partition after the salted
    exchange (the unsalted join puts them all in one)."""
    fact, dim = _fixture(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE would coalesce this fixture-sized shuffle into one partition and
    # hide the spread; at real scale the partitions are far above the
    # coalesce target. Pin it off for the observation.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = salted_skew_join(fact, dim, "host", salt_buckets=8)
        n_parts = (
            joined.filter(F.col("host") == "hot.com")
            .select(F.spark_partition_id().alias("pid"))
            .distinct()
            .count()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert n_parts > 1
