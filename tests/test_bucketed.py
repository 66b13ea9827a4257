"""Bucketed-layout co-located joins (sources/bucketed.py): the write
persists bucket metadata, and joins/aggregations on the bucket key are
exchange-free — the scale property that converts every downstream
enrichment join at 10^12 docs from a two-sided corpus shuffle into a
bucket-to-bucket zip."""

import pytest
from pyspark.sql import functions as F

from language_identification_spark.sources.bucketed import (
    n_shuffle_exchanges,
    read_table,
    write_bucketed,
)

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    """documents-shaped corpus + a per-doc derived scores table, both
    bucketed by doc_id into external tables under a tmp path."""
    base = tmp_path_factory.mktemp("bucketed")
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 7).alias("lang_code"),
    )
    scores = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).cast("double").alias("score"),
    )
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_scores")
    (
        docs.write.format("parquet")
        .mode("overwrite")
        .option("path", str(base / "b_docs"))
        .bucketBy(N_BUCKETS, "doc_id")
        .sortBy("doc_id")
        .saveAsTable("b_docs")
    )
    (
        scores.write.format("parquet")
        .mode("overwrite")
        .option("path", str(base / "b_scores"))
        .bucketBy(N_BUCKETS, "doc_id")
        .sortBy("doc_id")
        .saveAsTable("b_scores")
    )
    yield docs, scores
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_scores")


def _force_smj(spark):
    """Disable auto-broadcast so the join strategy is SortMergeJoin — the
    co-location claim is about avoiding the SHUFFLE, which a broadcast of
    a tiny test table would hide."""
    return spark.conf.get("spark.sql.autoBroadcastJoinThreshold")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_pair):
    docs, scores = bucketed_pair
    old = _force_smj(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "b_docs").join(
            read_table(spark, "b_scores"), "doc_id"
        )
        assert n_shuffle_exchanges(joined) == 0, (
            "co-bucketed join must not shuffle either side"
        )
        # and the result is the same rows the unbucketed join produces
        expected = docs.join(scores, "doc_id")
        assert (
            sorted(joined.collect()) == sorted(expected.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_half_bucketed_join_shuffles_only_unbucketed_side(spark, bucketed_pair):
    _, scores = bucketed_pair
    old = _force_smj(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain_scores = scores  # in-memory side, no bucket metadata
        joined = read_table(spark, "b_docs").join(plain_scores, "doc_id")
        # exactly ONE exchange: the unbucketed side re-hashes to the
        # bucketed side's layout; the corpus side stays in place
        assert n_shuffle_exchanges(joined) == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_groupby_on_bucket_key_has_no_shuffle(spark, bucketed_pair):
    agg = (
        read_table(spark, "b_docs")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    assert n_shuffle_exchanges(agg) == 0, (
        "bucketed layout satisfies the aggregate's distribution "
        "requirement — no exchange before groupBy(bucket key)"
    )
    assert agg.count() == 2000


def test_write_bucketed_roundtrip(spark, tmp_path):
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("v")
    )
    spark.sql("DROP TABLE IF EXISTS b_rt")
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", str(tmp_path / "b_rt"))
        .bucketBy(N_BUCKETS, "doc_id")
        .sortBy("doc_id")
        .saveAsTable("b_rt")
    )
    try:
        back = read_table(spark, "b_rt")
        assert back.count() == 500
        assert sorted(back.collect()) == sorted(df.collect())
        # bucket metadata survived the round trip
        ddl = spark.sql("SHOW CREATE TABLE b_rt").first()[0]
        assert "CLUSTERED BY" in ddl and str(N_BUCKETS) in ddl
    finally:
        spark.sql("DROP TABLE IF EXISTS b_rt")


def test_write_bucketed_helper(spark, tmp_path, monkeypatch):
    """write_bucketed uses saveAsTable under the session warehouse; point
    the warehouse-relative location via an explicit DB to keep tmp-local."""
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    loc = (tmp_path / "wh").as_uri()
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{loc}'")
    try:
        write_bucketed(df, "bdb.b_helper", N_BUCKETS)
        assert read_table(spark, "bdb.b_helper").count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bdb.b_helper")
        spark.sql("DROP DATABASE IF EXISTS bdb")
