"""Leakage-safe host-disjoint split (operators/mixer.py:host_disjoint_split)
and the split_leakage_audit gate: the host scheme must put every host in
exactly ONE split, same-host duplicate groups must therefore never straddle
train/test under it, while the doc-hash scheme measurably leaks — the
property the audit gate turns into a number."""

from __future__ import annotations

from pyspark.sql import functions as F

from language_identification_spark.operators.mixer import (
    host_disjoint_split,
    mix_hash,
)


def _docs(spark, n=600, n_hosts=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("site"), (F.col("id") % n_hosts).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
    )


def test_every_host_in_exactly_one_split(spark):
    out = host_disjoint_split(_docs(spark))
    per_host = out.groupBy("host").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_host.filter(F.col("n_splits") != 1).count() == 0


def test_doc_hash_split_straddles_hosts(spark):
    # the contrast: the doc-level scheme splits at least one host's pages
    docs = _docs(spark)
    b = mix_hash(F.col("doc_id"), 100)
    doc_split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    per_host = (
        docs.withColumn("split", doc_split)
        .groupBy("host")
        .agg(F.countDistinct("split").alias("n_splits"))
    )
    assert per_host.filter(F.col("n_splits") > 1).count() > 0


def test_all_three_splits_present_and_host_complete(spark):
    # with enough hosts the 80/10/10 bounds each capture some hosts, and
    # every input row keeps its assignment (narrow map, no row loss)
    docs = _docs(spark, n=2000, n_hosts=200)
    out = host_disjoint_split(docs)
    assert out.count() == 2000
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}


def test_leakage_audit_host_scheme_is_leak_free(spark):
    from language_identification_spark.queries import q_split_leakage_audit

    rows = {
        r["scheme"]: r.asDict()
        for r in q_split_leakage_audit(spark, "/root/testdata/sf0.001").collect()
    }
    host, doc = rows["host_disjoint"], rows["doc_hash"]
    # same universe of groups under both schemes
    assert host["n_groups"] == doc["n_groups"]
    assert host["n_dup_groups"] == doc["n_dup_groups"]
    # same-host dup groups can never straddle splits under the host scheme
    assert host["n_leaky_groups"] == 0
    assert host["n_leaked_docs"] == 0
    assert host["n_train_test_groups"] == 0
    # ...while the doc-hash scheme measurably leaks on the same groups
    assert doc["n_leaky_groups"] > 0
    assert doc["n_train_test_groups"] >= 0
