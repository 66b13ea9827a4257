"""Bucketed table layout — shuffle-free co-located joins for hot keys.

The 100 TB curation stack joins the corpus to per-doc derived tables over
and over: signatures, cluster labels, quality scores, keep-lists — always
on the same key (``doc_id`` or ``url``). Plain parquet makes every one of
those joins shuffle BOTH sides (two corpus-sized exchanges per join, the
single most expensive plan node at 10^12 docs). Spark's native answer is
a BUCKETED layout (`df.write.bucketBy(N, key).sortBy(key)`): each side is
pre-hash-partitioned into N files per partition at WRITE time and the
catalog records it, so a SortMergeJoin between two tables bucketed on the
same key with the same N needs NO Exchange at all — the join runs
bucket-to-bucket, and with ``sortBy`` the per-bucket sort is already on
disk too. Write once, join shuffle-free forever; at 1000 executors this
converts every downstream enrichment join from a full-corpus shuffle into
a narrow zip of co-located buckets.

Rules the planner enforces (tests/test_bucketed.py pins all three):

- both sides bucketed on the JOIN key with the SAME bucket count
  -> zero ``Exchange hashpartitioning`` in the join plan;
- one side bucketed, one side not -> only the unbucketed side shuffles
  (the corpus side stays in place — still half the shuffle saved);
- group-by on the bucket key -> no exchange before the aggregate either.

``bucketBy`` requires ``saveAsTable`` (the bucket metadata lives in the
session catalog, not in the parquet footers — ``parquet(path)`` writes
would silently LOSE the bucketing). The default in-session catalog is
enough: on a cluster the same call against a shared metastore (Hive /
Iceberg bucket transforms — sources/iceberg.py documents the Iceberg
analog ``bucket(N, doc_id)`` partition transform) makes the layout
visible to every job. Bucket count sizing at 10^12 docs: target
~128-512 MiB per bucket file per partition, i.e. thousands of buckets —
N must match across every table that wants co-located joins, so it is a
corpus-level constant, not a per-job knob.

Reference anchor: the reference repo is single-process and has no table
layout layer; this is the §2.11 pipeline-infrastructure family
(SURVEY.md), built on the public Spark bucketing API (SPARK-12394).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key: str = "doc_id",
    sorted_within: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed (and optionally
    sorted) by ``key``. Joins/aggregations on ``key`` between tables
    written with the same ``n_buckets`` are exchange-free."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sorted_within:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (reading the bare
    parquet path would drop the bucket metadata and re-shuffle)."""
    return spark.table(table)


def n_shuffle_exchanges(df: DataFrame) -> int:
    """Count shuffle exchanges (hash/range repartitions) in the FINAL
    physical plan — broadcast exchanges excluded; the co-location
    assertions below are about avoiding corpus shuffles, and a broadcast
    of a small dim is exactly what we want to keep."""
    import re

    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # count the detail headers only ("(7) Exchange"), not the tree lines,
    # or every exchange would be counted twice
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.M))
