"""Iceberg table plumbing — the production source/sink of the north rule.

The north rule runs this engine over an Iceberg table of Common-Crawl-style
pages and resumes from Iceberg SNAPSHOT checkpoints. This module is the
real API surface for that (all public Apache Iceberg + Spark DSv2 API — no
vendor anything): session catalog config, snapshot-pinned reads,
incremental snapshot-range reads (the checkpoint-resume primitive), and
idempotent partition-overwrite writes.

The sandbox has no Iceberg runtime jar, so every call that would touch the
connector is gated behind a loud ``IcebergUnavailableError`` that says
exactly which ``--packages`` coordinate to add — the same honest-gating
pattern as the fastText native path (operators/lid.py). The parquet
fallback (`sources/io.py.read_pages` + plans/pipeline.py's bucket manifest)
keeps identical call shapes, so swapping a path for a table identifier is
the ONLY change a production launch needs.

Checkpoint-resume semantics (why snapshots beat file manifests at scale):
every Iceberg commit produces an immutable snapshot-id; a resumable job
records the last snapshot it fully processed (one bigint — against the
_metrics table or the job store) and restarts with
``read_pages_incremental(start_snapshot_id=...)``, which plans ONLY the
files appended after that snapshot. The parquet stand-in's per-bucket
manifest (plans/pipeline.py:132-227) replays completed buckets instead;
both give exactly-once output, but the snapshot range is O(new data)
where a path-based rescan is O(table).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

# Public Maven coordinate for the Spark 4.0/Scala 2.13 Iceberg runtime.
ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


class IcebergUnavailableError(RuntimeError):
    """The Spark session has no Iceberg connector on its classpath."""

    def __init__(self, cause: Exception | None = None):
        super().__init__(
            "Iceberg connector not available in this Spark session. "
            f"Launch with spark-submit --packages {ICEBERG_PACKAGE} and the "
            "catalog conf from iceberg_session_conf(); in the sandbox use "
            "the parquet stand-in (sources/io.py:read_pages)."
            + (f" Underlying error: {cause}" if cause else "")
        )


def iceberg_session_conf(
    catalog: str = "lakehouse",
    warehouse: str = "s3://BUCKET/warehouse",
    catalog_impl: str = "org.apache.iceberg.spark.SparkCatalog",
    catalog_type: str = "hadoop",
) -> dict[str, str]:
    """The session confs a production launch passes to SparkSession.builder
    (or spark-submit --conf). Pure data — safe to call anywhere."""
    p = f"spark.sql.catalog.{catalog}"
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        p: catalog_impl,
        f"{p}.type": catalog_type,
        f"{p}.warehouse": warehouse,
    }


def _gate(spark: SparkSession) -> None:
    """Raise IcebergUnavailableError unless the connector class is loadable."""
    try:
        # Class.forName through the session's JVM — no-op when the runtime
        # jar is present; ClassNotFoundException otherwise.
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
    except Exception as exc:  # noqa: BLE001 — Py4J wraps the CNFE
        raise IcebergUnavailableError(exc) from None


def read_pages_iceberg(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
) -> DataFrame:
    """Snapshot-pinned read: every executor plans against the SAME immutable
    snapshot, so a job that spans hours is not torn by concurrent commits.
    Omit both pins to read the current snapshot."""
    _gate(spark)
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    if as_of_timestamp_ms is not None:
        reader = reader.option("as-of-timestamp", str(as_of_timestamp_ms))
    return reader.load(table)


def read_pages_incremental(
    spark: SparkSession,
    table: str,
    start_snapshot_id: int,
    end_snapshot_id: int | None = None,
) -> DataFrame:
    """The checkpoint-resume primitive: plan only data appended AFTER
    start_snapshot_id (exclusive), up to end_snapshot_id (inclusive,
    default current). O(new files), not O(table)."""
    _gate(spark)
    reader = spark.read.format("iceberg").option(
        "start-snapshot-id", str(start_snapshot_id)
    )
    if end_snapshot_id is not None:
        reader = reader.option("end-snapshot-id", str(end_snapshot_id))
    return reader.load(table)


def current_snapshot_id(spark: SparkSession, table: str) -> int | None:
    """Latest committed snapshot-id via the `.snapshots` metadata table —
    the one bigint a resumable job persists as its checkpoint."""
    _gate(spark)
    row = (
        spark.read.format("iceberg")
        .load(f"{table}.snapshots")
        .orderBy("committed_at", ascending=False)
        .select("snapshot_id")
        .head(1)
    )
    return int(row[0][0]) if row else None


def write_overwrite_partitions(df: DataFrame, table: str) -> None:
    """Idempotent bucket commit: DataFrameWriterV2 overwritePartitions
    replaces exactly the partitions present in ``df`` atomically — the
    Iceberg-native form of the parquet stand-in's overwrite-by-bucket
    (plans/pipeline.py). Re-running a failed bucket re-commits the same
    partition instead of duplicating rows."""
    _gate(df.sparkSession)
    df.writeTo(table).overwritePartitions()


def append(df: DataFrame, table: str) -> None:
    """Plain atomic append (metrics/lineage tables)."""
    _gate(df.sparkSession)
    df.writeTo(table).append()
