"""Iceberg plumbing (sources/iceberg.py): conf builder is pure data, and
every connector-touching call gates LOUDLY in a jar-less session instead
of failing deep inside Spark with a ClassNotFoundException."""

from __future__ import annotations

import pytest

from language_identification_spark.sources.iceberg import (
    ICEBERG_PACKAGE,
    IcebergUnavailableError,
    append,
    current_snapshot_id,
    iceberg_session_conf,
    read_pages_iceberg,
    read_pages_incremental,
    write_overwrite_partitions,
)


def test_session_conf_shape():
    conf = iceberg_session_conf(catalog="cc", warehouse="s3://w/h")
    assert conf["spark.sql.catalog.cc"] == (
        "org.apache.iceberg.spark.SparkCatalog"
    )
    assert conf["spark.sql.catalog.cc.type"] == "hadoop"
    assert conf["spark.sql.catalog.cc.warehouse"] == "s3://w/h"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_reads_gate_loudly_without_runtime(spark):
    for call in (
        lambda: read_pages_iceberg(spark, "cc.pages", snapshot_id=42),
        lambda: read_pages_incremental(spark, "cc.pages", 42),
        lambda: current_snapshot_id(spark, "cc.pages"),
    ):
        with pytest.raises(IcebergUnavailableError) as err:
            call()
        assert ICEBERG_PACKAGE in str(err.value)


def test_writes_gate_loudly_without_runtime(spark):
    df = spark.range(3)
    with pytest.raises(IcebergUnavailableError):
        write_overwrite_partitions(df, "cc.pages_out")
    with pytest.raises(IcebergUnavailableError):
        append(df, "cc.metrics")
