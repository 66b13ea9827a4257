"""Structured Streaming realizations of the engine's operators.

The reference is batch-only (SURVEY.md §2.9: files -> files, no streaming
state), and the north rule's resumability is Iceberg-checkpoint based — but
the pipeline is embarrassingly per-row, so it ports to streams without
operator changes: ``readStream`` on the same source, the same enrichment /
rule / scrub plan, ``writeStream`` with a checkpoint dir. These jobs exist to
prove that property end-to-end (tests drive them with Trigger.availableNow on
the driver testdata, the bounded-backfill trigger that replays a directory to
completion and stops — the same code then runs unbounded on a live landing
directory at cluster scale).

Scale notes:
- the per-batch work is identical to the batch plan, so all batch-side sizing
  (partitioning, Arrow batch bounds, broadcast models) carries over;
- the windowed aggregation keeps state per (window, event_type); the
  watermark bounds that state — without it, 10^12 docs of late-data state
  would grow forever;
- streaming dedup (dropDuplicatesWithinWatermark) is the streaming analog of
  the exact-dedup operator: state is bounded by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, payload string"
)


def streaming_events_hourly(
    spark: SparkSession, source_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window rollup of the events table as a stream — the streaming
    form of queries.q_events_hourly. Watermark bounds window state; late rows
    beyond it are dropped deterministically."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(source_dir)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_pages_filter(
    spark: SparkSession,
    source_dir: str,
    model,
    config=None,
    kn_models: dict | None = None,
) -> DataFrame:
    """The full quality-filter plan applied to a stream of page files — the
    SAME quality_filter_plan call as batch (stateless per-row, so the plan is
    stream-safe as-is)."""
    from language_identification_spark.fixtures import PAGES_SCHEMA
    from language_identification_spark.plans.pipeline import quality_filter_plan

    pages = (
        spark.readStream.schema(PAGES_SCHEMA).format("parquet").load(source_dir)
    )
    return quality_filter_plan(pages, model, config=config, kn_models=kn_models)


def streaming_dedup_events(
    spark: SparkSession, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Stateful streaming exact-dedup: drop re-deliveries of the same
    event_id arriving within the watermark horizon — the streaming analog of
    the exact-dedup operator. State is keyed by event_id and EXPIRES with the
    watermark (dropDuplicatesWithinWatermark), so state size is bounded by
    the horizon's arrival rate, not the stream's lifetime — the property that
    keeps this viable on an unbounded 10^12-event stream."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(source_dir)
    )
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def streaming_user_totals(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running per-user
    event count + value total, state carried across micro-batches.

    This is the escape hatch for stateful logic the built-in windowed
    aggregations cannot express (per-key models, custom eviction, cross-batch
    sequences). State here is two numbers per user — at 10^12 events the
    state store holds |users| rows, checkpointed with the stream, and each
    micro-batch touches only the users present in that batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger:
        # bounds each micro-batch; with availableNow this splits a bounded
        # replay into MULTIPLE batches, exercising cross-batch state
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = reader.load(source_dir)

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_stream_once(
    df: DataFrame,
    checkpoint_dir: str,
    query_name: str = "stream",
    mode: str | None = None,
) -> DataFrame:
    """Drain all currently-available input (Trigger.availableNow) into an
    in-memory sink and return the result as a DataFrame.

    Output mode (overridable via ``mode``): complete for aggregations
    (append would hold rows until the watermark closes each window, which
    never happens on a bounded replay), update for
    applyInPandasWithState plans (their operator declares update mode and a
    start in any other mode fails), append for stateless plans."""
    spark = df.sparkSession
    if mode is None:
        plan = df._jdf.queryExecution().analyzed().toString()
        if "FlatMapGroupsInPandasWithState" in plan:
            mode = "update"
        elif "Aggregate" in plan:
            mode = "complete"
        else:
            mode = "append"
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
