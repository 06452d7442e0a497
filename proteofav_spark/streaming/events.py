"""Structured Streaming over the ``events`` table.

The reference has no streaming surface (SURVEY §2.10); this extension
defines the streaming ingest path the 100 TB deployment needs:
``readStream`` over the event-log directory → watermarked windowed
aggregations (tumbling / sliding / session) → stream-static enrichment
joins against the dimension lake → an ``applyInPandasWithState`` custom
stateful operator for per-key running state.

The batch twins of these plans live in queries.py
(events_tumbling_window), so the streaming results are checkable against
the DuckDB oracle through the same column contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# events.parquet physical schema (ts is timestamp[us], naive → NTZ;
# EVENT_TS is the session-timezone TIMESTAMP column watermarks run on)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def with_event_time(df: DataFrame) -> DataFrame:
    """Naive timestamp → session-timezone (UTC) ``event_ts`` column.

    Watermarks and ``F.window``/``session_window`` accept NTZ too, but a
    zoned event-time column keeps the streaming surface identical whether
    the source lands naive parquet (tests) or zoned Kafka ingest."""
    return df.withColumn("event_ts", F.col("ts").cast("timestamp"))


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file per micro-batch
    in tests; on a cluster this is the landing directory / Kafka topic)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        # the file source wants a directory; scope it to the events file(s)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    return with_event_time(raw)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type. Late rows beyond
    the watermark drop; state is bounded."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # same decimal-stabilized round as the batch twin
            # (queries.py events_tumbling_window) so the value-parity
            # check holds on rounding-boundary sums
            F.round(F.sum("value").cast("decimal(30,6)"), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    """Sliding-window mean value per user."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window, slide).alias("win"), "user_id")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.col("win.start").alias("window_start"), "user_id", "avg_value"
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id", "n_events",
        )
    )


def stream_static_enrich(events: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static broadcast join — the streaming twin of the reference's
    enrichment joins (new structures vs static SIFTS lake, SURVEY §2.10)."""
    return events.join(F.broadcast(dim), on=key, how="left")


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running event count + value sum
    via ``applyInPandasWithState`` (the escape hatch for semantics windows
    can't express)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Test helper: drain the stream into an in-memory table and block until
    every available file is processed."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_stream_click_error_join(
    errors: DataFrame, clicks: DataFrame, within_s: int = 300
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join: each error event pairs with
    click events of the same user within ±``within_s`` seconds — the
    session-context join (which click preceded this error?) that needs
    state on BOTH sides.

    State-bounding contract: both inputs carry watermarks and the join
    condition constrains the two event times relative to each other, so
    Spark derives a state-eviction bound for each side (watermark +
    range) instead of buffering streams forever — the required shape for
    any stream-stream join at production scale."""
    e = (
        errors.filter(F.col("event_type") == "error")
        .withWatermark("event_ts", "10 minutes")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("event_ts").alias("error_ts"),
        )
    )
    c = (
        clicks.filter(F.col("event_type") == "click")
        .withWatermark("event_ts", "10 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("event_ts").alias("click_ts"),
        )
    )
    return e.join(
        c,
        (F.col("e_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr(f"INTERVAL {within_s} SECONDS"))
        & (F.col("click_ts") <= F.col("error_ts") + F.expr(f"INTERVAL {within_s} SECONDS")),
    ).select("error_id", "e_user", "error_ts", "click_id", "click_ts")


def asof_enrich_merger(
    right: DataFrame,
    on: str,
    by: list[str],
    out_path: str,
    direction: str = "backward",
    tolerance: int | None = None,
):
    """``foreachBatch`` body for streaming as-of enrichment against a
    STATIC right side: each micro-batch runs the general
    :func:`..operators.pipeline_queries.merge_asof` (same single keyed
    exchange per batch) and appends to a parquet sink.

    Why per-batch application is EXACT, not approximate: with a static
    right side an as-of match is row-local on the left — each left
    row's matched right row depends only on that row and ``right``,
    never on other left rows — so enriching micro-batches independently
    computes the identical function to one batch merge_asof over the
    full stream history (pinned value-for-value against the
    DuckDB-oracled ``events_merge_asof_tolerance`` catalog query in
    tests/test_streaming_parity.py). Contrast the watermark-bounded
    stream-stream join (stream_stream_click_error_join), where BOTH
    sides move.

    100 TB shape: merge_asof never broadcasts — both sides union into
    ONE hash exchange on ``by`` per micro-batch, so the right side is
    re-shuffled every batch regardless of its size. Size deployments
    accordingly: per-batch network cost is O(|batch| + |right|); when
    ``right`` is large relative to the batch cadence, persist it
    pre-partitioned on ``by`` (bucketing) so its exchange is a reuse,
    or lengthen the trigger interval — the standard Flink temporal-join
    trade re-expressed as micro-batches."""
    from proteofav_spark.operators.pipeline_queries import merge_asof

    def enrich(batch_df: DataFrame, batch_id: int) -> None:
        merge_asof(
            batch_df, right, on=on, by=by,
            direction=direction, tolerance=tolerance,
        ).write.mode("append").parquet(out_path)

    return enrich


def run_asof_enrich(
    stream: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    out_path: str,
    checkpoint: str,
    direction: str = "backward",
    tolerance: int | None = None,
):
    """Drive streaming as-of enrichment with Trigger.AvailableNow (process
    the backlog in micro-batches, then stop). At-least-once on crash
    replay — the enriched rows carry their input row identity, so a
    downstream exactly-once consumer dedupes on it (or wrap the write in
    the anti-join MERGE pattern of corpus.dedup_store_merger).

    Argument/schema contract errors raise HERE, before the query
    starts — not as a py4j-wrapped StreamingQueryException out of
    batch 0."""
    from proteofav_spark.operators.pipeline_queries import (
        validate_merge_asof_args,
    )

    validate_merge_asof_args(
        stream.schema, right.schema, on=on, by=by,
        direction=direction, tolerance=tolerance,
    )
    return (
        stream.writeStream.foreachBatch(
            asof_enrich_merger(
                right, on, by, out_path,
                direction=direction, tolerance=tolerance,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
