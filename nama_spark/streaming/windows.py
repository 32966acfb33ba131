"""Event-time windowed aggregation + sessionization, batch/stream agnostic.

``event_time_aggregate`` uses ``F.window`` (tumbling) so the identical code
runs under Structured Streaming with a watermark:

    (spark.readStream.format(...).load()
        .withWatermark("ts", "1 hour")
        .transform(lambda df: event_time_aggregate(df))
        .writeStream...)

``sessionize`` is the batch form (gaps via lag window); the streaming form
would be ``F.session_window`` / ``applyInPandasWithState`` — noted, not
needed by the reference (batch-only, SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_time_aggregate(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    group_cols: tuple = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts + value stats per group."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"), *group_cols
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "n_events",
            "value_sum",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event of the same user exceeds ``gap``. Batch form: lag + cumulative sum
    over a per-user window (two narrow windows, one shuffle on user)."""
    gap_sec = _duration_seconds(gap)
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_sec),
        1,
    ).otherwise(0)
    df = events.withColumn("__new", new_session)
    df = df.withColumn(
        "session_seq",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new")
    return df.withColumn(
        "session_id",
        F.concat_ws("#", F.col(user_col).cast("string"), F.col("session_seq").cast("string")),
    )


def streaming_event_time_aggregate(
    spark,
    source_dir: str,
    schema,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: tuple = ("event_type",),
) -> DataFrame:
    """The SAME event_time_aggregate expression under Structured Streaming:
    readStream(parquet) → withWatermark → tumbling-window agg. One definition,
    two execution modes — in append output mode a window emits exactly once,
    when the watermark passes its end (late data beyond the watermark is
    dropped). Returns the streaming DataFrame; callers attach writeStream
    (tests use a memory sink; production would use kafka/parquet/iceberg)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    # watermarks require TIMESTAMP (with timezone) — parquet timestamps often
    # load as TIMESTAMP_NTZ, which EventTimeWatermark rejects
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return event_time_aggregate(
        stream.withWatermark(ts_col, watermark),
        window_duration,
        ts_col,
        group_cols,
    )


def streaming_dedup_key(events: DataFrame, key_cols: tuple, ts_col: str = "ts",
                        tie_cols: tuple = ()) -> DataFrame:
    """Keep the earliest event per key — the batch equivalent of streaming
    dropDuplicates-with-watermark. ``tie_cols`` break equal-timestamp ties
    deterministically (pass a unique id column for engine-stable output)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tie_cols)
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _duration_seconds(s: str) -> int:
    n, unit = s.split()
    n = int(n)
    return n * {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
