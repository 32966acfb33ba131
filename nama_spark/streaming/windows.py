"""Event-time windowed aggregation + sessionization, batch/stream agnostic.

``event_time_aggregate`` uses ``F.window`` (tumbling) so the identical code
runs under Structured Streaming with a watermark:

    (spark.readStream.format(...).load()
        .withWatermark("ts", "1 hour")
        .transform(lambda df: event_time_aggregate(df))
        .writeStream...)

``sessionize`` is the row-level batch form (gaps via lag window; every event
keeps its session id). ``sessionize_window`` is the same session partition as
an ``F.session_window`` aggregation (one row per session) — and because
session_window works identically in batch and streaming,
``streaming_sessionize`` runs it under Structured Streaming with a watermark
(beyond the reference, which is batch-only — SURVEY.md §2.12).

Gap semantics: an event extends the current session iff its distance to the
previous event is ≤ gap at full (sub-second) timestamp precision — the same
rule session_window applies, so the two forms partition identically whenever
no inter-event delta equals the gap EXACTLY (at microsecond resolution a
measure-zero tie; session_window treats it as a new session, the lag form as
a continuation).
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
    # cast("double") keeps sub-second precision (unix_timestamp truncates to
    # seconds and would disagree with session_window near gap boundaries);
    # TIMESTAMP_NTZ needs the timestamp hop first (NTZ→DOUBLE has no cast)
    def _sec(c):
        return c.cast("timestamp").cast("double")

    new_session = F.when(
        prev_ts.isNull() | (_sec(F.col(ts_col)) - _sec(prev_ts) > gap_sec),
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


def sessionize_window(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """The same session partition as ``sessionize`` expressed as an
    ``F.session_window`` aggregation: one row per (user, session) with the
    session's event count and value sum. Batch/stream agnostic — this exact
    expression runs under Structured Streaming (see streaming_sessionize)."""
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def streaming_sessionize(
    spark,
    source_dir: str,
    schema,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """``sessionize_window`` under Structured Streaming: readStream(parquet)
    → withWatermark → session_window agg. In append output mode a session
    emits exactly once, when the watermark passes its close (session end +
    nothing can extend it); late events beyond the watermark are dropped.
    Returns the streaming DataFrame; callers attach writeStream."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return sessionize_window(
        stream.withWatermark(ts_col, watermark), gap, ts_col, user_col
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
