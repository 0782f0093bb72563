"""Streaming-analytics operators over the ``events`` stream table
(event_id, ts, user_id, event_type, value, props).

The reference is strictly batch (SURVEY §2.4 "Streaming: none"), but the
task brief's data model ships an event STREAM table and a 100-TB analytics
engine needs the standard event-time operator family. Everything here is a
pure DataFrame expression, so the same function runs in batch (exact DuckDB
oracle) and under Structured Streaming (`windowed_event_stats` accepts a
``readStream`` DataFrame with a watermark applied upstream — parity test in
tests/test_streaming_events.py).

Timestamps cross the engine boundary as epoch integers (`unix_micros` /
`unix_timestamp`), never as rendered wall-clock strings: epoch arithmetic is
timezone-free and replays bit-identically in any engine, while string
rendering couples the result to a session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import TimestampNTZType

from rustserini_spark.functions.parity import r4


def _event_time(events: DataFrame, ts_col: str):
    """The event-time column, cast NTZ->TIMESTAMP only when safe: parquet
    event times often arrive as TIMESTAMP_NTZ (unix_micros/unix_timestamp
    reject NTZ), and with the session TZ pinned UTC in get_spark the NTZ wall
    time equals the epoch instant DuckDB's naive-as-UTC oracle computes. On a
    STREAMING frame the column is passed through untouched — wrapping the
    watermarked attribute in a cast strips its watermark metadata and the
    append-mode aggregation is rejected."""
    c = F.col(ts_col)
    if not events.isStreaming and isinstance(
        events.schema[ts_col].dataType, TimestampNTZType
    ):
        return c.cast("timestamp")
    return c


def windowed_event_stats(
    events: DataFrame,
    window_seconds: int = 3600,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(window_start, event_type, n_events, sum_value): tumbling event-time
    windows, epoch-aligned; window_start is epoch SECONDS of the window open.

    The batch expression of the canonical streaming windowed aggregation —
    in a stream, apply ``withWatermark(ts_col, ...)`` upstream and this exact
    function produces the append-mode finalized windows. Plan shape at
    scale: map (window assignment) -> partial agg -> one shuffle on
    (window, type) -> final agg; state per key is one row.
    """
    w = F.window(_event_time(events, ts_col), f"{window_seconds} seconds")
    return (
        events.groupBy(w.alias("w"), F.col(type_col).alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum(value_col)).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, session_start_us, n_events, duration_s): gaps-and-islands
    sessionization — a new session opens when a user's inter-event gap
    exceeds ``gap_seconds``. Gap arithmetic in whole microseconds
    (`unix_micros`), ordering tie-broken by event_id for determinism.

    Plan shape at scale: one shuffle on user_id; both window passes and the
    session agg run inside that single partitioning (per-user state only, no
    global sort). The streaming analog is session windows /
    ``applyInPandasWithState``; this is the batch/backfill form.
    """
    gap_us = gap_seconds * 1_000_000
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(_event_time(events, ts_col)).alias("ep"),
        F.col(id_col).alias("_eid"),
    )
    order = Window.partitionBy("user_id").orderBy("ep", "_eid")
    with_flag = base.withColumn(
        "new_sess",
        F.when(
            F.lag("ep").over(order).isNull()
            | ((F.col("ep") - F.lag("ep").over(order)) > gap_us),
            1,
        ).otherwise(0),
    )
    run = Window.partitionBy("user_id").orderBy("ep", "_eid").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        with_flag.withColumn("sess", F.sum("new_sess").over(run))
        .groupBy("user_id", "sess")
        .agg(
            F.min("ep").alias("session_start_us"),
            F.count(F.lit(1)).alias("n_events"),
            r4((F.max("ep") - F.min("ep")) / 1_000_000.0).alias("duration_s"),
        )
        .select("user_id", "session_start_us", "n_events", "duration_s")
    )


def event_props_stats(
    events: DataFrame,
    key: str = "k",
    type_col: str = "event_type",
    props_col: str = "props",
) -> DataFrame:
    """(event_type, n_with_key, avg_val, max_val): integer field ``key``
    extracted from the JSON props string, aggregated per event type.

    Extraction is a single regexp in whole-stage codegen (engine-portable:
    the same pattern replays in DuckDB's RE2, where Spark's
    ``get_json_object`` has no exact cross-engine mirror); rows without the
    key drop out of the aggregate rather than contributing nulls. The digit
    run is bounded to 18 (always inside int64) so both engines see the same
    rows: an UNBOUNDED run wider than 19 digits overflows the cast, where
    Spark's cast('long') yields NULL (row silently dropped) but the oracle's
    CAST(... AS BIGINT) raises — a >18-digit props value takes its longest
    18-digit prefix on BOTH sides instead of diverging.
    """
    val = F.regexp_extract(F.col(props_col), f'"{key}":\\s*(-?\\d{{1,18}})', 1)
    typed = events.select(
        F.col(type_col).alias("event_type"),
        F.when(val != "", val.cast("long")).alias("v"),
    ).filter(F.col("v").isNotNull())
    return typed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_with_key"),
        r4(F.avg("v")).alias("avg_val"),
        F.max("v").alias("max_val"),
    )
