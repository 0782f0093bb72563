"""Structured Streaming windowed event aggregation: the SAME
windowed_event_stats expression runs over a file stream with a watermark,
and the append-mode (finalized-window) output matches the batch run on the
windows the watermark closed — the stream≡batch parity contract."""

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rustserini_spark.operators.events import windowed_event_stats

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(lo: int, hi: int):
    return [
        (i, T0 + dt.timedelta(minutes=7 * i), i % 3, ["click", "view"][i % 2], float(i), "{}")
        for i in range(lo, hi)
    ]


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("events_stream")
    inp = str(base / "input")
    os.makedirs(inp)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    # three arriving files = three micro-batches, event time always advancing;
    # FileStreamSource orders by mtime, so pin strictly increasing mtimes or
    # same-second writes can reorder batches and drop the early rows as late
    for j, (lo, hi) in enumerate([(0, 20), (20, 40), (40, 60)]):
        d = f"{inp}/chunk={j}"
        spark.createDataFrame(pd.DataFrame(_rows(lo, hi), columns=cols)) \
            .coalesce(1).write.mode("overwrite").parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (1_000_000_000 + j, 1_000_000_000 + j))
    return inp


def test_watermarked_stream_matches_batch_on_closed_windows(spark, stream_input, tmp_path):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_input}/chunk=*")
        .withWatermark("ts", "30 minutes")
    )
    q = (
        windowed_event_stats(stream, window_seconds=3600)
        .writeStream.format("memory")
        .queryName("ev_windows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM ev_windows").collect()
    }
    batch_all = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_stats(
            spark.read.schema(SCHEMA).parquet(f"{stream_input}/chunk=*"),
            window_seconds=3600,
        ).collect()
    }

    def _wm(last_minute: int) -> int:
        t = (T0 + dt.timedelta(minutes=last_minute)).replace(tzinfo=dt.timezone.utc)
        return int(t.timestamp()) - 1800  # watermark = max event time - 30min

    # 1. every emitted window is final and value-identical to the batch run
    for k, v in streamed.items():
        assert batch_all[k] == v
    # 2. windows the second file's watermark closed MUST have been emitted
    #    (emission happens at latest one batch after the close; file 3 is
    #    that batch for file 2's watermark)
    must_emit = {k for k in batch_all if k[0] + 3600 <= _wm(7 * 39)}
    assert must_emit and must_emit <= set(streamed)
    # 3. nothing beyond the final watermark may ever be emitted in append mode
    assert all(k[0] + 3600 <= _wm(7 * 59) for k in streamed)
