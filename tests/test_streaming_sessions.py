"""Streaming sessionization parity: sessionize_stream over a watermarked
file stream emits, in append mode, exactly the sessions the batch
operators.events.sessionize computes — value-identical rows, finalized only
once the event-time watermark passes session_end + gap."""

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rustserini_spark.operators.events import sessionize
from rustserini_spark.streaming.sessions import sessionize_stream

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
GAP_S = 1800  # 30-minute session gap
# 7-minute cadence inside each 20-event file (per-user gap 21 min < 30 min:
# one session per user per file) + a 3-hour jump between files (> 30 min:
# every file opens fresh sessions)
_MINUTES = lambda i: 7 * i + 180 * (i // 20)  # noqa: E731


def _rows(lo: int, hi: int):
    return [
        (
            i,
            T0 + dt.timedelta(minutes=_MINUTES(i)),
            i % 3,
            ["click", "view"][i % 2],
            float(i),
            "{}",
        )
        for i in range(lo, hi)
    ]


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sessions_stream")
    inp = str(base / "input")
    os.makedirs(inp)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    # strictly increasing file mtimes: FileStreamSource orders by mtime
    for j, (lo, hi) in enumerate([(0, 20), (20, 40), (40, 60)]):
        d = f"{inp}/chunk={j}"
        spark.createDataFrame(pd.DataFrame(_rows(lo, hi), columns=cols)) \
            .coalesce(1).write.mode("overwrite").parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (1_000_000_000 + j, 1_000_000_000 + j))
    return inp


def test_stream_sessions_merge_out_of_order_across_batches(spark, tmp_path):
    """An event arriving in a LATER micro-batch with an EARLIER timestamp
    (still above the watermark) must bridge two provisional sessions into
    one — the open-interval-merge state handles within-watermark reordering
    that a keep-only-the-latest-session state would get wrong.

    user 0: events at minutes 0 and 40 arrive first (gap 40 > 30 -> two
    provisional sessions), then minute 20 arrives in batch 2 (bridges both:
    gaps 20 and 20), then minute 120 in batch 3 (watermark 90 closes the
    merged [0,40] session)."""
    inp = str(tmp_path / "input")
    os.makedirs(inp)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    batches = [
        [(0, T0, 0, "a", 0.0, "{}"),
         (1, T0 + dt.timedelta(minutes=40), 0, "a", 0.0, "{}")],
        [(2, T0 + dt.timedelta(minutes=20), 0, "a", 0.0, "{}")],
        [(3, T0 + dt.timedelta(minutes=120), 0, "a", 0.0, "{}")],
    ]
    for j, rows in enumerate(batches):
        d = f"{inp}/chunk={j}"
        spark.createDataFrame(pd.DataFrame(rows, columns=cols)) \
            .coalesce(1).write.mode("overwrite").parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (1_000_000_000 + j, 1_000_000_000 + j))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/chunk=*")
        .withWatermark("ts", "30 minutes")
    )
    q = (
        sessionize_stream(stream, gap_seconds=GAP_S)
        .writeStream.format("memory")
        .queryName("ev_sessions_ooo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = [
        (r.user_id, r.session_start_us, r.n_events, r.duration_s)
        for r in spark.sql("SELECT * FROM ev_sessions_ooo").collect()
    ]
    start_us = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    # exactly ONE closed session: minutes 0+20+40 merged; minute-120 stays open
    assert got == [(0, start_us, 3, 2400.0)]


def test_stream_sessions_match_batch_on_closed_sessions(spark, stream_input, tmp_path):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_input}/chunk=*")
        .withWatermark("ts", "30 minutes")
    )
    q = (
        sessionize_stream(stream, gap_seconds=GAP_S)
        .writeStream.format("memory")
        .queryName("ev_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (r.user_id, r.session_start_us): (r.n_events, r.duration_s)
        for r in spark.sql("SELECT * FROM ev_sessions").collect()
    }
    batch = {
        (r.user_id, r.session_start_us): (r.n_events, r.duration_s)
        for r in sessionize(
            spark.read.schema(SCHEMA).parquet(f"{stream_input}/chunk=*"),
            gap_seconds=GAP_S,
        ).collect()
    }

    def _ep_us(minute: int) -> int:
        t = (T0 + dt.timedelta(minutes=minute)).replace(tzinfo=dt.timezone.utc)
        return int(t.timestamp()) * 1_000_000

    final_wm_us = _ep_us(_MINUTES(59)) - 30 * 60 * 1_000_000

    def _end_us(key) -> int:
        (_, start), (_, dur) = key, batch[key]
        return start + int(round(dur * 1e6))

    # 1. every emitted session is value-identical to the batch run
    assert streamed, "stream emitted no sessions"
    for k, v in streamed.items():
        assert batch[k] == v
    # 2. every batch session the FINAL watermark closed must have been
    #    emitted (files 1+2 sessions: the 3h inter-file jumps put their
    #    end+gap far below the final watermark)
    must_emit = {k for k in batch if _end_us(k) + GAP_S * 1_000_000 <= final_wm_us}
    assert len(must_emit) == 6  # 3 users x files 1,2
    assert must_emit <= set(streamed)
    # 3. append mode never emits a session the watermark hasn't closed
    for k in streamed:
        assert _end_us(k) + GAP_S * 1_000_000 <= final_wm_us