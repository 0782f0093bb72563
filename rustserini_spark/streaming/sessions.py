"""Streaming sessionization — the stateful twin of the batch
``operators.events.sessionize`` (which documents: "the streaming analog is
session windows / applyInPandasWithState; this is the batch/backfill form").

The reference is strictly batch (SURVEY §2.4), so this is engine-native
surface: gap-based session windows per user over a watermarked event stream,
finalized and emitted in append mode exactly when the event-time watermark
passes ``session_end + gap`` — the same finalize-on-watermark contract the
windowed aggregation family gets from Spark's built-in ``window()``.

Design (the standard structured-streaming sessionization shape):

* State per user = the OPEN sessions as interval triples
  ``(start_us, end_us, n_events)``. Keeping a LIST of open intervals (not
  just the latest) makes the operator correct under arbitrary within-
  watermark reordering ACROSS micro-batches: an out-of-order event is merged
  as the interval ``[ep, ep]`` and interval-merge with the gap rule
  reconstructs exactly the batch gaps-and-islands result; rows older than
  the watermark were already dropped upstream by Spark.
* Each invocation merges new events into the interval list (sort + single
  linear pass — state is bounded by the user's open-session count, not
  history), emits every session whose ``end + gap <= watermark`` (final by
  definition: any future event for it would be late), and arms an
  event-time timer at the earliest next close so sessions finalize even if
  the user never sends another event.
* Emitted rows are BIT-IDENTICAL to the batch ``sessionize`` output schema
  ``(user_id, session_start_us, n_events, duration_s)`` — the stream≡batch
  parity test in tests/test_streaming_sessions.py asserts value equality on
  every closed session.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = (
    "user_id long, session_start_us long, n_events long, duration_s double"
)
_STATE_SCHEMA = "starts array<long>, ends array<long>, counts array<long>"


def _epoch_us(ts: pd.Series) -> list[int]:
    """Event-time column -> epoch microseconds (int), tz-aware or naive —
    naive wall times are epoch instants under the engine's pinned-UTC
    session, matching batch sessionize's unix_micros."""
    if getattr(ts.dtype, "tz", None) is not None:
        ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
    return (ts.astype("int64") // 1000).tolist()


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Append-mode finalized sessions over a WATERMARKED event stream.

    ``events`` must be a streaming DataFrame with ``withWatermark(ts_col,
    ...)`` applied upstream (same contract as windowed_event_stats). Returns
    one row per CLOSED session; sessions still open when the stream's final
    watermark stops advancing are never emitted (append-mode semantics,
    identical to unclosed tumbling windows).

    Plan shape at scale: one shuffle on user_id into the stateful operator;
    per-key state is the open-interval list (almost always length 1), timers
    fire per key at the earliest session close — no per-event state, no
    global ordering, no driver involvement.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.exists:
            starts, ends, counts = state.get
            intervals = list(zip(starts, ends, counts))
        else:
            intervals = []
        for pdf in pdfs:
            if len(pdf):
                intervals.extend((ep, ep, 1) for ep in _epoch_us(pdf[ts_col]))
        # gaps-and-islands interval merge: same-split rule as the batch op
        # (new session strictly when gap > gap_us)
        intervals.sort()
        merged: list[tuple[int, int, int]] = []
        for s, e, c in intervals:
            if merged and s - merged[-1][1] <= gap_us:
                ms, me, mc = merged[-1]
                merged[-1] = (ms, max(me, e), mc + c)
            else:
                merged.append((s, e, c))
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        closed = [iv for iv in merged if iv[1] + gap_us <= wm_us]
        open_ = [iv for iv in merged if iv[1] + gap_us > wm_us]
        if open_:
            state.update(
                ([s for s, _, _ in open_], [e for _, e, _ in open_], [c for _, _, c in open_])
            )
            # earliest possible close; timers must sit strictly past the
            # current watermark or Spark rejects them
            next_close_ms = min(e + gap_us for _, e, _ in open_) // 1000
            state.setTimeoutTimestamp(max(next_close_ms, wm_ms + 1))
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [s for s, _, _ in closed],
                    "n_events": [c for _, _, c in closed],
                    # r4 parity with the batch op's rounded duration
                    "duration_s": [round((e - s) / 1e6, 4) for s, e, _ in closed],
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
