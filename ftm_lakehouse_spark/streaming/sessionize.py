"""Streaming sessionization — the custom stateful operator tier.

Two implementations of the same semantics (events within ``gap`` of
each other belong to one session), because each is the right tool at a
different point of the design space:

* :func:`session_window_stats` — Spark's native ``session_window``
  gap-merge aggregation. Declarative, watermark-driven state eviction,
  whole aggregation stays in the JVM. Use this when per-session
  AGGREGATES are enough.
* :func:`sessionize_stateful` — ``applyInPandasWithState`` with an
  explicit per-user state object (open-session bounds + counter).
  Use this when the operator must EMIT per-session records with custom
  shape/logic that no built-in aggregate expresses (the "custom
  stateful operator" escape hatch; state is Arrow-serialized per group,
  timeouts evict idle users).

The batch twin of this operator is ``w_sessionize`` in
queries/inventory.py (lag-gap + running count), hash-checked against
DuckDB — the streaming forms share its gap semantics.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["session_window_stats", "sessionize_stateful"]


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-(user, session) aggregates via native ``session_window``:
    sessions close when no event arrives within ``gap``; the watermark
    bounds state. Works identically on a batch DataFrame (tested) and a
    stream."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.col(key_col), F.session_window(F.col(ts_col), gap).alias("session")
    ).agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ).select(
        key_col,
        F.col("session.start").alias("window_start"),
        F.col("session.end").alias("window_end"),
        "n_events",
        "session_start",
        "session_end",
    )


#: state carried per user: (session_start_us, last_event_us, n_events,
#: session_seq)
_STATE_SCHEMA = "start_us long, last_us long, n long, seq long"
_OUTPUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, start_us long,"
    " end_us long, closed boolean"
)


def _sessionize_fn(gap_us: int, idle_timeout: bool):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if idle_timeout and state.hasTimedOut:
            # idle user: close and emit the open session, drop state
            start_us, last_us, n, seq = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "session_seq": seq, "n_events": n,
                  "start_us": start_us, "end_us": last_us, "closed": True}]
            )
            return

        ts = pd.concat([pdf["ts_us"] for pdf in pdfs]).sort_values().to_numpy()
        if state.exists:
            start_us, last_us, n, seq = state.get
        else:
            start_us, last_us, n, seq = int(ts[0]), int(ts[0]), 0, 0

        closed = []
        for t in ts:
            t = int(t)
            if n and t - last_us > gap_us:
                closed.append(
                    {"user_id": user_id, "session_seq": seq, "n_events": n,
                     "start_us": start_us, "end_us": last_us, "closed": True}
                )
                seq += 1
                start_us, n = t, 0
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n, seq))
        if idle_timeout:
            # continuous mode: a quiet user's open session flushes on
            # the first trigger after the gap elapses
            state.setTimeoutDuration(gap_us // 1000)
        open_row = [
            {"user_id": user_id, "session_seq": seq, "n_events": n,
             "start_us": start_us, "end_us": last_us, "closed": False}
        ]
        yield pd.DataFrame(closed + open_row)

    return fn


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    idle_timeout: bool = False,
) -> DataFrame:
    """Custom stateful sessionizer over ``applyInPandasWithState``.

    Emits one row per closed session (``closed=true``) plus the current
    open session per user (``closed=false``). State per user is four
    longs — O(users) memory regardless of event volume. This is the
    template for any stateful operator whose per-group emission the
    built-in aggregates can't express (the reference has no streaming
    tier at all — SURVEY §2.9 notes the journal was its only
    incremental surface).

    ``idle_timeout``: in a CONTINUOUS (processing-time trigger) query,
    evicts quiet users via ProcessingTimeTimeout, flushing their open
    session. Leave False for drain-and-stop (``availableNow``) runs —
    a registered processing-time timeout forces Spark to keep running
    empty micro-batches to service it, so the query never terminates."""
    prepared = events.select(
        F.col(key_col).alias("user_id"), F.unix_micros(F.col(ts_col)).alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds * 1_000_000, idle_timeout),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
