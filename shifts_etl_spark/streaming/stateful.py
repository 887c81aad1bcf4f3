"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming surface (SURVEY.md §2.10); these are the
north-star extensions' stateful building blocks, shaped the way Structured
Streaming wants them: state keyed by a partition column, Arrow-batched
per-key updates, event-time timeouts for state expiry.

`streaming_sessionize` is the streaming twin of
operators/windows.session_window: it maintains an open session per user in
state and EMITS a session row when the gap timeout closes it — the same
(user_id, session_id, n_events, sum_value) contract as the batch version.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql import functions as F

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, n_events long, sum_value double"
)
SESSION_STATE_SCHEMA = "start long, last long, n long, total double"


def _sessionize_one_user(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
    gap_seconds: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, _last, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(start, unit="us"),
                    "n_events": n,
                    "sum_value": total,
                }
            ]
        )
        return

    rows = pd.concat(list(batches)).sort_values("ts")
    closed: list[dict] = []
    if state.exists:
        start, last, n, total = state.get
    else:
        start, last, n, total = None, None, 0, 0.0

    for ts_us, value in zip(
        rows["ts"].astype("int64") // 1000, rows["value"].astype("float64")
    ):
        ts_us = int(ts_us)
        if start is None:
            start, last, n, total = ts_us, ts_us, 1, float(value)
        elif ts_us - last > gap_seconds * 1_000_000:
            closed.append(
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(start, unit="us"),
                    "n_events": n,
                    "sum_value": total,
                }
            )
            start, last, n, total = ts_us, ts_us, 1, float(value)
        else:
            last, n, total = ts_us, n + 1, total + float(value)

    state.update((start, last, n, total))
    state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)
    if closed:
        yield pd.DataFrame(closed)


def streaming_sessionize(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """events stream (user_id, ts, value) → closed-session rows. State per
    user; a session closes when the event-time watermark passes its last
    event + gap (timeout), or eagerly when a later in-batch event opens the
    next session."""
    gap_seconds = gap_minutes * 60

    def fn(key, pdf_iter, state):
        return _sessionize_one_user(key, pdf_iter, state, gap_seconds)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_streaming_sessionize(
    spark: SparkSession,
    input_dir: str | Path,
    checkpoint_dir: str | Path,
    gap_minutes: int = 30,
    query_name: str = "sessions",
):
    """Wire streaming_sessionize to a JSON file-drop source and a memory
    sink (availableNow drain) — the testable end-to-end shape."""
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .json(str(input_dir))
    )
    sessions = streaming_sessionize(events, gap_minutes)
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x stateful v2): typed state handles +
# RocksDB state store. The v2 twin of the applyInPandasWithState ops above.

TOTALS_OUT_SCHEMA = "user_id long, n_events long, sum_value double, max_value double"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key lifetime aggregate in a typed ValueState — the shape every
    feature-store "user profile" stream maintains. State is one fixed-size
    tuple per key (bounded by keyspace, not traffic); RocksDB spills it
    off-heap, so a 10^9-key profile table survives executor memory."""

    def init(self, handle) -> None:
        self._agg = handle.getValueState("agg", "n long, total double, mx double")

    def handleInputRows(self, key, rows, timerValues):
        prev = self._agg.get() if self._agg.exists() else None
        n, total, mx = prev if prev is not None else (0, 0.0, None)
        for pdf in rows:
            if len(pdf) == 0:
                continue
            n += int(len(pdf))
            total += float(pdf["value"].sum())
            batch_max = float(pdf["value"].max())
            mx = batch_max if mx is None else max(mx, batch_max)
        self._agg.update((n, total, mx))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "sum_value": total,
              "max_value": mx}]
        )

    def close(self) -> None:
        pass


def streaming_running_totals(
    spark: SparkSession,
    input_dir: str | Path,
    checkpoint_dir: str | Path,
    query_name: str = "user_totals",
):
    """Per-user running (count, sum, max) over an event stream via
    transformWithStateInPandas in Update mode: each micro-batch emits the
    keys it touched with their new lifetime totals. Requires the RocksDB
    state store (set here; HDFS-backed in-memory provider does not
    support the v2 API) and the ``protobuf`` package (the v2 state
    protocol wire format) — environments without it should use the
    applyInPandasWithState ops above, which cover the same semantics."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package for "
            "its state-server protocol; use the applyInPandasWithState "
            "operators in this module instead"
        ) from exc
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .json(str(input_dir))
    )
    totals = events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TOTALS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    return (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
