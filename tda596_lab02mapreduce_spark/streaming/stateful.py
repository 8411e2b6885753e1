"""Custom stateful streaming operators (SURVEY.md §2B UDF surface row):
per-key mutable state across micro-batches.

Two API generations are covered:

- ``running_user_stats``: applyInPandasWithState (GroupState) — runs
  everywhere, registered as the hash-checked
  ``stream_running_user_stats`` query.
- ``user_envelope_tws``: the Spark 4 transformWithStateInPandas
  StatefulProcessor API (named ValueState handles, RocksDB-backed).
  Its Python state protocol is protobuf-based, and this container
  ships no ``protobuf`` package, so the operator raises a clear
  ImportError up front here and is unit-tested behind
  ``pytest.importorskip("google.protobuf")`` — the same
  environment-capped honest-gate pattern as the Pillow codec path
  (operators/multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_stats(events: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Running per-user event count + value sum, updated each
    micro-batch. State is one (count, sum) pair per user — O(users),
    not O(events)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [s]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, sum_value double",
            stateStructType="n long, s double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


TWS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf wire protocol for
    its Python↔JVM state channel; without the package the driver-side
    stateful worker crashes at init (observed: ImportError in
    StateMessage_pb2 → STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def user_envelope_tws(events: DataFrame) -> DataFrame:
    """Per-user envelope (count, value sum, first/last event micros)
    via the Spark 4 ``transformWithStateInPandas`` StatefulProcessor:
    one named ValueState per user, updated per micro-batch — the
    order-insensitive aggregate choice makes the drained output
    deterministic, so the final per-user rows equal the batch
    ``groupBy(user_id).agg(count, sum, min, max)`` exactly.

    Caller contract: the session must run the RocksDB state store
    provider (``TWS_PROVIDER``) — transformWithState does not support
    the default HDFS-backed provider. ``events`` must carry
    (user_id, value, ts_us) with ts_us = unix_micros(ts).
    """
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "for its state protocol; not present in this container — "
            "use running_user_stats (applyInPandasWithState) instead"
        )
    from collections.abc import Iterator as _Iter  # noqa: PLC0415

    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Envelope(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "env", "n long, s double, mn long, mx long"
            )

        def handleInputRows(self, key, rows, timerValues) -> _Iter[pd.DataFrame]:
            if self._st.exists():
                n, s, mn, mx = self._st.get()
            else:
                n, s, mn, mx = 0, 0.0, None, None
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                lo, hi = int(pdf["ts_us"].min()), int(pdf["ts_us"].max())
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
            self._st.update((n, s, mn, mx))
            (user_id,) = key
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "sum_value": [s],
                    "first_ts_us": [mn],
                    "last_ts_us": [mx],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Envelope(),
        outputStructType=(
            "user_id long, n_events long, sum_value double, "
            "first_ts_us long, last_ts_us long"
        ),
        outputMode="Update",
        timeMode="None",
    )


def ewma_user_value(events_cents: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``ewma_dyadic_user_value``: per-user truncated
    dyadic EWMA via applyInPandasWithState. State is the last 9 cent
    values per user (O(1) per key — the truncation that makes the EWMA
    a bounded-state streaming op); each input row emits one output row
    with the same integer-weighted/IEEE-division arithmetic as the
    batch window form, so the drained result hash-matches the batch
    oracle bit-for-bit.

    Ordering contract: rows are sorted by (ts, event_id) WITHIN each
    micro-batch; cross-batch reordering (a late row arriving after a
    later-ts row was already folded) is not repaired — the same
    contract as the reference's presorted reduce input, and exact
    under the AvailableNow single-batch drain the oracle checks.
    ``events_cents`` must already carry ``y`` = integer cents computed
    by Spark's round (recomputing it in Python would import Python's
    bankers-rounding and drift off the batch form)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        hist: list[int] = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out_ids, out_vals = [], []
        for eid, y in zip(pdf["event_id"], pdf["y"]):
            hist.append(int(y))
            del hist[:-9]
            num = sum(v << (8 - k) for k, v in enumerate(reversed(hist)))
            den = sum(1 << (8 - k) for k in range(len(hist)))
            out_ids.append(int(eid))
            out_vals.append(num / den)  # IEEE double division, exact ints
        state.update((hist,))
        yield pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": [user_id] * len(out_ids),
                "ewma_cents": out_vals,
            }
        )

    return (
        events_cents.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="event_id long, user_id long, ewma_cents double",
            stateStructType="hist array<long>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def floor_balance_user(events_deltas: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``inventory_floor_balance``: the floored
    running balance b_t = max(0, b_{t-1} + x_t) as a stateful
    streaming operator via applyInPandasWithState — state is ONE
    integer per user (the current balance), the textbook bounded-state
    recursion that the batch form solves with the reflected-walk
    identity instead. Pure integer arithmetic in the UDF, so the
    drained per-event output hash-matches the batch identity's oracle
    bit-for-bit (the stream_ewma_user consistency discipline).

    Same ordering contract as ewma_user_value: rows sorted by
    (ts, event_id) within each micro-batch; exact under the
    AvailableNow single-batch drain the oracle checks.
    ``events_deltas`` must carry ``delta_c`` = signed integer cents
    computed Spark-side."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        bal: int = int(state.get[0]) if state.exists else 0
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out_ids, out_bal = [], []
        for eid, d in zip(pdf["event_id"], pdf["delta_c"]):
            bal = max(0, bal + int(d))
            out_ids.append(int(eid))
            out_bal.append(bal)
        state.update((bal,))
        yield pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": [user_id] * len(out_ids),
                "balance_c": out_bal,
            }
        )

    return (
        events_deltas.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="event_id long, user_id long, balance_c long",
            stateStructType="bal long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
