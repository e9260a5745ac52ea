"""Custom stateful streaming operator: per-conversation running state
via ``applyInPandasWithState`` (the brief's "applyInPandasWithState for
custom stateful operators").

``conversation_progress`` tracks, per conv_id, the number of turns seen
and the highest contiguous turn_idx prefix (i.e., "how much of the
conversation can be replayed in order so far") — the streaming twin of
the batch turn-ordering invariant. State is a compact (count, seen-set
frontier) tuple; memory is bounded because conversations are bounded
(~200 turns) and idle conversations time out.

At production scale the groupBy(conv_id) state shuffles once per
micro-batch on the same key the batch pipeline uses — no separate
partitioning scheme to maintain.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PROGRESS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_turns_seen", IntegerType(), False),
        StructField("contiguous_prefix", IntegerType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_seen", IntegerType(), True),
        StructField("seen_idxs", StringType(), True),  # csv of pending idxs
        StructField("prefix", IntegerType(), True),
    ]
)


def _advance(
    stored: Tuple[int, str, str] | None, idxs
) -> Tuple[int, str, int]:
    """The pure state transition both stateful APIs share: fold a batch
    of turn indexes into (n_seen, pending-csv, contiguous prefix).
    Keeping it API-free pins the applyInPandasWithState and
    transformWithState operators to one semantics definition."""
    if stored is not None:
        n_seen, seen_csv, prefix = stored
        pending = set(int(x) for x in seen_csv.split(",") if x != "")
    else:
        n_seen, pending, prefix = 0, set(), 0
    for idx in idxs:
        n_seen += 1
        pending.add(int(idx))
    # advance the contiguous prefix over newly-filled gaps
    while prefix in pending:
        pending.discard(prefix)
        prefix += 1
    return n_seen, ",".join(str(i) for i in sorted(pending)), prefix


def _progress_row(key, n_seen: int, prefix: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns_seen": pd.Series([n_seen], dtype="int32"),
            "contiguous_prefix": pd.Series([prefix], dtype="int32"),
        }
    )


def _update(
    key: Tuple[str], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    stored = tuple(state.get) if state.exists else None
    idxs = [idx for pdf in pdf_iter for idx in pdf["turn_idx"]]
    n_seen, pending_csv, prefix = _advance(stored, idxs)
    state.update((n_seen, pending_csv, prefix))
    state.setTimeoutDuration(60 * 60 * 1000)
    yield _progress_row(key, n_seen, prefix)


def conversation_progress(stream: DataFrame) -> DataFrame:
    """Streaming per-conversation progress tracker (update mode)."""
    return (
        stream.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=PROGRESS_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


class ConversationProgressProcessor:
    """``transformWithStateInPandas`` form of the same operator — the
    successor API (typed state handles, timers, TTL on the state
    variable itself). Semantics are pinned to the
    ``applyInPandasWithState`` variant by a paired test: identical
    final per-conversation (n_turns_seen, contiguous_prefix).

    Defined as a plain class (not subclassing at import time) so
    importing this module never requires the transformWithState
    runtime deps (``protobuf``, absent in some environments); the
    factory below mixes in ``StatefulProcessor``. The state transition
    is the shared :func:`_advance` — one semantics definition for both
    stateful APIs.
    """

    STATE_TTL_MS = 60 * 60 * 1000  # idle conversations expire, as before

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "progress", STATE_SCHEMA, ttlDurationMs=self.STATE_TTL_MS
        )

    def handleInputRows(self, key, rows, timerValues):
        stored = tuple(self._state.get()) if self._state.exists() else None
        idxs = [idx for pdf in rows for idx in pdf["turn_idx"]]
        n_seen, pending_csv, prefix = _advance(stored, idxs)
        self._state.update((n_seen, pending_csv, prefix))
        yield _progress_row(key, n_seen, prefix)

    def close(self) -> None:
        pass


def tws_runtime_available() -> bool:
    """transformWithStateInPandas needs the protobuf-backed state
    client (``pyspark.sql.streaming.proto``); absent protobuf, the
    query crashes at runner init — gate callers/tests on this."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def conversation_progress_tws(stream: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` migration of
    :func:`conversation_progress` (same output schema + semantics)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    cls = type(
        "ConversationProgressStateful",
        (ConversationProgressProcessor, StatefulProcessor),
        {},
    )
    return (
        stream.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .transformWithStateInPandas(
            statefulProcessor=cls(),
            outputStructType=PROGRESS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
