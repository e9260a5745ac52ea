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


def _update(
    key: Tuple[str], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        n_seen, seen_csv, prefix = state.get
        pending = set(int(x) for x in seen_csv.split(",") if x != "")
    else:
        n_seen, pending, prefix = 0, set(), 0

    for pdf in pdf_iter:
        for idx in pdf["turn_idx"]:
            n_seen += 1
            pending.add(int(idx))
    # advance the contiguous prefix over newly-filled gaps
    while prefix in pending:
        pending.discard(prefix)
        prefix += 1

    state.update((n_seen, ",".join(str(i) for i in sorted(pending)), prefix))
    state.setTimeoutDuration(60 * 60 * 1000)
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns_seen": pd.Series([n_seen], dtype="int32"),
            "contiguous_prefix": pd.Series([prefix], dtype="int32"),
        }
    )


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
