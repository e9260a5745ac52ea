"""Partition-count sizing for iterative fixpoint state.

Driver-loop operators (ancestor closure, connected components) keep a
small-but-growing state DataFrame that is re-shuffled every iteration.
A fixed ``coalesce(8)`` is right when the state is dictionary-bounded
(ontology pair tables) but caps parallelism — and risks executor OOM —
if the same operator is pointed at a corpus-scale graph (document-dedup
components). Derive the count from the observed row count instead:
roughly ``rows / rows_per_partition`` tasks, floored so tiny state
still gets a few tasks, capped at ``spark.sql.shuffle.partitions`` so
iteration state never exceeds the session's shuffle width.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

#: target rows per iteration-state partition — small enough that a
#: partition of (string, string) pairs is a few tens of MB, large
#: enough that dictionary-scale state stays on single-digit task counts
ROWS_PER_STATE_PARTITION = 250_000


def state_partitions(
    spark: SparkSession,
    approx_rows: int,
    rows_per_partition: int = ROWS_PER_STATE_PARTITION,
    floor: int = 8,
) -> int:
    """Partition count for iteration state holding ``approx_rows`` rows."""
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ceiling = max(shuffle, floor)
    need = max(floor, math.ceil(max(approx_rows, 1) / rows_per_partition))
    return min(need, ceiling)
