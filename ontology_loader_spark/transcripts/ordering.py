"""T1 — stable per-conversation turn ordering.

The north-rule per-row invariant: per-turn text equality under stable
turn ordering (BASELINE.json ``input_hint``). Transcripts land out of
order on disk; every order-sensitive downstream step (mention spans,
reassembly) must see turns in ``turn_idx`` order *within* a
conversation without imposing any global sort.

Scale: ``Window.partitionBy(conv_id).orderBy(turn_idx)`` shuffles once
on conv_id (hash-distributed — 10^12 turns spread over conversations
with Zipf-ish turn counts; a single conversation is bounded (~200
turns) so no per-key skew blowup). For repeated order-sensitive stages
use ``repartition(conv_id)`` + ``sortWithinPartitions`` once and reuse
the partitioning (SURVEY.md §4.2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_turn_order(transcripts: DataFrame) -> DataFrame:
    """Attach ``rn`` = 1-based stable position of the turn within its
    conversation.

    ``text`` is the deterministic tie-break for duplicate turn_idx
    values (dirty upstream data must not make ordering
    partitioning-dependent — SURVEY.md §7.3.5)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "text")
    return transcripts.withColumn("rn", F.row_number().over(w).cast("int"))


def reassembled(transcripts: DataFrame) -> DataFrame:
    """Per-conversation reassembly in stable order: the concatenation
    used by the text-equality invariant test."""
    ordered = with_turn_order(transcripts)
    return ordered.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("turn_idx", "text"))
                ),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("conv_text"),
        F.count("*").cast("int").alias("n_turns"),
    )
