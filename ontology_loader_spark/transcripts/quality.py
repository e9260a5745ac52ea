"""Conversation-level quality analysis and cross-conversation template
detection — the transcript-axis half of the text-quality family
(``operators/text.py`` scores documents; this module scores
conversations, the unit the north-star KG job ingests).

Training-data motivation: dialogue corpora are filtered on structural
quality (role alternation, turn balance, repetition) before any
per-document scoring, and boilerplate turns ("I'm sorry, I can't help
with that", templated tool headers) that recur across conversations are
de-weighted or dropped. Both are single-shuffle aggregations:

* :func:`conversation_stats` — one ``groupBy(conv_id)`` (hash-uniform;
  a conversation is bounded, ~200 turns, so no per-key skew). The
  alternation count needs the stable turn order first — the same
  bounded ``Window.partitionBy(conv_id)`` as T1 ordering
  (``ordering.py``), never a global sort.
* :func:`template_turns` — one ``groupBy(md5(text))`` (uniform key by
  construction). ``count_distinct(conv_id)`` runs as Spark's built-in
  two-phase partial-distinct aggregate, so a template shared by
  millions of conversations never materializes a per-group set.

Reference parity: no analog — the reference loads ontologies only; this
extends SURVEY.md §2.3's transcript front-end (T1-T3) with the
quality/boilerplate operators a corpus-scale deployment needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation structural quality features.

    Output, one row per conv_id:
      n_turns, n_user, n_assistant, n_tool — turn counts by role;
      alternation_breaks — consecutive same-role turn pairs in stable
        (turn_idx, text) order (clean dialogues alternate; a high count
        flags concatenation/merge corruption);
      n_distinct_turns — distinct turn texts (repetition signal);
      sum_chars / max_chars — text volume;
      avg_turn_chars — sum_chars / n_turns as double;
      assistant_user_char_ratio — assistant chars / user chars (NULL
        when either side is absent: no signal, not a zero score).

    The lag window and the aggregate share the one conv_id shuffle
    (same hash partitioning, no second exchange).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "text")
    ln = F.length("text")
    t = transcripts.withColumn(
        "same_as_prev",
        (F.lag("role").over(w) == F.col("role")).cast("int"),
    )
    n_user = F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
    n_assistant = F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
    n_tool = F.sum(F.when(F.col("role") == "tool", 1).otherwise(0))
    sum_chars = F.sum(ln)
    user_chars = F.sum(F.when(F.col("role") == "user", ln))
    assistant_chars = F.sum(F.when(F.col("role") == "assistant", ln))
    return t.groupBy("conv_id").agg(
        F.count("*").cast("int").alias("n_turns"),
        n_user.cast("int").alias("n_user"),
        n_assistant.cast("int").alias("n_assistant"),
        n_tool.cast("int").alias("n_tool"),
        F.coalesce(F.sum("same_as_prev"), F.lit(0))
        .cast("int")
        .alias("alternation_breaks"),
        F.count_distinct("text").cast("int").alias("n_distinct_turns"),
        sum_chars.cast("bigint").alias("sum_chars"),
        F.max(ln).cast("int").alias("max_chars"),
        (sum_chars.cast("double") / F.count("*").cast("double")).alias(
            "avg_turn_chars"
        ),
        (
            assistant_chars.cast("double") / user_chars.cast("double")
        ).alias("assistant_user_char_ratio"),
    )


def template_turns(transcripts: DataFrame, min_convs: int = 2) -> DataFrame:
    """Cross-conversation boilerplate detection: turn texts recurring in
    at least ``min_convs`` DISTINCT conversations.

    Output (turn_hash, template_text, n_convs, n_rows) — downstream
    filters anti-join transcripts on ``md5(text)`` against this
    (dictionary-sized) table, the same shape as the exact-dedup verdict
    join in ``operators/dedup.py``. ``min(text)`` is a deterministic
    representative (all texts in an md5 group are equal in practice).
    """
    return (
        transcripts.groupBy(F.md5("text").alias("turn_hash"))
        .agg(
            F.min("text").alias("template_text"),
            F.count_distinct("conv_id").cast("int").alias("n_convs"),
            F.count("*").cast("int").alias("n_rows"),
        )
        .filter(F.col("n_convs") >= min_convs)
    )
