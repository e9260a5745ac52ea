"""Dialogue-dynamics analysis over the transcript table — the
role-transition / latency / tool-usage profile of a conversation
corpus.

Training-data motivation: multi-turn corpora are filtered on dialogue
SHAPE before content scoring — turn-taking structure (who follows
whom), response latency (event-time gaps between consecutive turns;
negative gaps flag out-of-order ingestion), and tool-call mix (which
tools dominate, how concentrated tool use is per conversation). All of
it reduces to one bounded per-conversation window plus one global
aggregation:

* :func:`turn_transition_stats` — ``lag`` over the same bounded
  ``Window.partitionBy(conv_id)`` as T1 ordering (``ordering.py``;
  a conversation is bounded, never a global sort), then ONE
  ``groupBy(prev_role, role)`` whose key domain is |roles|^2 — tiny —
  and whose aggregates (count / sum / min / max) are all map-side
  combinable, so the hot keys are additive-skew only (the
  AQE-friendly case).
* :func:`tool_usage_profile` — one ``groupBy(tool)``; the distinct
  counts run as Spark's two-phase partial-distinct aggregate, so a
  tool called from millions of conversations never materializes a
  per-group set.

Latency arithmetic is ``timestampdiff(SECOND, ...)`` on the
TIMESTAMP_NTZ column — naive differences, identical to DuckDB's
``date_diff('second', ...)`` with no session-timezone / DST coupling
(the ``operators/events.py::_epoch_sec`` discipline).

Reference parity: no analog — the reference loads ontologies only;
this extends SURVEY.md §2.3's transcript front-end with the dialogue
structure operators a corpus-scale deployment filters on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def turn_transition_stats(transcripts: DataFrame) -> DataFrame:
    """Role-transition matrix with event-time latency aggregates.

    Output, one row per observed (prev_role, role) ordered pair:
      n — transition count;
      sum_latency_s / min_latency_s / max_latency_s — seconds between
        the consecutive turns' ``ts`` in stable (turn_idx, text) order.
        Negative values are data-quality signal (event time running
        backwards within a conversation), deliberately NOT clamped.

    The lag window and nothing else touches per-conversation state;
    the downstream groupBy key domain is |roles|^2.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "text")
    t = (
        transcripts.select("conv_id", "turn_idx", "role", "text", "ts")
        .withColumn("prev_role", F.lag("role").over(w))
        .withColumn("prev_ts", F.lag("ts").over(w))
    )
    lat = F.expr("timestampdiff(SECOND, prev_ts, ts)").cast("bigint")
    return (
        t.filter(F.col("prev_role").isNotNull())
        .select("prev_role", "role", lat.alias("latency_s"))
        .groupBy("prev_role", "role")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("latency_s").cast("bigint").alias("sum_latency_s"),
            F.min("latency_s").cast("bigint").alias("min_latency_s"),
            F.max("latency_s").cast("bigint").alias("max_latency_s"),
        )
    )


def tool_usage_profile(transcripts: DataFrame) -> DataFrame:
    """Per-tool usage profile over tool-role turns.

    Output, one row per distinct non-null ``tool``:
      n_calls — total invocations;
      n_convs — distinct conversations using the tool;
      n_distinct_texts — distinct tool-turn payloads (a low ratio to
        n_calls flags templated/boilerplate tool output);
      sum_turn_idx — summed 0-based positions (with n_calls this gives
        the mean call position: early-vs-late tool usage).
    """
    return (
        transcripts.filter(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(
            F.count("*").cast("bigint").alias("n_calls"),
            F.count_distinct("conv_id").cast("bigint").alias("n_convs"),
            F.count_distinct("text").cast("bigint").alias("n_distinct_texts"),
            F.sum("turn_idx").cast("bigint").alias("sum_turn_idx"),
        )
    )


def turn_context_windows(transcripts: DataFrame, n_prev: int = 2) -> DataFrame:
    """Dialogue-LM training contexts: each turn with its previous
    ``n_prev`` turns prepended in stable order — (conv_id, turn_idx,
    role, context_text). The context-packing primitive for
    next-turn-prediction corpora (the per-turn analog of
    ``corpus.py::chunk_documents``'s overlap carry).

    One bounded per-conversation lag window (the T1 ordering shuffle,
    reused by every dialogue operator — never a global sort);
    ``concat_ws`` skips the NULL lags at conversation starts in both
    engines, so the first turns simply carry shorter contexts.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "text")
    lags = [F.lag("text", i).over(w) for i in range(n_prev, 0, -1)]
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.concat_ws("\n", *lags, F.col("text")).alias("context_text"),
    )
