"""Conversation-level quality features and cross-conversation template
detection (``transcripts/quality.py``) pinned on hand-built dialogues
where every feature value is known."""

from pyspark.sql import functions as F

from ontology_loader_spark.transcripts.quality import (
    conversation_stats,
    template_turns,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _stats(spark, rows):
    df = conversation_stats(spark.createDataFrame(rows, SCHEMA))
    return {r["conv_id"]: r.asDict() for r in df.collect()}


def test_alternating_conversation_has_zero_breaks(spark):
    rows = [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello there"),
        ("c1", 2, "user", "bye"),
    ]
    s = _stats(spark, rows)["c1"]
    assert s["n_turns"] == 3 and s["n_user"] == 2 and s["n_assistant"] == 1
    assert s["alternation_breaks"] == 0
    assert s["sum_chars"] == 2 + 11 + 3
    assert s["max_chars"] == 11
    assert s["avg_turn_chars"] == (2 + 11 + 3) / 3
    # assistant chars / user chars
    assert s["assistant_user_char_ratio"] == 11 / 5


def test_breaks_counted_in_stable_order_and_repetition(spark):
    # same turn_idx twice: stable order resolves by text ("a..." < "b...")
    rows = [
        ("c2", 0, "user", "a question"),
        ("c2", 1, "user", "b same role again"),     # break 1
        ("c2", 1, "user", "a also same role"),      # break 2 (ties by text)
        ("c2", 2, "assistant", "answer"),
        ("c2", 3, "assistant", "answer"),           # break 3 + repeated text
    ]
    s = _stats(spark, rows)["c2"]
    assert s["alternation_breaks"] == 3
    assert s["n_distinct_turns"] == 4
    assert s["n_turns"] == 5


def test_ratio_null_when_role_absent(spark):
    rows = [("c3", 0, "tool", "search output"), ("c3", 1, "tool", "more")]
    s = _stats(spark, rows)["c3"]
    assert s["n_tool"] == 2
    assert s["assistant_user_char_ratio"] is None


def test_template_turns_threshold_counts_distinct_convs(spark):
    rows = [
        ("c1", 0, "assistant", "I cannot help with that."),
        ("c1", 1, "assistant", "I cannot help with that."),  # same conv twice
        ("c2", 0, "assistant", "I cannot help with that."),
        ("c3", 0, "assistant", "unique reply"),
    ]
    df = template_turns(spark.createDataFrame(rows, SCHEMA), min_convs=2)
    got = df.collect()
    assert len(got) == 1
    r = got[0]
    assert r["template_text"] == "I cannot help with that."
    assert r["n_convs"] == 2  # distinct convs, not row count
    assert r["n_rows"] == 3
    # hash column is the real md5 of the text
    expect = spark.range(1).select(
        F.md5(F.lit("I cannot help with that.")).alias("h")
    ).collect()[0]["h"]
    assert r["turn_hash"] == expect
