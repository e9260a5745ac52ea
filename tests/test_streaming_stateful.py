"""applyInPandasWithState operator: final per-conversation state after
draining the stream equals the batch ground truth (turn count +
contiguous prefix), even with out-of-order arrival across micro-batches."""

import datetime

import pytest
from pyspark.sql import functions as F

from ontology_loader_spark.schemas import TRANSCRIPT_SCHEMA
from ontology_loader_spark.streaming.ingest import stream_transcripts
from ontology_loader_spark.streaming.stateful import conversation_progress

BASE = datetime.datetime(2026, 2, 1)


def test_conversation_progress(spark, tmp_path):
    # c1: all 5 turns, delivered out of order; c2: gap at idx 1 ->
    # prefix stalls at 1 even though 3 turns arrived
    rows = [
        ("c1", i, "user", f"t{i}", None, BASE) for i in [3, 0, 4, 1, 2]
    ] + [
        ("c2", i, "user", f"t{i}", None, BASE) for i in [0, 2, 3]
    ]
    src = tmp_path / "src"
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    # several files -> several micro-batches (maxFilesPerTrigger=1)
    df.repartition(4).write.mode("overwrite").parquet(str(src))

    stream = stream_transcripts(spark, str(src), max_files_per_trigger=1)
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update mode emits one row per conv per micro-batch; the final
    # state is the row with the max n_turns_seen per conv
    final = {
        r["conv_id"]: (r["n_turns_seen"], r["contiguous_prefix"])
        for r in spark.sql(
            """select conv_id, n_turns_seen, contiguous_prefix from (
                 select *, row_number() over (partition by conv_id
                     order by n_turns_seen desc) rn from conv_progress
               ) where rn = 1"""
        ).collect()
    }
    assert final["c1"] == (5, 5)
    assert final["c2"] == (3, 1)


@pytest.mark.skipif(
    not __import__("ontology_loader_spark.streaming.stateful",
                   fromlist=["tws_runtime_available"]).tws_runtime_available(),
    reason="transformWithStateInPandas needs protobuf (not in this env); "
           "semantics are pinned via the shared _advance transition + "
           "test_advance_transition_shared below",
)
def test_conversation_progress_tws_matches_apply_in_pandas(spark, tmp_path):
    """The transformWithStateInPandas migration must land on the same
    final per-conversation state as the applyInPandasWithState
    operator on the same out-of-order stream."""
    from ontology_loader_spark.streaming.stateful import conversation_progress_tws

    rows = [
        ("c1", i, "user", f"t{i}", None, BASE) for i in [3, 0, 4, 1, 2]
    ] + [
        ("c2", i, "user", f"t{i}", None, BASE) for i in [0, 2, 3]
    ]
    src = tmp_path / "src_tws"
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).repartition(4).write.mode(
        "overwrite"
    ).parquet(str(src))

    stream = stream_transcripts(spark, str(src), max_files_per_trigger=1)
    q = (
        conversation_progress_tws(stream)
        .writeStream.format("memory")
        .queryName("conv_progress_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    final = {
        r["conv_id"]: (r["n_turns_seen"], r["contiguous_prefix"])
        for r in spark.sql(
            """select conv_id, n_turns_seen, contiguous_prefix from (
                 select *, row_number() over (partition by conv_id
                     order by n_turns_seen desc) rn from conv_progress_tws
               ) where rn = 1"""
        ).collect()
    }
    assert final == {"c1": (5, 5), "c2": (3, 1)}


def test_advance_transition_shared():
    """Both stateful operators fold through the one pure transition
    function; pin its semantics directly (out-of-order arrival, gap
    stall, gap fill across calls)."""
    from ontology_loader_spark.streaming.stateful import _advance

    st = _advance(None, [3, 0])
    assert st == (2, "3", 1)            # 0 consumed, 3 pending
    st = _advance(st, [2])
    assert st == (3, "2,3", 1)          # gap at 1 stalls the prefix
    st = _advance(st, [1])
    assert st == (4, "", 4)             # gap filled -> prefix jumps
    assert _advance(st, []) == (4, "", 4)   # idempotent on empty batch

def test_tws_query_constructs(spark):
    """The transformWithState plan must at least construct and analyze
    (API-level migration check that runs without protobuf)."""
    from ontology_loader_spark.streaming.ingest import stream_transcripts
    from ontology_loader_spark.streaming.stateful import (
        PROGRESS_SCHEMA,
        conversation_progress_tws,
    )
    import tempfile, os
    from ontology_loader_spark.schemas import TRANSCRIPT_SCHEMA
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        spark.createDataFrame([], TRANSCRIPT_SCHEMA).write.parquet(src)
        out = conversation_progress_tws(stream_transcripts(spark, src))
        assert out.schema == PROGRESS_SCHEMA
        assert out.isStreaming
