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
