"""Bucketed-table sink: co-located joins for repeatedly-joined state.

The reconciliation pipeline joins the relation state on the same keys
every run (``id`` for classes, ``subject`` for relations — the keys
the reference indexes in Mongo, ``mongodb_loader.py:215-219``). On a
cluster, persisting both sides bucketed on the join key removes the
shuffle from EVERY subsequent run: Spark's bucketed scan exposes the
hash-partitioning to the planner, so a join between two tables
bucketed on the same key by the same bucket count plans with **no
Exchange on either side** (pinned by ``tests/test_bucketed_sink.py``).

This is the batch analog of the Iceberg DDL's
``write.distribution-mode = hash`` + ``WRITE ORDERED BY`` in
``sinks/merge.py`` — same intent (cluster the table on its merge
key), expressed for Spark's built-in catalog, which works without any
external metastore.

Bucket-count rule of thumb at scale: total_table_bytes /
target_file_bytes (128-512 MB), rounded to a power of two shared by
every table that joins on the key — mismatched bucket counts
reintroduce the shuffle on one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = DEFAULT_BUCKETS,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) on ``key`` into
    the session catalog as ``table`` (parquet source format; the
    default in-memory catalog suffices — no Hive metastore needed)."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``spark.read.parquet`` of the files would lose it)."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — plans without
    a shuffle on either side when bucket counts match."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), key
    )
