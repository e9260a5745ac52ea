"""Hive-style partitioned parquet sink + pruned-scan reads.

Directory partitioning is the cheapest scan optimization a 100 TB
corpus store has: writing ``.partitionBy(col)`` lays each partition
value out as its own directory, and any read whose filter pins the
partition column never LISTS — let alone reads — the other
directories. Catalyst does this automatically when the plan is
declarative (the filter must reach the scan as a ``PartitionFilters``
entry, which ``tests/test_partitioned_sink.py`` pins), so a
per-source or per-day job touches only its slice of the corpus.

Guidance encoded here rather than left to callers:

- partition on LOW-cardinality columns a real workload filters by
  (source/domain, ingest date). A high-cardinality partition column
  (doc_id!) creates millions of tiny directories and kills the
  listing the feature exists to avoid — ``write_partitioned`` refuses
  above ``max_partitions`` unless overridden.
- inside each partition, files should be few and large:
  ``files_per_partition`` repartitions by the partition column first
  so each directory gets at most that many files instead of one file
  per input task (the small-files problem at the write side).

Reference parity: the reference has no partitioned store (Mongo
collections, ``mongodb_loader.py:215-219``); this is §2.3-style
Spark-first infrastructure for the corpus tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: refuse to explode the directory tree past this many partitions
MAX_PARTITIONS = 10_000


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
    files_per_partition: int = 1,
    max_partitions: int = MAX_PARTITIONS,
) -> int:
    """Write ``df`` as parquet partitioned by ``partition_col``;
    returns the partition-value count. One count() guards against the
    high-cardinality-partition-column mistake before any data moves;
    the pre-write repartition bounds files per directory."""
    n_parts = df.select(partition_col).distinct().count()
    if n_parts > max_partitions:
        raise ValueError(
            f"{partition_col} has {n_parts} distinct values — partitioning "
            f"would create {n_parts} directories (max_partitions="
            f"{max_partitions}); partition on a low-cardinality column or "
            "raise the limit explicitly"
        )
    # repartition keys: hashing ONLY the partition column would land all
    # rows of one partition value in a single task (one file per dir no
    # matter what files_per_partition says) — add a row-hash salt bounded
    # to files_per_partition so each directory splits into at most that
    # many tasks/files
    keys = [F.col(partition_col)]
    if files_per_partition > 1:
        keys.append(
            F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                   F.lit(files_per_partition))
        )
    (
        df.repartition(max(n_parts * files_per_partition, 1), *keys)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return n_parts


def read_partition(
    spark: SparkSession, path: str, partition_col: str, value
) -> DataFrame:
    """Scan exactly one partition: the equality filter is declarative,
    so it reaches the FileScan as a PartitionFilters entry and the
    other directories are pruned at planning time (never listed on a
    partition-aware catalog, never read anywhere)."""
    return spark.read.parquet(path).filter(F.col(partition_col) == value)
