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

Publish discipline — versioned directory + symlink flip:
- data is written to a permanent versioned sibling
  (``<path>.v-<id>``) and the table path is a SYMLINK to the live
  version. Re-pointing the symlink is one atomic ``rename``, so a
  concurrent reader always resolves a complete version (old or new,
  never a mix, never a missing path) and a crash mid-compaction
  leaves the previous version live and the half-written one as an
  orphaned sibling.
- old versions are NOT deleted at publish time: a reader that resolved
  the old version immediately before the flip may still be mid-scan.
  GC is deferred one full compaction cycle (keep-last-N: the live
  version plus the most recent replaced one always survive; anything
  older is collected by the next compaction) — so a version is only
  deleted once a strictly newer *replaced* version exists, i.e. at
  least one whole compaction interval after it stopped being live.
- the one exception is the FIRST compaction of a legacy plain
  directory, which must be migrated to the symlink layout: that flip
  is two renames (directory away, symlink in) with a sub-millisecond
  window where the path does not resolve. A recovery note
  (``<path>.RECOVERY-<id>.json``) naming the live version is written
  before the window opens and removed after it closes, and the old
  directory is kept in place until the new symlink is live — a crash
  anywhere leaves all data on disk plus an explicit pointer to the
  version that should be published.
"""

from __future__ import annotations

import json
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


def live_version(path: str) -> str | None:
    """The versioned directory ``path`` currently resolves to, or None
    for a legacy plain directory (pre-migration layout)."""
    return os.path.realpath(path) if os.path.islink(path) else None


def gc_versions(path: str, keep_replaced: int = 1) -> list[str]:
    """Collect version directories older than the ``keep_replaced``
    most recently replaced ones (the live version is never touched).

    Called after publish: the version replaced by THIS compaction is
    the newest non-live sibling and therefore survives — a concurrent
    reader that resolved it just before the flip can finish its scan.
    It is collected by the NEXT compaction's GC, one full compaction
    interval later."""
    live = live_version(path)
    parent = os.path.dirname(os.path.abspath(path)) or "."
    base = os.path.basename(path)
    replaced = []
    for name in os.listdir(parent):
        full = os.path.join(parent, name)
        if (
            name.startswith(f"{base}.v-")
            and os.path.isdir(full)
            and not os.path.islink(full)
            and os.path.realpath(full) != live
        ):
            replaced.append(full)
    replaced.sort(key=lambda p: os.stat(p).st_mtime, reverse=True)
    victims = replaced[keep_replaced:]
    for v in victims:
        shutil.rmtree(v, ignore_errors=True)
    return victims


def _publish(path: str, new_version: str) -> None:
    """Point ``path`` at ``new_version`` atomically (symlink rename).

    Legacy plain directories are migrated to the symlink layout under
    a recovery note; established symlink layouts flip with ZERO
    unavailability (one atomic rename over the existing link)."""
    tmp_link = f"{path}.link-{uuid.uuid4().hex[:8]}"
    os.symlink(os.path.abspath(new_version), tmp_link)
    if os.path.islink(path):
        # atomic replace: readers see the old or the new version
        os.rename(tmp_link, path)
        return
    # legacy layout migration — the only non-atomic publish this sink
    # ever performs; bracketed by a recovery note and the old directory
    # stays on disk until the new link is live
    note = f"{path}.RECOVERY-{uuid.uuid4().hex[:8]}.json"
    with open(note, "w") as fh:
        json.dump({"table_path": path, "live_version": new_version,
                   "action": "rename this version (or a symlink to it) "
                             "to table_path if the flip crashed"}, fh)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    try:
        os.rename(path, old)
        os.rename(tmp_link, path)
    finally:
        if os.path.exists(path):  # flip landed — safe to clean up
            shutil.rmtree(old, ignore_errors=True)
            os.unlink(note)


def compact_parquet_dir(
    spark: SparkSession, path: str, target_bytes: int = TARGET_BYTES
) -> dict:
    """Rewrite ``path`` to ceil(bytes/target) files; returns a summary
    dict (files_before, files_after, bytes, rows). Publishes via the
    versioned-directory + symlink flip above — a reader never observes
    a partial rewrite or (past the one-time layout migration) a
    missing path."""
    before_files = len(list(Path(path).rglob("*.parquet")))
    nbytes = directory_bytes(path)
    n_files = max(1, -(-nbytes // target_bytes))

    df = spark.read.parquet(path)
    n_rows = df.count()
    new_version = f"{path}.v-{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.mode("overwrite").parquet(new_version)

    _publish(path, new_version)
    # deferred GC: the version replaced just now SURVIVES (concurrent
    # readers mid-scan on it keep their files); versions replaced by
    # earlier compactions are collected
    gced = gc_versions(path)

    after_files = len(list(Path(path).rglob("*.parquet")))
    return {
        "files_before": before_files,
        "files_after": after_files,
        "bytes": nbytes,
        "rows": n_rows,
        "version_dir": new_version,
        "gced_versions": gced,
    }
