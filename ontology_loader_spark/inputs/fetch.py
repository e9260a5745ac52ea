"""S1 — remote ontology artifact fetch with a local cache.

The reference resolves an ontology NAME to the public semantic-sql
artifact ``https://s3.amazonaws.com/bbop-sqlite/<name>.db.gz``,
downloads it into a pystow-managed cache directory, and gunzips it
next to the download (``ontology_processor.py:63-92``). This module is
the Spark engine's equivalent front door:

- ``ontology_url(name)`` — the same public URL scheme;
- ``fetch_ontology(name, ...)`` — download (or reuse the cached copy),
  gunzip, and return the path of the ready-to-read ``.db`` file, which
  feeds straight into :func:`~ontology_loader_spark.inputs.ingest.
  read_semsql_sqlite`.

The transport is INJECTABLE: ``opener`` takes a URL and returns a
binary file-like object (default ``urllib.request.urlopen``). That
keeps the function unit-testable in an offline sandbox (``file://``
URLs work with the default opener too) and lets a production caller
swap in a session with retries/auth without this module growing any
network policy of its own.

Scale note: the ontology artifact is dictionary-scale (MBs-GBs, driver
-local by nature — SQLite is a single file); the fetch is a driver-side
step exactly like the reference's, and nothing corpus-sized ever flows
through it.
"""

from __future__ import annotations

import gzip
import os
import shutil
import urllib.request
from typing import BinaryIO, Callable

#: the reference's public artifact service (ontology_processor.py:76-78)
ONTOLOGY_URL_PREFIX = "https://s3.amazonaws.com/bbop-sqlite/"
ONTOLOGY_URL_SUFFIX = ".db.gz"

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "ontology_loader_spark"
)


def ontology_url(name: str) -> str:
    """Public semantic-sql artifact URL for an ontology name
    (lower-cased, the reference's convention)."""
    return f"{ONTOLOGY_URL_PREFIX}{name.lower()}{ONTOLOGY_URL_SUFFIX}"


def fetch_ontology(
    name: str,
    url: str | None = None,
    cache_dir: str | None = None,
    opener: Callable[[str], BinaryIO] | None = None,
    force: bool = False,
) -> str:
    """Ensure ``<cache_dir>/<name>/<name>.db`` exists and return its
    path: download ``url`` (default: the public artifact for ``name``)
    unless the compressed copy is already cached, then gunzip unless
    the decompressed copy already exists — the same ensure/extract
    idempotence as the reference's pystow flow. ``force`` redownloads
    and re-extracts.

    Both steps write to a temp sibling and rename into place, so a
    crashed fetch never leaves a truncated file that a later call
    would trust."""
    name = name.lower()
    url = url or ontology_url(name)
    opener = opener or urllib.request.urlopen
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    module_dir = os.path.join(cache_dir, name)
    os.makedirs(module_dir, exist_ok=True)

    gz_path = os.path.join(module_dir, f"{name}.db.gz")
    db_path = os.path.join(module_dir, f"{name}.db")

    if force:
        for p in (gz_path, db_path):
            if os.path.exists(p):
                os.unlink(p)

    if not os.path.exists(gz_path):
        tmp = f"{gz_path}.part"
        with opener(url) as src, open(tmp, "wb") as dst:
            shutil.copyfileobj(src, dst)
        os.rename(tmp, gz_path)

    if not os.path.exists(db_path):
        tmp = f"{db_path}.part"
        with gzip.open(gz_path, "rb") as fin, open(tmp, "wb") as fout:
            shutil.copyfileobj(fin, fout)
        os.rename(tmp, db_path)

    return db_path
