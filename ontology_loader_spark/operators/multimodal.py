"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The image/audio codec libraries are not in this container, so the
decode kernel is a STUB — ``decode_image_stub`` derives deterministic
fake dimensions from the payload bytes (clearly marked; swap for a real
PIL/ffmpeg kernel in production). Everything around it — the binary
column schema, the Arrow batch shape (bytes arrive as ``bytes`` objects
per row inside a pandas batch), the partition-parallel UDF signature,
and the metadata projection — is the real 100 TB plumbing: payloads
never pass through the driver, batches stay columnar until the Python
kernel, and outputs are plain scalars so downstream stages stay
codegen'd.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("status", StringType(), False),
    ]
)


def with_payload(documents: DataFrame) -> DataFrame:
    """Attach a synthetic binary payload (md5 digest bytes of the text)
    standing in for image/audio bytes — 16 bytes per row, deterministic."""
    return documents.select(
        "doc_id", F.unhex(F.md5(F.col("text"))).alias("payload")
    )


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode kernel. Production replaces this with a real decoder
    (PIL.Image.open / soundfile / pyav frame sampling). Deterministic
    fake dims derived from the first two payload bytes."""
    width = 1 + (payload[0] % 64)
    height = 1 + (payload[1] % 64)
    return width, height


def decode_payloads(documents_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode: (doc_id, payload binary) → typed metadata.

    Batches iterate columnar; the kernel touches bytes only inside the
    executor Python worker."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, widths, heights = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                w, h = decode_image_stub(raw)
                n_bytes.append(len(raw))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.Series(n_bytes, dtype="int32"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "status": "stub_decoded",
                }
            )

    return documents_with_payload.mapInPandas(run, schema=DECODED_SCHEMA)


def decode_metadata_sql() -> str:
    """Oracle: the stub's outputs re-derived from the md5 hex string
    (byte k = hex chars 2k+1..2k+2), proving the binary round-trip."""

    def byte_expr(k: int) -> str:
        hi = f"(instr('0123456789abcdef', substr(md5(text), {2 * k + 1}, 1)) - 1)"
        lo = f"(instr('0123456789abcdef', substr(md5(text), {2 * k + 2}, 1)) - 1)"
        return f"({hi} * 16 + {lo})"

    return f"""
SELECT doc_id,
  CAST(16 AS INTEGER) AS n_bytes,
  CAST(1 + ({byte_expr(0)} % 64) AS INTEGER) AS width,
  CAST(1 + ({byte_expr(1)} % 64) AS INTEGER) AS height,
  'stub_decoded' AS status
FROM documents"""
