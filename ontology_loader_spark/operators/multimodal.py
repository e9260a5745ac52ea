"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

Kernel dispatch (``resolve_decode_kernel``): an injected kernel wins,
else a PIL-backed real decoder when the optional dependency imports
(resolved lazily inside the executor Python worker), else the
deterministic STUB — ``decode_image_stub`` derives fake dimensions
from the payload bytes, statused ``stub_decoded`` so downstream can
tell. The real kernel falls back to the stub per payload on decode
failure, so one corrupt blob never kills an Arrow batch. (This
container ships no codec libs, so the stub path is what the gates
exercise; the dispatch itself is test-pinned with a fake PIL.)
Everything around the kernel — the binary
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


def decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """STUB decode kernel. Production uses the PIL-backed kernel below
    when the library is present; this deterministic fallback derives
    fake dims from the first two payload bytes (clearly statused).

    Total over ALL byte strings: a truncated 0/1-byte payload — which
    every real codec would reject — yields (0, 0, 'decode_error')
    instead of raising, so the fallback path can never kill an Arrow
    batch."""
    if len(payload) < 2:
        return 0, 0, "decode_error"
    width = 1 + (payload[0] % 64)
    height = 1 + (payload[1] % 64)
    return width, height, "stub_decoded"


def _pil_kernel():
    """A real decode kernel backed by PIL, or None when the optional
    dependency is absent. Resolved lazily INSIDE the executor's Python
    worker (not at driver closure-capture time), so a heterogeneous
    cluster degrades per-executor instead of failing the job."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None

    def decode(payload: bytes) -> tuple[int, int, str]:
        try:
            with Image.open(io.BytesIO(payload)) as im:
                return im.width, im.height, "decoded"
        except Exception:
            # not a decodable image — fall through to the stub so one
            # corrupt payload never kills an Arrow batch
            return decode_image_stub(payload)

    return decode


def resolve_decode_kernel(kernel=None):
    """Kernel dispatch: an explicitly-injected kernel wins (tests /
    custom codecs), else PIL if importable, else the stub."""
    return kernel or _pil_kernel() or decode_image_stub


def decode_payloads(documents_with_payload: DataFrame, kernel=None) -> DataFrame:
    """Arrow-batched decode: (doc_id, payload binary) → typed metadata
    (n_bytes, width, height, status — status records which kernel
    decoded the row).

    Batches iterate columnar; the kernel touches bytes only inside the
    executor Python worker, and kernel resolution happens there too."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = resolve_decode_kernel(kernel)
        for pdf in batches:
            n_bytes, widths, heights, statuses = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                w, h, status = k(raw)
                n_bytes.append(len(raw))
                widths.append(w)
                heights.append(h)
                statuses.append(status)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.Series(n_bytes, dtype="int32"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "status": pd.Series(statuses, dtype="object"),
                }
            )

    return documents_with_payload.mapInPandas(run, schema=DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_value", IntegerType(), False),
    ]
)


def sample_frames(documents_with_payload: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling plumbing (video stand-in): emit every ``every_n``-th
    frame of the payload stream as its own row. Here one payload byte
    stands in for one frame; production swaps the kernel body for pyav
    keyframe iteration — the Spark shape (binary in, exploded
    frame-rows out, fan-out inside the Arrow batch, payloads never on
    the driver) is exactly the real one. Output
    (doc_id, frame_idx, frame_value)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, vals = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(0, len(raw), every_n):
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    vals.append(raw[i])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_value": pd.Series(vals, dtype="int32"),
                }
            )

    return documents_with_payload.mapInPandas(run, schema=FRAME_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("mean_byte", IntegerType(), False),
        StructField("max_byte", IntegerType(), False),
    ]
)


def extract_payload_features(documents_with_payload: DataFrame) -> DataFrame:
    """Feature-extraction plumbing: per-payload scalar features (here:
    floor-mean and max byte — production: embedding model / spectral
    stats in the same Arrow slot). Output (doc_id, mean_byte,
    max_byte)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, maxs = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                means.append(sum(raw) // len(raw))
                maxs.append(max(raw))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mean_byte": pd.Series(means, dtype="int32"),
                    "max_byte": pd.Series(maxs, dtype="int32"),
                }
            )

    return documents_with_payload.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_TARGET = 32


def resize_plan(decoded: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Aspect-preserving resize planning over decoded metadata — pure
    integer Catalyst arithmetic (the pixel resample itself belongs in
    the decode kernel's Arrow slot; the *plan* — target dims per image
    — is what the distributed pipeline schedules on). Output
    (doc_id, width, height, out_w, out_h)."""
    w, h = F.col("width"), F.col("height")
    long_side = F.greatest(w, h)
    out_w = F.greatest(F.lit(1), F.floor(w * target / long_side)).cast("int")
    out_h = F.greatest(F.lit(1), F.floor(h * target / long_side)).cast("int")
    return decoded.select("doc_id", "width", "height",
                          out_w.alias("out_w"), out_h.alias("out_h"))


def _md5_byte_sql(k: int) -> str:
    hi = f"(instr('0123456789abcdef', substr(md5(text), {2 * k + 1}, 1)) - 1)"
    lo = f"(instr('0123456789abcdef', substr(md5(text), {2 * k + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


def sample_frames_sql(every_n: int = 4) -> str:
    selects = []
    for i in range(0, 16, every_n):
        selects.append(
            f"SELECT doc_id, CAST({i} AS INTEGER) AS frame_idx, "
            f"CAST({_md5_byte_sql(i)} AS INTEGER) AS frame_value FROM documents"
        )
    return "\nUNION ALL\n".join(selects)


def extract_payload_features_sql() -> str:
    total = " + ".join(_md5_byte_sql(k) for k in range(16))
    mx = "GREATEST(" + ", ".join(_md5_byte_sql(k) for k in range(16)) + ")"
    return f"""
SELECT doc_id,
  CAST(FLOOR(CAST({total} AS DOUBLE) / 16) AS INTEGER) AS mean_byte,
  CAST({mx} AS INTEGER) AS max_byte
FROM documents"""


def resize_plan_sql(target: int = RESIZE_TARGET) -> str:
    w = f"CAST(1 + ({_md5_byte_sql(0)} % 64) AS INTEGER)"
    h = f"CAST(1 + ({_md5_byte_sql(1)} % 64) AS INTEGER)"
    return f"""
WITH decoded AS (SELECT doc_id, {w} AS width, {h} AS height FROM documents)
SELECT doc_id, width, height,
  CAST(GREATEST(1, FLOOR(width * {target} / GREATEST(width, height))) AS INTEGER) AS out_w,
  CAST(GREATEST(1, FLOOR(height * {target} / GREATEST(width, height))) AS INTEGER) AS out_h
FROM decoded"""


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
