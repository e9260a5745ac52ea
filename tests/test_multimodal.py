"""Multimodal decode-kernel dispatch: the stub runs when no codec lib
is importable, an injected/real kernel wins when present, and a corrupt
payload falls back to the stub per row instead of killing the batch."""

import struct
import sys

from pyspark.sql import functions as F

from ontology_loader_spark.operators.multimodal import (
    decode_image_stub,
    decode_payloads,
    resolve_decode_kernel,
)


def tiny_bmp(width=2, height=3) -> bytes:
    """A complete, valid 24-bit BMP (BITMAPINFOHEADER) — small enough
    to inline, real enough for PIL if it ever lands in the image."""
    row = width * 3
    pad = (4 - row % 4) % 4
    pixels = (b"\x7f\x7f\x7f" * width + b"\x00" * pad) * height
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    )
    return header + pixels


def make_bmp_header_kernel():
    """Stand-in 'real' kernel for end-to-end injection: parses the BMP
    header (width/height at offsets 18/22), stub-falls-back otherwise —
    the same contract as the PIL kernel. Built as a closure so
    cloudpickle ships it to executor workers BY VALUE (a test-module
    function would pickle by reference and fail to import there)."""
    import struct as _struct

    from ontology_loader_spark.operators.multimodal import (
        decode_image_stub as _stub,
    )

    def bmp_header_kernel(payload: bytes):
        if payload[:2] == b"BM" and len(payload) >= 26:
            w, h = _struct.unpack_from("<ii", payload, 18)
            return w, abs(h), "decoded"
        return _stub(payload)

    return bmp_header_kernel


def test_resolver_prefers_injected_then_lib_then_stub():
    # explicit injection always wins
    kernel = make_bmp_header_kernel()
    assert resolve_decode_kernel(kernel) is kernel
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    k = resolve_decode_kernel()
    if has_pil:
        # real kernel: decodes the valid BMP, stubs the garbage
        assert k(tiny_bmp(5, 7)) == (5, 7, "decoded")
        assert k(b"\x01\x02garbage")[2] == "stub_decoded"
    else:
        assert k is decode_image_stub


def test_fake_pil_dispatch(monkeypatch):
    """With a PIL lookalike importable, _pil_kernel must pick it up and
    route decode failures to the stub — pinning the dispatch mechanics
    without the real dependency."""
    import io
    import types

    from ontology_loader_spark.operators import multimodal as mm

    class _Img:
        def __init__(self, fh):
            data = fh.read()
            if data[:2] != b"BM":
                raise ValueError("not a BMP")
            self.width, self.height = struct.unpack_from("<ii", data, 18)
            self.height = abs(self.height)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_image = types.ModuleType("PIL.Image")
    fake_image.open = lambda fh: _Img(fh)
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)

    k = mm._pil_kernel()
    assert k is not None
    assert k(tiny_bmp(4, 9)) == (4, 9, "decoded")
    stub_w, stub_h, status = k(b"\x10\x20not-an-image")
    assert status == "stub_decoded"
    assert (stub_w, stub_h) == (1 + 0x10 % 64, 1 + 0x20 % 64)
    assert io  # keep the import honest


def test_decode_payloads_with_injected_kernel_mixed_batch(spark):
    """End-to-end through mapInPandas: a valid BMP decodes 'decoded',
    a garbage payload in the SAME batch stubs — per-row fallback, no
    batch failure, payloads never on the driver."""
    rows = [(1, tiny_bmp(6, 2)), (2, b"\x05\x09* not an image *")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in
           decode_payloads(df, kernel=make_bmp_header_kernel()).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["status"]) == (
        6, 2, "decoded")
    assert got[2]["status"] == "stub_decoded"
    assert (got[2]["width"], got[2]["height"]) == (1 + 5 % 64, 1 + 9 % 64)
    assert got[1]["n_bytes"] == len(tiny_bmp(6, 2))


def test_decode_payloads_default_stub_path(spark):
    """No codec lib in this container: the default path statuses every
    row stub_decoded with the deterministic fake dims (what the driver
    gate pins against the md5 oracle)."""
    docs = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    from ontology_loader_spark.operators.multimodal import with_payload

    out = decode_payloads(with_payload(docs)).collect()
    assert len(out) == 1 and out[0]["n_bytes"] == 16
    try:
        import PIL  # noqa: F401
    except ImportError:
        assert out[0]["status"] == "stub_decoded"
    assert F  # silence linter


def test_truncated_payload_never_kills_the_batch(spark):
    """0- and 1-byte payloads (truncated uploads) must flow through the
    Arrow batch as decode_error rows — total fallback, no IndexError —
    alongside healthy rows in the SAME batch."""
    import ontology_loader_spark.operators.multimodal as mm

    assert mm.decode_image_stub(b"") == (0, 0, "decode_error")
    assert mm.decode_image_stub(b"\x07") == (0, 0, "decode_error")

    rows = [(1, b""), (2, b"\x07"), (3, b"\x10\x20payload")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.decode_payloads(df).collect()}
    assert got[1]["status"] == "decode_error" and got[1]["n_bytes"] == 0
    assert got[2]["status"] == "decode_error" and got[2]["n_bytes"] == 1
    assert got[3]["status"] in ("stub_decoded", "decoded")
