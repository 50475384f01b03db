"""Pure-stdlib PNG codec tests (functions/png.py) — the real-decode
path that closes the multimodal image stub (round-9 VERDICT item 5).

No reference twin exists (the reference has no media surface at all);
parity for the e2e query comes from the dhash oracle replay, which is
unchanged because the PNG round-trip is pixel-lossless.
"""

from __future__ import annotations

import numpy as np
import pytest

from flight_events_flink_job_spark.functions.png import png_decode, png_encode


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "mixed"])
def test_roundtrip_all_filters(filter_type):
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (5, 9), (40, 9), (17, 3), (64, 64)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (png_decode(png_encode(img, filter_type)) == img).all()


def test_roundtrip_gradient_and_constant():
    grad = (np.arange(81).reshape(9, 9) % 256).astype(np.uint8)
    assert (png_decode(png_encode(grad, "mixed")) == grad).all()
    flat = np.full((12, 9), 200, dtype=np.uint8)
    assert (png_decode(png_encode(flat, 4)) == flat).all()


def test_crc_corruption_raises():
    img = np.zeros((9, 9), dtype=np.uint8)
    b = bytearray(png_encode(img, 0))
    b[50] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(b))


def test_bad_signature_and_truncation_raise():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF not a png")
    good = png_encode(np.zeros((3, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        png_decode(good[:20])


def test_non_grayscale_profile_is_declared_stub():
    """A color-type-2 (truecolor) header must raise NotImplementedError
    — the remaining, clearly-declared environment stub."""
    import struct
    from binascii import crc32

    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError, match="color type 2"):
        png_decode(b"\x89PNG\r\n\x1a\n" + chunk)


def test_encoder_rejects_bad_shapes():
    with pytest.raises(ValueError):
        png_encode(np.zeros((3, 3, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        png_encode(np.zeros((0, 5), dtype=np.uint8))
