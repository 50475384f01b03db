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


@pytest.mark.parametrize("channels", [3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "mixed"])
def test_roundtrip_color(channels, filter_type):
    """RGB (color type 2) and RGBA (type 6) round-trip through every
    filter — the multi-byte-pixel filters' left neighbor is bpp bytes
    back, which only a color round-trip exercises (round-10 VERDICT
    item 4)."""
    rng = np.random.default_rng(11)
    for shape in [(1, 1), (9, 9), (23, 5), (8, 40)]:
        img = rng.integers(0, 256, size=(*shape, channels), dtype=np.uint8)
        out = png_decode(png_encode(img, filter_type))
        assert out.shape == img.shape
        assert (out == img).all()


def test_unimplemented_profile_is_declared_stub():
    """Gray+alpha (type 4) and 16-bit depth must still raise
    NotImplementedError — the remaining, clearly-declared environment
    stub (grayscale/palette/RGB/RGBA at depth 8 are now real)."""
    import struct
    from binascii import crc32

    for depth, color, pat in [(8, 4, "color type 4"), (16, 0, "bit depth 16")]:
        ihdr = struct.pack(">IIBBBBB", 3, 3, depth, color, 0, 0, 0)
        chunk = (
            struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        with pytest.raises(NotImplementedError, match=pat):
            png_decode(b"\x89PNG\r\n\x1a\n" + chunk)


def test_encoder_rejects_bad_shapes():
    with pytest.raises(ValueError):
        png_encode(np.zeros((3, 3, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        png_encode(np.zeros((0, 5), dtype=np.uint8))
    with pytest.raises(ValueError):
        png_encode(np.zeros((2, 0, 3), dtype=np.uint8))


def test_corrupt_ihdr_and_idat_raise_valueerror():
    """Round-10 ADVICE item 4: a 10-byte IHDR body or an
    undecompressable IDAT must surface as the documented ValueError,
    never a bare struct.error/zlib.error escaping the worker."""
    import struct
    from binascii import crc32

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", crc32(tag + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    with pytest.raises(ValueError, match="IHDR"):
        png_decode(sig + chunk(b"IHDR", b"\x00" * 10))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="inflate"):
        png_decode(
            sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"junk") + chunk(b"IEND", b"")
        )


def test_luminance_is_integer_bt601():
    """The color->gray fold the RGB dhash oracle replays: exact integer
    (299R+587G+114B)//1000, alpha ignored."""
    from flight_events_flink_job_spark.operators.multimodal import luminance

    rgb = np.array([[[255, 0, 0], [0, 255, 0]]], dtype=np.uint8)
    assert luminance(rgb).tolist() == [[255 * 299 // 1000, 255 * 587 // 1000]]
    rgba = np.dstack([rgb, np.full((1, 2, 1), 7, dtype=np.uint8)])
    assert (luminance(rgba) == luminance(rgb)).all()
    gray = np.arange(4, dtype=np.uint8).reshape(2, 2)
    assert luminance(gray) is gray


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "mixed"])
def test_roundtrip_palette(filter_type):
    """Indexed color (type 3): encode writes PLTE + index scanlines,
    decode unfilters the indices and expands through the palette —
    the result must equal palette[indices] exactly."""
    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
    for shape in [(1, 1), (9, 9), (30, 7)]:
        idx = rng.integers(0, 17, size=shape, dtype=np.uint8)
        out = png_decode(png_encode(idx, filter_type, palette=pal))
        assert out.shape == (*shape, 3)
        assert (out == pal[idx]).all()


def test_palette_error_surface():
    import struct
    from binascii import crc32

    rng = np.random.default_rng(29)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    # encoder rejects out-of-palette indices and bad palette shapes
    with pytest.raises(ValueError, match="outside"):
        png_encode(np.full((2, 2), 9, dtype=np.uint8), 0, palette=pal)
    with pytest.raises(ValueError, match="palette"):
        png_encode(np.zeros((2, 2), dtype=np.uint8), 0, palette=pal[:, :2])
    with pytest.raises(ValueError, match="2-D"):
        png_encode(np.zeros((2, 2, 3), dtype=np.uint8), 0, palette=pal)
    # decoder: type-3 stream whose PLTE was stripped must fail loud
    good = bytearray(png_encode(np.zeros((3, 3), dtype=np.uint8), 0, palette=pal))
    out = bytearray()
    pos = 8
    out += good[:8]
    while pos < len(good):
        (length,) = struct.unpack(">I", good[pos : pos + 4])
        tag = bytes(good[pos + 4 : pos + 8])
        if tag != b"PLTE":
            out += good[pos : pos + 12 + length]
        pos += 12 + length
    with pytest.raises(ValueError, match="PLTE"):
        png_decode(bytes(out))
    # tRNS is the declared stub
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", crc32(tag + body) & 0xFFFFFFFF)
        )

    with_trns = (
        bytes(good[: len(good) - len(chunk(b"IEND", b""))])
        + chunk(b"tRNS", b"\x80")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="tRNS"):
        png_decode(with_trns)


def test_plte_placement_error_surface():
    """Round-11 ADVICE item 3: spec-invalid PLTE placements must fail
    loud with the same ValueError surface as the other corrupt-chunk
    paths — duplicate PLTE, PLTE on a grayscale stream, PLTE before
    IHDR."""
    import struct
    from binascii import crc32

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", crc32(tag + body) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    good = png_encode(np.zeros((3, 3), dtype=np.uint8), 0, palette=pal)
    iend = chunk(b"IEND", b"")
    plte = chunk(b"PLTE", pal.tobytes())
    # duplicate PLTE (second one used to win silently)
    dup = good[: len(good) - len(iend)] + plte + iend
    with pytest.raises(ValueError, match="duplicate"):
        png_decode(dup)
    # PLTE on a grayscale (type 0) stream is forbidden by the spec
    gray = png_encode(np.zeros((2, 2), dtype=np.uint8), 0)
    gplte = gray[: len(gray) - len(iend)] + plte + iend
    with pytest.raises(ValueError, match="grayscale"):
        png_decode(gplte)
    # PLTE before IHDR
    sig = good[:8]
    with pytest.raises(ValueError, match="before IHDR"):
        png_decode(sig + plte + good[8:])
