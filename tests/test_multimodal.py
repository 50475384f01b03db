"""Multimodal binary-column plumbing: schema, batching, determinism."""

from __future__ import annotations

import pytest

from flight_events_flink_job_spark.operators.multimodal import (
    CHECKSUM_MOD,
    decode_image,
    media_features,
    multimodal_features,
    with_binary_payload,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "hello world", "en", "s0", 11),
        (1, "abc", "en", "s1", 3),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])


def test_payload_is_binary_with_meta(docs):
    media = with_binary_payload(docs)
    dtypes = dict(media.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["meta"].startswith("struct<mime:string")
    row = media.filter("doc_id = 1").collect()[0]
    assert bytes(row.payload) == b"abc"
    assert row.meta.mime == "text/plain"


def test_features_match_python_truth(docs):
    out = {r.doc_id: r for r in multimodal_features(docs).collect()}
    for doc_id, text in [(0, b"hello world"), (1, b"abc")]:
        r = out[doc_id]
        assert r.byte_len == len(text)
        assert r.checksum == sum(text) % CHECKSUM_MOD
        assert r.head_hex == text[:4].hex()
        assert r.mime == "text/plain"


def test_features_survive_repartition(docs):
    """mapInPandas output must be partition-invariant (pure per-row)."""
    a = sorted(map(tuple, multimodal_features(docs).collect()))
    b = sorted(map(tuple, media_features(with_binary_payload(docs).repartition(7))
                   .select("doc_id", "mime", "byte_len", "checksum", "head_hex")
                   .collect()))
    assert a == b


def test_decode_stub_raises(docs):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_resize_thumbnail_exact(spark):
    from flight_events_flink_job_spark.operators.multimodal import (
        resize_thumbnails,
    )

    # 8x4 "image": rows of constant 0,8,16,24 -> 2x2 block means
    payload = bytes(
        [0] * 8 + [8] * 8 + [16] * 8 + [24] * 8
    )
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = resize_thumbnails(media).collect()[0]
    assert (row.width, row.height) == (8, 4)
    assert row.thumb == [4, 4, 20, 20]  # means of 2x4-byte blocks
    assert abs(row.mean_pixel - 12.0) < 1e-9


def test_sample_frames_every_nth(spark):
    from flight_events_flink_job_spark.operators.multimodal import sample_frames

    payload = bytes(range(256)) * 2  # 512 bytes = 8 frames of 64
    media = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = sample_frames(media).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 4]
    assert rows[0].frame_checksum == sum(payload[:64]) % 997
    assert rows[1].frame_checksum == sum(payload[256:320]) % 997


def test_audio_waveform_stats_int16_semantics(spark):
    import math
    import struct

    from flight_events_flink_job_spark.operators.multimodal import (
        audio_waveform_stats,
    )

    samples = [1000, -2000, 32767, -32768, 0]
    payload = struct.pack("<5h", *samples) + b"\x01"  # odd tail dropped
    media = spark.createDataFrame(
        [(3, bytearray(payload)), (4, bytearray(b"\x01"))],  # doc 4: <2 bytes
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in audio_waveform_stats(media).collect()}
    assert set(rows) == {3}  # sub-sample payload yields no row
    r = rows[3]
    assert r.n_samples == 5
    assert r.peak == 32768  # |-32768|: the int16 asymmetric extreme
    want = math.sqrt(sum(s * s for s in samples) / 5)
    assert r.rms == want  # deterministic IEEE value, no rounding


def test_image_dhash_detects_near_identical_payloads(spark):
    """Two payloads differing by one byte must have near-zero Hamming
    distance between dhashes; unrelated payloads should differ in many
    bits. A gradient payload exercises both bit polarities."""
    from flight_events_flink_job_spark.operators.multimodal import (
        image_dhash,
        with_binary_payload,
    )

    base = "".join(chr(97 + (i * 7) % 26) for i in range(9 * 16))
    tweaked = "z" + base[1:]
    unrelated = "".join(chr(97 + (25 - (i * 11) % 26)) for i in range(9 * 16))
    docs = spark.createDataFrame(
        [
            (1, base, "en", "s", len(base)),
            (2, tweaked, "en", "s", len(tweaked)),
            (3, unrelated, "en", "s", len(unrelated)),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    h = {r.doc_id: r.dhash for r in image_dhash(with_binary_payload(docs)).collect()}
    assert all(0 <= v < (1 << 63) for v in h.values())
    near = bin(h[1] ^ h[2]).count("1")
    far = bin(h[1] ^ h[3]).count("1")
    assert near <= 8
    assert far > near


def test_image_dhash_pairs_complete_and_thresholded(spark, sf_dir):
    """Exact duplicate payloads must pair at hamming 0 (pigeonhole
    completeness floor), every emitted pair verifies <= 3, and the
    pair set matches a brute-force popcount over all fingerprints."""
    from flight_events_flink_job_spark.operators.multimodal import (
        image_dhash,
        image_dhash_pairs,
        with_binary_payload,
    )
    from flight_events_flink_job_spark.sources.fixtures import load_table

    media = with_binary_payload(load_table(spark, sf_dir, "documents"))
    pairs = {
        (r.doc_a, r.doc_b): r.hamming for r in image_dhash_pairs(media).collect()
    }
    assert all(0 <= h <= 3 for h in pairs.values())
    fps = {r.doc_id: r.dhash for r in image_dhash(media).collect()}
    brute = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                brute[(a, b)] = h
    assert pairs == brute
    assert brute, "fixture should contain at least one near-identical pair"


def test_png_real_decode_dhash_equals_byte_math(spark, sf_dir):
    """REAL PNG decode end-to-end (round-9 VERDICT item 5): encoding
    the text-byte pixel grid as an actual PNG (mixed scanline filters)
    and fingerprinting through decode_image must reproduce the
    byte-math dhash exactly — the codec round-trip is lossless, so the
    existing oracle covers the real-decode path."""
    from flight_events_flink_job_spark.operators.multimodal import (
        image_dhash,
        image_dhash_decoded,
        png_media,
        with_binary_payload,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, image_dhash(with_binary_payload(docs)).collect()))
    b = sorted(map(tuple, image_dhash_decoded(png_media(docs)).collect()))
    assert a == b and len(a) > 0


def test_decode_image_png_is_real_and_jpeg_still_stub():
    """decode_image now genuinely decodes baseline grayscale PNG
    (stdlib zlib path) and still raises the declared stub error for
    non-PNG payloads (JPEG-class codecs absent)."""
    import numpy as np
    import pytest as _pytest

    from flight_events_flink_job_spark.functions.png import png_encode
    from flight_events_flink_job_spark.operators.multimodal import decode_image

    img = (np.arange(90).reshape(10, 9) % 256).astype(np.uint8)
    assert (decode_image(png_encode(img, "mixed")) == img).all()
    with _pytest.raises(NotImplementedError, match="non-PNG"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg header")
