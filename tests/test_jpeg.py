"""Baseline JPEG codec: encode->decode roundtrips (bounded lossy error),
sampling/restart paths, and the decode-fallback contract."""

from __future__ import annotations

import numpy as np
import pytest

from g1_etl_spark.operators import jpeg as J
from g1_etl_spark.operators import multimodal as M


def _gradient(h, w):
    gx = np.linspace(0, 255, w)
    gy = np.linspace(255, 0, h)
    img = np.stack(np.meshgrid(gx, gy), axis=2)
    return np.concatenate([img, img[:, :, :1] * 0.5],
                          axis=2).astype(np.uint8)


def test_solid_color_roundtrips_exactly():
    img = np.full((16, 24, 3), [200, 30, 90], dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert np.array_equal(out, img)


def test_gradient_roundtrip_error_bounded():
    img = _gradient(29, 37)
    out = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8
    assert np.abs(out.astype(int) - img.astype(int)).mean() <= 2.0


def test_grayscale_and_odd_dimensions():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (11, 13), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(g, quality=95))
    assert out.shape == (11, 13, 3)
    # gray expands to 3 identical channels
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean() < 3.0


def test_420_subsampling_and_restart_markers():
    img = _gradient(37, 29)
    out420 = J.decode_jpeg(J.encode_jpeg(img, quality=95, subsample=True))
    assert np.abs(out420.astype(int) - img.astype(int)).mean() < 5.0
    # restart intervals: byte-aligned RSTn markers + DC predictor resets
    blob = J.encode_jpeg(img, quality=95, restart_interval=2)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    outr = J.decode_jpeg(blob)
    assert np.abs(outr.astype(int) - img.astype(int)).mean() < 2.0
    both = J.decode_jpeg(J.encode_jpeg(img, quality=92, subsample=True,
                                       restart_interval=3))
    assert np.abs(both.astype(int) - img.astype(int)).mean() < 6.0


def test_rejects_progressive_oversize_and_corrupt():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    blob = bytearray(J.encode_jpeg(img))
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    sof = bytes(blob).index(b"\xff\xc0")
    prog = bytes(blob[:sof + 1]) + b"\xc2" + bytes(blob[sof + 2:])
    with pytest.raises(ValueError, match="baseline"):
        J.decode_jpeg(prog)
    # header claiming > max_pixels must be refused up front
    import struct
    big = bytearray(J.encode_jpeg(img))
    sof = bytes(big).index(b"\xff\xc0")
    big[sof + 5:sof + 9] = struct.pack(">HH", 4096, 4096)
    with pytest.raises(ValueError, match="pixel"):
        J.decode_jpeg(bytes(big))
    # truncated entropy stream surfaces as ValueError (fallback contract)
    grad = J.encode_jpeg(_gradient(16, 16), quality=95)
    with pytest.raises(ValueError):
        J.decode_jpeg(grad[:len(grad) // 2])
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"\x00\x01")


def test_decode_image_routes_jpeg():
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    out = M.decode_image(J.encode_jpeg(img, quality=95))
    assert np.array_equal(out, img)


def test_corrupt_jpeg_falls_back_to_byte_histogram(spark):
    """One corrupt JPEG blob must degrade that row to the byte path,
    not fail the batch — same contract as corrupt PNG."""
    img = _gradient(16, 16)
    good = J.encode_jpeg(img, quality=95)
    corrupt = good[:len(good) // 2]
    rows = [(0, "image", bytearray(good)),
            (1, "image", bytearray(corrupt))]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary")
    feats = M.extract_features(media)
    got = {r["media_id"]: r["feature_src"] for r in feats.collect()}
    assert got[0] == "pixels"
    assert got[1] == "bytes"


def test_malformed_header_cross_refs_raise_value_error():
    """MJPEG-style tableless streams, zero sampling factors and scans
    that omit a frame component must surface as ValueError (the
    byte-path fallback contract), never KeyError/ZeroDivisionError."""
    import struct

    img = np.full((8, 8, 3), 50, dtype=np.uint8)
    blob = J.encode_jpeg(img)
    # strip every DHT segment (marker 0xFFC4)
    out = bytearray()
    pos = 0
    while pos < len(blob):
        if blob[pos:pos + 2] == b"\xff\xc4":
            ln = struct.unpack_from(">H", blob, pos + 2)[0]
            pos += 2 + ln
            continue
        out.append(blob[pos])
        pos += 1
    with pytest.raises(ValueError, match="huffman"):
        J.decode_jpeg(bytes(out))
    # zero sampling factor in SOF0
    bad = bytearray(blob)
    sof = blob.index(b"\xff\xc0")
    bad[sof + 11] = 0x01  # component 1 samp byte -> hi=0, vi=1
    with pytest.raises(ValueError, match="sampling"):
        J.decode_jpeg(bytes(bad))


def test_fill_bytes_before_marker_are_consumed():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker; the parser must consume them instead of reading a bogus
    segment length from the real marker byte."""
    img = _gradient(16, 16)
    blob = J.encode_jpeg(img, quality=95)
    ref = J.decode_jpeg(blob)
    padded = blob[:2] + b"\xff\xff" + blob[2:]  # fill before first seg
    assert np.array_equal(J.decode_jpeg(padded), ref)


def test_entropy_stream_ending_in_ff_raises_value_error():
    """A lone 0xFF at end-of-data has no stuffing byte; fabricating a
    0x00 would let a truncated stream decode to a corrupt image."""
    br = J._BitReader(b"\x12\xff")
    assert br.bits(8) == 0x12
    with pytest.raises(ValueError, match="truncated"):
        br.bits(8)


def test_truncated_segment_bodies_raise_value_error_not_struct_error():
    """SOF0/DRI/SOS bodies shorter than their declared reads must
    surface as the contract's ValueError, not struct.error/IndexError
    (which would crash a mapInPandas task instead of degrading)."""
    # SOI + SOF0 whose declared length leaves a 1-byte body
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\xff\xd8\xff\xc0\x00\x04\x08")
    # SOI + DRI with an empty body
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\xff\xd8\xff\xdd\x00\x02")


def test_upsample_nn_handles_non_divisor_sampling_ratio():
    """hmax=3 / hi=2 has integer repeat factor 3//2=1 (no upsampling at
    all); the index map must still align: full-res column x reads
    component column floor(x*2/3)."""
    h = w = 6
    pl = np.arange(4 * 4, dtype=float).reshape(4, 4)
    out = J._upsample_nn(pl, 2, 2, 3, 3, h, w)
    assert out.shape == (h, w)
    for y in range(h):
        for x in range(w):
            assert out[y, x] == pl[min(y * 2 // 3, 3), min(x * 2 // 3, 3)]
    # divisor ratio keeps the exact repeat semantics
    out2 = J._upsample_nn(pl, 1, 1, 2, 2, 8, 8)
    assert np.array_equal(out2, np.repeat(np.repeat(pl, 2, 0), 2, 1))
    # equal sampling is a pure crop
    assert np.array_equal(J._upsample_nn(pl, 3, 3, 3, 3, 3, 2),
                          pl[:3, :2])
