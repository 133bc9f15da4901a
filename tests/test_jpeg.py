"""Baseline JPEG codec tests (sources/jpeg.py).

The roundtrip tests share the module's encoder, so a matched
encoder/decoder bug could in principle hide there; the
``test_decode_hand_built_bitstream`` case breaks that circularity by
assembling a JPEG byte-by-byte from the T.81 spec (canonical Huffman
codes computed in the test itself) and asserting the decoded pixels.
"""

import numpy as np
import pytest

from spark_tsne_spark.sources.jpeg import (
    AC_LUMA,
    DC_LUMA,
    make_jpeg,
    parse_jpeg,
)


def test_decode_hand_built_bitstream():
    """8×8 flat image, value 130, quant all-ones, hand-assembled.

    DC = 8·(130−128) = 16 → category 5; Annex-K DC-luma canonical
    codes put category 5 at ``110``; 16 encodes as ``10000``.
    EOB (AC symbol 0x00) is the 4-bit code ``1010``. 12 data bits +
    four 1-padding bits = 0xD0 0xAF.
    """
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
    out += (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    )
    for cls, (bits, vals) in ((0, DC_LUMA), (1, AC_LUMA)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (2 + len(body)).to_bytes(2, "big") + body
    out += b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0, 0, 63, 0])
    out += bytes([0xD0, 0xAF])
    out += b"\xff\xd9"
    dec = parse_jpeg(bytes(out))
    assert dec is not None and dec.shape == (8, 8)
    assert (dec == 130).all()


def test_gray_flat_tiles_roundtrip_exact():
    """Flat 8×8 tiles have a single integer DC coefficient, so with
    unit quantization the codec must be bit-exact."""
    rng = np.random.default_rng(7)
    tiles = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
    dec = parse_jpeg(make_jpeg(img))
    assert dec is not None and (dec == img).all()


def test_gray_nonmultiple_dims_flat_tiles_exact():
    """Edge padding replicates, so flat tiles stay flat and the
    cropped decode is still exact on non-multiple-of-8 dims."""
    tiles = np.array([[10, 200], [250, 3]], dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:11, :13]
    dec = parse_jpeg(make_jpeg(img))
    assert dec is not None and dec.shape == (11, 13) and (dec == img).all()


def test_gray_arbitrary_image_near_lossless():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    dec = parse_jpeg(make_jpeg(img))
    err = np.abs(dec.astype(int) - img.astype(int)).max()
    # unit quantization: only DCT float rounding survives
    assert err <= 2


def test_quantization_actually_lossy_and_bounded():
    """A non-trivial quant table must round-trip within half a
    quantization step per coefficient (error ≤ Σq/2 spread over the
    block — use the scalar bound per pixel)."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    q = np.full(64, 16, dtype=np.int64)
    dec = parse_jpeg(make_jpeg(img, quant=q))
    err = np.abs(dec.astype(int) - img.astype(int)).max()
    assert 0 < err <= 64  # lossy, but bounded by the quant step


def test_color_444_gray_pixels_exact():
    """R=G=B pixels map to (Y=v, Cb=Cr=128) exactly, so the color
    pipeline (convert → encode → decode → convert back) is exact."""
    rng = np.random.default_rng(3)
    tiles = rng.integers(0, 256, (2, 4), dtype=np.uint8)
    g = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
    img = np.stack([g, g, g], axis=-1)
    dec = parse_jpeg(make_jpeg(img))
    assert dec is not None and dec.shape == img.shape and (dec == img).all()


def test_color_420_subsampled_flat_tiles_exact():
    """4:2:0: flat 16×16 tiles survive the 2×2 chroma box filter
    unchanged, so the subsampled path must also be exact."""
    rng = np.random.default_rng(5)
    tiles = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    g = np.repeat(np.repeat(tiles, 16, 0), 16, 1)
    img = np.stack([g, g, g], axis=-1)
    buf = make_jpeg(img, subsample=True)
    dec = parse_jpeg(buf)
    assert dec is not None and (dec == img).all()
    # the stream really is subsampled: fewer chroma blocks → smaller
    assert len(buf) < len(make_jpeg(img))


def test_color_420_blockconstant_rgb_bounded():
    """Colors constant per 2×2 pixel block make the 4:2:0 box filter
    exact, so only DCT and YCbCr integer rounding survive — a tight
    bound that still exercises non-flat multi-coefficient blocks.
    (On fully random RGB, out-of-gamut clipping after chroma
    decimation legitimately shifts pixels much further — that's codec
    behavior, not a bug.)"""
    rng = np.random.default_rng(17)
    small = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(small, 2, 0), 2, 1)
    dec = parse_jpeg(make_jpeg(img, subsample=True))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_total_over_arbitrary_bytes():
    rng = np.random.default_rng(23)
    for n in (0, 1, 2, 3, 17, 256, 4096):
        assert parse_jpeg(bytes(rng.integers(0, 256, n, dtype=np.uint8))) is None
    # SOI followed by garbage
    assert parse_jpeg(b"\xff\xd8" + bytes(rng.integers(0, 256, 64, dtype=np.uint8))) is None


def test_truncation_total():
    """Every prefix either fails cleanly (None) or — when only the
    padding/EOI tail is missing, which real decoders tolerate —
    decodes to exactly the right pixels. Never an exception, never
    garbage."""
    img = np.full((16, 16), 99, dtype=np.uint8)
    buf = make_jpeg(img)
    for k in range(0, len(buf) - 1):
        dec = parse_jpeg(buf[:k])
        assert dec is None or (dec.shape == (16, 16) and (dec == img).all())


def test_progressive_marker_rejected():
    img = np.full((8, 8), 50, dtype=np.uint8)
    buf = bytearray(make_jpeg(img))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    assert parse_jpeg(bytes(buf)) is None


def test_restart_markers_roundtrip():
    """DRI/RSTn path: insert a restart interval by hand-splicing DRI
    into an encoded stream is fragile; instead decode a stream the
    encoder produced and verify the decoder's DRI branch with a
    synthetic two-MCU stream built from two single-MCU encodes."""
    # build a 2-MCU-wide image, encode normally (no DRI) as control
    tiles = np.array([[60, 190]], dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
    control = parse_jpeg(make_jpeg(img))
    assert (control == img).all()
    # now splice: take the two MCUs' entropy data from separate
    # single-block encodes (each byte-aligned after flush), join with
    # an RST0 marker, and declare DRI=1
    left = make_jpeg(img[:, :8])
    right = make_jpeg(img[:, 8:])

    def entropy(buf: bytes) -> bytes:
        i = buf.find(b"\xff\xda")
        ln = (buf[i + 2] << 8) | buf[i + 3]
        return buf[i + 2 + ln : -2]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
    out += b"\xff\xdd" + (4).to_bytes(2, "big") + (1).to_bytes(2, "big")
    out += (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + bytes([8, 0, 8, 0, 16, 1, 1, 0x11, 0])
    )
    for cls, (bits, vals) in ((0, DC_LUMA), (1, AC_LUMA)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (2 + len(body)).to_bytes(2, "big") + body
    out += b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0, 0, 63, 0])
    out += entropy(left) + b"\xff\xd0" + entropy(right)
    out += b"\xff\xd9"
    dec = parse_jpeg(bytes(out))
    assert dec is not None and dec.shape == (8, 16)
    assert (dec == img).all()


def test_decoder_in_image_chain(spark):
    """extract_features routes JPEG payloads through the real decoder
    (histogram), not the stub."""
    from spark_tsne_spark.sources.multimodal import extract_features

    tiles = np.array([[0, 16], [32, 255]], dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
    media = spark.createDataFrame(
        [(1, bytearray(make_jpeg(img)))], "media_id long, payload binary"
    )
    feats = extract_features(media, dim=16).collect()[0]["features"]
    counts = np.round(np.array(feats) * img.size).astype(int)
    want = np.bincount((tiles.ravel().astype(int) * 16) // 256, minlength=16) * 64
    assert (counts == want).all()
