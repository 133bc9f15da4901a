"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` passes.

Decode support: **netpbm (P5 PGM / P6 PPM) and non-interlaced 8-bit
gray/RGB PNG images decode for real** — pure numpy + stdlib parsers
(`parse_netpbm`, `parse_png`; PNG is IDAT zlib-inflate + a
per-scanline unfilter pass) with no codec dependency — so both an
uncompressed and a genuinely compressed image format are exercised
end-to-end (container walk → pixel grid → resample / histogram
features). **Baseline JPEG also decodes for real** — a full T.81
Huffman decoder with 4:2:0 support in `sources/jpeg.py`
(`parse_jpeg`), pure numpy + stdlib. Audio covers PCM16, G.711
μ-law, and IMA ADPCM (format 0x11 — a real 4-bit adaptive-delta
codec, sequential block decode). Only ffmpeg-class codecs
(MP3/AAC/H.264) remain STUBBED (`_decode_stub`); a production
deployment swaps that for an ffmpeg call without touching the plan.

Scale notes: binary payloads stay columnar through Arrow; per-batch
numpy work avoids per-row Python. Feature extraction is a narrow map
(no shuffle); downstream dedup/similarity reuse the embedding
operators unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def pgm_payload(text_col, width: int, height: int):
    """Column expression: a real binary P5 PGM image whose pixel grid
    is the first ``width*height`` bytes of an ASCII text column
    (zero-padded / truncated). Pure JVM-side (encode + rpad + concat),
    so catalog queries can land genuine netpbm payloads from the
    `documents` table and the DuckDB oracle can recompute every pixel
    from the same text."""
    header = F.encode(F.lit(f"P5\n{width} {height}\n255\n"), "UTF-8")
    # rpad counts CHARACTERS while the raster needs BYTES — any
    # non-ASCII char would silently misalign every following pixel
    # (and diverge from the per-character DuckDB oracle). Strip
    # non-ASCII up front so the chars==bytes assumption is enforced,
    # not hoped for; oracle SQL mirrors the same strip.
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    ascii_only = F.regexp_replace(col, "[^\\x00-\\x7F]", "")
    body = F.encode(F.rpad(ascii_only, width * height, "\x00"), "UTF-8")
    return F.concat(header, body)


def pgm_stream_payload(text_col, width: int, height: int, n_frames: int):
    """Column expression: a concatenated-netpbm 'video' — ``n_frames``
    binary P5 frames back to back, frame f's pixels taken from the
    text's bytes at offset ``f·width·height`` (zero-padded). Pure JVM;
    the DuckDB oracle recomputes every pixel of every frame from the
    same text (non-ASCII stripped first, as in :func:`pgm_payload`).
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    ascii_only = F.regexp_replace(col, "[^\\x00-\\x7F]", "")
    header = F.encode(F.lit(f"P5\n{width} {height}\n255\n"), "UTF-8")
    size = width * height
    parts = []
    for f in range(n_frames):
        body = F.encode(
            F.rpad(F.substring(ascii_only, f * size + 1, size), size, "\x00"),
            "UTF-8",
        )
        parts.extend([header, body])
    return F.concat(*parts)


def parse_netpbm(payload: bytes) -> np.ndarray | None:
    """Pure-numpy decoder for binary netpbm images: P5 (grayscale PGM)
    and P6 (RGB PPM, averaged to grayscale). Returns a ``(h, w)``
    uint8 grid, or ``None`` when the payload is not a binary netpbm
    (caller falls back to the stub). Truncated rasters are zero-padded
    (deterministic, mirrors the raw-grid stub's padding).

    Header grammar (netpbm spec): magic, then three ASCII decimal
    tokens (width, height, maxval) separated by whitespace, ``#``
    comments running to end-of-line allowed, a single whitespace byte,
    then the raw raster. Only maxval <= 255 (1-byte samples) is
    supported — the common case; 2-byte-sample images fall back.
    """
    parsed = _parse_netpbm_header(payload, 0)
    if parsed is None:
        return None
    w, h, ch, pos = parsed
    n = len(payload)
    need = w * h * ch
    buf = np.frombuffer(payload, dtype=np.uint8, count=max(0, min(need, n - pos)), offset=pos)
    if buf.size < need:
        buf = np.pad(buf, (0, need - buf.size))
    if ch == 3:
        rgb = buf.reshape(h, w, 3).astype(np.uint16)
        return (rgb.sum(axis=2) // 3).astype(np.uint8)
    return buf.reshape(h, w)


def _parse_netpbm_header(payload: bytes, at: int) -> tuple[int, int, int, int] | None:
    """Parse one binary-netpbm header starting at offset ``at``.

    Returns ``(width, height, channels, raster_offset)`` or ``None``
    for anything malformed (bad magic, non-numeric tokens, header
    ending at end-of-payload, maxval > 255).
    """
    magic = payload[at : at + 2]
    if magic not in (b"P5", b"P6"):
        return None
    pos, toks = at + 2, []
    n = len(payload)
    try:
        while len(toks) < 3:
            while pos < n and payload[pos : pos + 1].isspace():
                pos += 1
            if pos < n and payload[pos : pos + 1] == b"#":
                while pos < n and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < n and not payload[pos : pos + 1].isspace():
                pos += 1
            toks.append(int(payload[start:pos]))
        pos += 1  # the single whitespace byte before the raster
    except (ValueError, IndexError):
        return None
    w, h, maxval = toks
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        return None
    if pos > n:
        # Header tokens ended exactly at end-of-payload (no raster, no
        # trailing whitespace byte) — malformed; fall back like any
        # other truncated input instead of letting frombuffer throw.
        return None
    return w, h, (3 if magic == b"P6" else 1), pos


def split_netpbm_stream(payload: bytes) -> list[bytes]:
    """Split a concatenated-netpbm stream (frames back to back — the
    multi-frame 'video' container here) into standalone frame
    binaries. Returns ``[]`` when the payload does not start with a
    netpbm frame; a truncated final raster yields a final short frame
    (the frame decoder zero-pads it). Total — never raises.
    """
    frames: list[bytes] = []
    pos, n = 0, len(payload)
    while pos < n:
        parsed = _parse_netpbm_header(payload, pos)
        if parsed is None:
            break
        w, h, ch, raster = parsed
        end = min(n, raster + w * h * ch)
        frames.append(payload[pos:end])
        pos = end
    return frames


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png(payload: bytes) -> np.ndarray | None:
    """Pure numpy + stdlib-zlib decoder for non-interlaced 8-bit PNG,
    color types 0 (grayscale) and 2 (RGB, averaged to grayscale like
    the P6 path). Returns a ``(h, w)`` uint8 grid, or ``None`` for
    anything else (other color types / bit depths / interlace, bad
    signature, truncated chunks, corrupt deflate stream) — the caller
    falls back to the stub. Total over arbitrary bytes, never raises.

    Decode = chunk walk (IHDR → IDAT* → IEND, unknown ancillary
    chunks skipped, CRCs not validated — pixel correctness is checked
    against the SQL oracle instead), one ``zlib.decompress`` over the
    concatenated IDAT bodies, then the per-scanline unfilter pass.
    Filters None/Sub/Up are fully vectorized (Sub is a cumulative sum
    over the per-channel stride); Average/Paeth carry a true
    left-neighbor recurrence, so those rows fall back to a per-byte
    loop.
    """
    import zlib

    n = len(payload)
    if not payload.startswith(PNG_SIG):
        return None
    pos = 8
    ihdr: bytes | None = None
    idat: list[bytes] = []
    while pos + 8 <= n:
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            return None
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + body + CRC
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color, comp, filt_method, interlace = ihdr[8:13]
    if (
        w <= 0 or h <= 0 or bit_depth != 8 or color not in (0, 2)
        or comp != 0 or filt_method != 0 or interlace != 0
    ):
        return None
    ch = 3 if color == 2 else 1
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (1 + stride):
        return None
    arr = np.frombuffer(
        raw, dtype=np.uint8, count=h * (1 + stride)
    ).reshape(h, 1 + stride)
    ftypes = arr[:, 0]
    data = arr[:, 1:].astype(np.int32)
    recon = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = ch
    for y in range(h):
        f = int(ftypes[y])
        row = data[y]
        if f == 0:
            cur = row % 256
        elif f == 1:  # Sub: recon[x] = row[x] + recon[x-bpp]
            cur = (np.cumsum(row.reshape(w, bpp), axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f == 3:  # Average — left-recurrence, per-byte
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth — left-recurrence, per-byte
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (row[x] + pred) % 256
        else:
            return None
        recon[y] = cur.astype(np.uint8)
        prev = cur.astype(np.int32)
    if ch == 3:
        rgb = recon.reshape(h, w, 3).astype(np.uint16)
        return (rgb.sum(axis=2) // 3).astype(np.uint8)
    return recon.reshape(h, w)


def make_png(img: np.ndarray, filter_cycle: bool = True) -> bytes:
    """Encode a uint8 grid — ``(h, w)`` grayscale or ``(h, w, 3)``
    RGB — as a real non-interlaced 8-bit PNG. ``filter_cycle=True``
    assigns scanline y filter type ``y % 5``, deliberately exercising
    every unfilter path (None/Sub/Up/Average/Paeth) in one image;
    ``False`` writes filter 0 everywhere. Used by tests and catalog
    queries to land genuine deflate-compressed payloads whose pixel
    grid the SQL oracle can recompute independently.
    """
    import struct
    import zlib

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        ch, color = 1, 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ch, color = 3, 2
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * ch).astype(np.int32)
    bpp = ch

    def left_of(v: np.ndarray) -> np.ndarray:
        return np.concatenate((np.zeros(bpp, dtype=np.int32), v[:-bpp]))

    lines: list[bytes] = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        f = y % 5 if filter_cycle else 0
        left = left_of(cur)
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - (left + prev) // 2
        else:  # Paeth: predictor from RECONSTRUCTED (= original) bytes
            ul = left_of(prev)
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = cur - pred
        lines.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + chunk(b"IEND", b"")
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def wav_payload(text_col, n_samples: int, sample_rate: int = 8000):
    """Column expression: a real PCM16 mono WAV whose samples derive
    from an ASCII text column — sample k = (code_k − 64)·256 where
    code_k is the k-th character (text '@'-padded / truncated to
    ``n_samples``), giving signed samples in [−16384, 16128]. Pure
    JVM (chr/ascii transforms + ISO-8859-1 encode + concat), so the
    DuckDB oracle can recompute every sample from the same text.
    """
    import struct

    data_len = n_samples * 2
    header = (
        b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", data_len)
    )
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    ascii_only = F.regexp_replace(col, "[^\\x00-\\x7F]", "")
    padded = F.rpad(ascii_only, n_samples, "@")
    # int16 LE per char: low byte 0x00, high byte (code-64) mod 256
    # (two's-complement int8 semantics for the signed value).
    # split('', ...) appends a trailing empty element — slice to
    # exactly n_samples chars before mapping to high bytes.
    hi = F.transform(
        F.slice(F.split(padded, ""), 1, n_samples),
        lambda c: F.chr((F.ascii(c) - F.lit(64) + F.lit(256)) % F.lit(256)),
    )
    body = F.encode(
        F.concat_ws("", F.transform(hi, lambda h: F.concat(F.lit("\x00"), h))),
        "ISO-8859-1",
    )
    return F.concat(F.lit(header), body)


def ulaw_wav_payload(text_col, n_samples: int, sample_rate: int = 8000):
    """Column expression: a real G.711 μ-law mono WAV (format code 7,
    8-bit) whose encoded bytes derive from an ASCII text column —
    byte k = (code_k · 37) mod 256 (the multiplier spreads the 0-127
    ASCII range over both sign halves of the μ-law code space). Pure
    JVM, so the DuckDB oracle can recompute every decoded sample from
    the same text.
    """
    import struct

    header = (
        b"RIFF" + struct.pack("<I", 36 + n_samples) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 7, 1, sample_rate,
                                sample_rate, 1, 8)
        + b"data" + struct.pack("<I", n_samples)
    )
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    ascii_only = F.regexp_replace(col, "[^\\x00-\\x7F]", "")
    padded = F.rpad(ascii_only, n_samples, "@")
    body = F.encode(
        F.concat_ws(
            "",
            F.transform(
                F.slice(F.split(padded, ""), 1, n_samples),
                lambda c: F.chr((F.ascii(c) * F.lit(37)) % F.lit(256)),
            ),
        ),
        "ISO-8859-1",
    )
    return F.concat(F.lit(header), body)


def _build_ulaw_table() -> np.ndarray:
    """256-entry G.711 μ-law → linear int16 table (CCITT bias form,
    the public-domain formula: complement, then
    ``(((mantissa << 3) + 132) << exponent) − 132`` with the sign
    bit negating). Endpoints match the ITU table: 0x00 → −32124,
    0xFF → 0, 0x7F → 0."""
    b = np.arange(256, dtype=np.int64)
    u = 255 - b  # ~b & 0xFF
    t = (((u & 0x0F) << 3) + 132) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 132 - t, t - 132).astype(np.int16)


_ULAW_TABLE = _build_ulaw_table()


# IMA ADPCM (WAV format 0x11) — public IMA/DVI spec tables.
IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)
IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)


def _decode_ima_adpcm(data: bytes, block_align: int) -> np.ndarray:
    """Decode mono IMA ADPCM blocks to int16 samples.

    Block layout (IMA/DVI WAV): 4-byte state header (int16 LE
    predictor = sample 0, uint8 step index, reserved), then data
    bytes carrying two 4-bit samples each, LOW nibble first. The
    nibble loop is inherently sequential (each sample's step size
    depends on the previous decode) — pure Python per nibble, fine
    for the fixture sizes; a production hot path would batch blocks
    across rows (blocks are independent by design — that is the
    format's parallelism seam)."""
    out: list[int] = []
    for at in range(0, len(data), block_align):
        block = data[at : at + block_align]
        if len(block) < 4:
            break
        pred = int.from_bytes(block[0:2], "little", signed=True)
        idx = min(88, max(0, block[2]))
        out.append(pred)
        for b in block[4:]:
            for nib in (b & 0x0F, b >> 4):
                step = int(IMA_STEP_TABLE[idx])
                diff = step >> 3
                if nib & 4:
                    diff += step
                if nib & 2:
                    diff += step >> 1
                if nib & 1:
                    diff += step >> 2
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + int(IMA_INDEX_TABLE[nib & 7])))
                out.append(pred)
    return np.array(out, dtype=np.int16)


def make_adpcm_wav(
    samples: np.ndarray, sample_rate: int = 8000, block_align: int = 12
) -> bytes:
    """Encode int16 samples as a mono IMA ADPCM WAV (format 0x11).

    Standard IMA encoder: per block, header carries the first sample
    verbatim + the running step index; each further sample quantizes
    its delta to a 4-bit code and updates state with the DECODER's
    arithmetic (so encoder and decoder predictors never drift). A
    signal CONSTANT within each block encodes as all-zero nibbles at
    step 7 (diff = 7>>3 = 0) and round-trips exactly — the property
    the ``audio_adpcm_features`` SQL oracle stands on.
    """
    samples = np.asarray(samples, dtype=np.int16)
    spb = (block_align - 4) * 2 + 1  # samples per block
    body = bytearray()
    idx = 0
    for at in range(0, len(samples), spb):
        blk = samples[at : at + spb]
        pred = int(blk[0])
        body += int(pred).to_bytes(2, "little", signed=True)
        body += bytes([idx, 0])
        nibs: list[int] = []
        for s in blk[1:]:
            step = int(IMA_STEP_TABLE[idx])
            delta = int(s) - pred
            nib = 0
            if delta < 0:
                nib = 8
                delta = -delta
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            # update state with decoder arithmetic
            diff = step >> 3
            if nib & 4:
                diff += step
            if nib & 2:
                diff += step >> 1
            if nib & 1:
                diff += step >> 2
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(IMA_INDEX_TABLE[nib & 7])))
            nibs.append(nib)
        # pad the block's nibble stream to full data bytes
        while len(nibs) < (block_align - 4) * 2:
            nibs.append(0)
        for lo, hi in zip(nibs[0::2], nibs[1::2]):
            body.append(lo | (hi << 4))
    spb_total = spb
    hdr = bytearray()
    hdr += b"RIFF" + (4 + 8 + 20 + 8 + len(body)).to_bytes(4, "little") + b"WAVE"
    hdr += b"fmt " + (20).to_bytes(4, "little")
    hdr += (0x11).to_bytes(2, "little")  # wFormatTag
    hdr += (1).to_bytes(2, "little")  # channels
    hdr += int(sample_rate).to_bytes(4, "little")
    byte_rate = sample_rate * block_align // spb_total
    hdr += int(byte_rate).to_bytes(4, "little")
    hdr += int(block_align).to_bytes(2, "little")
    hdr += (4).to_bytes(2, "little")  # bits per sample
    hdr += (2).to_bytes(2, "little") + int(spb_total).to_bytes(2, "little")  # cbSize + samples/block
    hdr += b"data" + len(body).to_bytes(4, "little")
    return bytes(hdr + body)


def parse_wav(payload: bytes) -> tuple[int, np.ndarray] | None:
    """Pure-numpy decoder for mono WAV: proper RIFF chunk walk
    (fmt before data, unknown chunks skipped, odd sizes padded per
    spec). Handles uncompressed PCM16 (format 1, 16-bit), G.711
    μ-law (format 7, 8-bit — decoded through the 256-entry CCITT
    table to int16), and IMA ADPCM (format 0x11, 4-bit — sequential
    block decode per the IMA/DVI spec). Returns ``(sample_rate,
    int16 samples)`` or ``None`` for anything else (caller falls
    back to the stub). Truncated data chunks are clamped to the
    bytes present. Total over arbitrary bytes — never raises.
    """
    n = len(payload)
    if n < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    sample_rate = None
    audio_format = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body_start = pos + 8
        if cid == b"fmt ":
            fmt = payload[body_start : body_start + min(size, n - body_start)]
            if len(fmt) < 16:
                return None
            audio_format = int.from_bytes(fmt[0:2], "little")
            channels = int.from_bytes(fmt[2:4], "little")
            sample_rate = int.from_bytes(fmt[4:8], "little")
            block_align = int.from_bytes(fmt[12:14], "little")
            bits = int.from_bytes(fmt[14:16], "little")
            if channels != 1:
                return None
            if not (
                (audio_format == 1 and bits == 16)
                or (audio_format == 7 and bits == 8)
                or (audio_format == 0x11 and bits == 4 and block_align >= 5)
            ):
                return None
        elif cid == b"data":
            if sample_rate is None:
                return None
            avail = max(0, n - body_start)
            if audio_format == 0x11:
                take = min(size, avail)
                return sample_rate, _decode_ima_adpcm(
                    payload[body_start : body_start + take], block_align
                )
            if audio_format == 7:
                take = min(size, avail)
                codes = np.frombuffer(
                    payload, dtype=np.uint8, count=take, offset=body_start
                )
                return sample_rate, _ULAW_TABLE[codes]
            take = min(size, avail) & ~1  # whole int16 samples only
            samples = np.frombuffer(
                payload, dtype="<i2", count=take // 2, offset=body_start
            )
            return sample_rate, samples
        pos = body_start + size + (size & 1)  # chunks are word-aligned
    return None


def extract_audio_features(media: DataFrame) -> DataFrame:
    """PCM16 WAV payload → global audio features, one narrow pass:
    sample count, rate, RMS amplitude, zero-crossing rate (sign
    changes / (n−1), sign(x) = x < 0), integer peak |amplitude|.
    Non-WAV payloads are dropped (a production pipeline would route
    them to their own decoder) — emitted metrics are exact functions
    of the samples, so the catalog oracle recomputes them in SQL.
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_worker as tune_malloc

        tune_malloc()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in
                   ("media_id", "n_samples", "sample_rate", "rms", "zcr", "peak")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = parse_wav(bytes(p))
                if parsed is None:
                    continue
                sr, s = parsed
                if len(s) == 0:
                    continue
                x = s.astype(np.float64)
                neg = s < 0
                out["media_id"].append(mid)
                out["n_samples"].append(len(s))
                out["sample_rate"].append(sr)
                out["rms"].append(float(np.sqrt(np.mean(x * x))))
                out["zcr"].append(
                    float(np.mean(neg[1:] != neg[:-1])) if len(s) > 1 else 0.0
                )
                out["peak"].append(int(np.max(np.abs(x))))
            yield pd.DataFrame(out)

    from spark_tsne_spark.partitioning import widen_small_input

    return widen_small_input(media.select("media_id", "payload")).mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


def _decode_stub(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from the payload
    bytes (sha256-seeded). A real deployment replaces this with an
    actual image/audio decode + model forward pass; everything around
    it (Arrow batching, schema, partitioning) is production-shaped.
    """
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim)


def _histogram_features(grid: np.ndarray, dim: int) -> np.ndarray:
    """Real image features: a ``dim``-bin normalized intensity
    histogram of the decoded pixel grid (deterministic, SQL-checkable
    — see the ``multimodal_features`` oracle)."""
    counts = np.bincount((grid.ravel().astype(np.uint16) * dim) // 256, minlength=dim)
    return counts[:dim].astype(np.float64) / max(1, grid.size)


def _decode_image(payload: bytes) -> np.ndarray | None:
    """Try every REAL decoder (netpbm, PNG, then baseline JPEG);
    ``None`` → stub."""
    from spark_tsne_spark.sources.jpeg import parse_jpeg

    grid = parse_netpbm(payload)
    if grid is None:
        grid = parse_png(payload)
    if grid is None:
        grid = parse_jpeg(payload)
    return grid


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """binary payload → fixed-width feature vector, one narrow pass.

    netpbm (P5/P6) and 8-bit gray/RGB PNG payloads decode for real
    and yield intensity histograms; other payloads fall to the
    deterministic stub.
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_worker as tune_malloc

        tune_malloc()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for p in pdf["payload"]:
                grid = _decode_image(bytes(p))
                if grid is not None:
                    feats.append(list(_histogram_features(grid, dim)))
                else:
                    feats.append(list(_decode_stub(bytes(p), dim)))
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    from spark_tsne_spark.partitioning import widen_small_input

    return widen_small_input(media.select("media_id", "payload")).mapInPandas(
        run, FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sample videos: one output row per kept frame.

    Concatenated-netpbm streams (the multi-frame container here)
    split into REAL standalone frame binaries by parsing each frame's
    header + raster extent; other containers fall back to the stub
    frame split (payload sliced into ``meta.n_frames`` equal chunks).
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_worker as tune_malloc

        tune_malloc()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"media_id": [], "frame_idx": [], "frame": []}
            # column zips, not iterrows: per-payload slicing is
            # inherently per-row, but building a pandas Series per row
            # is not
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                payload = bytes(payload)
                frames = split_netpbm_stream(payload)
                if frames:
                    for k in range(0, len(frames), every_n):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(k)
                        out["frame"].append(frames[k])
                    continue
                n = max(1, int(n_frames or 1))
                step = max(1, len(payload) // n)
                for k in range(0, n, every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["frame"].append(payload[k * step : (k + 1) * step])
            yield pd.DataFrame(out)

    from spark_tsne_spark.partitioning import widen_small_input

    flat = widen_small_input(
        media.select(
            "media_id", "payload", F.col("meta.n_frames").alias("n_frames")
        )
    )
    return flat.mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def _decode_grid_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB image decode: interpret the raw payload as a row-major
    uint8 pixel grid, zero-padded / truncated to ``height x width``.
    A real deployment swaps this for PIL/libjpeg; the resample kernel
    and everything around it is production-shaped.
    """
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    if buf.size < need:
        buf = np.pad(buf, (0, need - buf.size))
    return buf[:need].reshape(height, width)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every image to ``width x height`` (nearest-neighbor),
    one narrow Arrow-batched pass: decode (real netpbm / PNG parse,
    raw-grid stub otherwise) -> vectorized numpy index resample ->
    re-encode as raw bytes, metadata updated in place. No shuffle;
    payloads stay columnar through Arrow.
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(media.sparkSession)
    xs_tpl = np.arange(width)
    ys_tpl = np.arange(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_worker as tune_malloc

        tune_malloc()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"media_id": [], "payload": [], "meta": []}
            for mid, payload, mime, w0, h0, nf in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"],
                pdf["width"], pdf["height"], pdf["n_frames"],
            ):
                grid = _decode_image(bytes(payload))
                if grid is None:
                    src_w = max(1, int(w0 or 1))
                    src_h = max(1, int(h0 or 1))
                    grid = _decode_grid_stub(bytes(payload), src_w, src_h)
                else:
                    src_h, src_w = grid.shape
                ys = np.minimum((ys_tpl * src_h) // height, src_h - 1)
                xs = np.minimum((xs_tpl * src_w) // width, src_w - 1)
                resized = grid[np.ix_(ys, xs)]
                out["media_id"].append(mid)
                out["payload"].append(resized.tobytes())
                out["meta"].append(
                    {
                        "mime": mime,
                        "width": width,
                        "height": height,
                        "n_frames": nf,
                    }
                )
            yield pd.DataFrame(out)

    flat = media.select(
        "media_id",
        "payload",
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    from spark_tsne_spark.partitioning import widen_small_input

    return widen_small_input(flat).mapInPandas(run, RESIZED_SCHEMA)
