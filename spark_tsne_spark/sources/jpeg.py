"""Baseline JPEG codec in pure numpy + stdlib — no codec library.

``parse_jpeg`` decodes baseline (SOF0/SOF1) Huffman JPEG: DQT/DHT/
DRI/SOS marker walk, byte-stuffed entropy decode with restart
markers, dequantize + de-zigzag, one batched IDCT per component
(numpy einsum over every 8×8 block at once — the only hot loop in
Python is the inherently sequential Huffman bit walk), nearest-
neighbor chroma upsampling, BT.601 YCbCr→RGB. Returns ``(h, w)``
uint8 for grayscale, ``(h, w, 3)`` for color, ``None`` for anything
malformed, truncated, progressive, or arithmetic-coded — total over
arbitrary bytes like ``parse_netpbm`` / ``parse_png``.

``make_jpeg`` is the matching minimal encoder (used by fixtures and
the ``multimodal_jpeg`` catalog entry): grayscale or RGB, optional
4:2:0 subsampling, spec Annex-K Huffman tables, and a default
all-ones quantization table. With unit quantization an image built
from flat 8×8 tiles round-trips EXACTLY (a flat block's only nonzero
DCT coefficient is its integer DC), which is what gives the catalog
entry a pixel-exact SQL oracle for a lossy codec.

Everything here derives from the public JPEG spec (ITU T.81): the
zigzag order, Annex-K Huffman table definitions, and the orthonormal
8×8 DCT-II. No reference-engine counterpart exists (the reference
has no multimodal layer at all — SURVEY.md brief extension).
"""

from __future__ import annotations

import numpy as np

# Zigzag scan: ZZ[i] = natural (row-major) index of the i-th
# coefficient in zigzag order (T.81 Figure 5).
ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K Huffman tables: (bits[16], values). bits[i] = number of
# codes of length i+1.
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Orthonormal 8×8 DCT-II basis: FDCT C = B X Bᵀ, IDCT X = Bᵀ C B.
# For a flat block X = v·1, C[0,0] = 8v and every other coefficient
# is exactly 0 — the invariant behind the exact-roundtrip fixtures.
_B = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _B[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def _build_decoder(bits, vals):
    """Canonical Huffman decode tables (T.81 F.15): per code length
    the smallest/largest code and the symbol-array offset."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            valptr[length] = k
            mincode[length] = code
            code += n
            k += n
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


class _MarkerHit(Exception):
    """Raised when the bit reader runs into a non-stuffed marker."""


class _BitReader:
    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            else:
                raise _MarkerHit  # real marker (EOI / RST / garbage)
        else:
            self.pos += 1
        self.buf = b
        self.cnt = 8

    def bit(self) -> int:
        if self.cnt == 0:
            self._fill()
        self.cnt -= 1
        return (self.buf >> self.cnt) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.cnt = 0
        d = self.data
        p = self.pos
        if d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos = p + 2

    def decode_huff(self, table) -> int:
        mincode, maxcode, valptr, vals = table
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            if code <= maxcode[length]:
                return vals[valptr[length] + code - mincode[length]]
        raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def parse_jpeg(payload: bytes) -> np.ndarray | None:
    """Decode a baseline JPEG; ``None`` for anything else (total over
    arbitrary bytes — fuzz-tested like the other parsers)."""
    try:
        return _parse_jpeg(payload)
    except Exception:
        return None


def _parse_jpeg(d: bytes):
    if len(d) < 4 or d[0] != 0xFF or d[1] != 0xD8:
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    sof = None
    dri = 0
    scan = None
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            return None
        m = d[pos + 1]
        pos += 2
        while m == 0xFF:  # fill bytes
            m = d[pos]
            pos += 1
        if m == 0xD9:  # EOI before any scan
            return None
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        seglen = (d[pos] << 8) | d[pos + 1]
        if seglen < 2 or pos + seglen > len(d):
            return None
        seg = d[pos + 2 : pos + seglen]
        if m == 0xDB:  # DQT (one or more tables)
            at = 0
            while at < len(seg):
                pq, tq = seg[at] >> 4, seg[at] & 15
                at += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[at : at + 64], dtype=np.uint8)
                    at += 64
                else:
                    tbl = np.frombuffer(
                        seg[at : at + 128], dtype=">u2"
                    )
                    at += 128
                if len(tbl) != 64:
                    return None
                qt[tq] = tbl.astype(np.int64)
        elif m in (0xC0, 0xC1):  # SOF0/SOF1 (baseline/ext. sequential)
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            ncomp = seg[5]
            if seg[0] != 8 or h == 0 or w == 0 or ncomp not in (1, 3):
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
                if not (1 <= comps[-1]["h"] <= 4 and 1 <= comps[-1]["v"] <= 4):
                    return None
            sof = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / lossless
        elif m == 0xC4:  # DHT (one or more tables)
            at = 0
            while at + 17 <= len(seg):
                tc, th = seg[at] >> 4, seg[at] & 15
                bits = list(seg[at + 1 : at + 17])
                n = sum(bits)
                vals = list(seg[at + 17 : at + 17 + n])
                if len(vals) != n:
                    return None
                huff[(tc, th)] = _build_decoder(bits, vals)
                at += 17 + n
        elif m == 0xDD:  # DRI
            dri = (seg[0] << 8) | seg[1]
        elif m == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel.append((cs, tt >> 4, tt & 15))
            scan = (sel, pos + seglen)
            break
        pos += seglen
    if sof is None or scan is None:
        return None
    h, w, comps = sof
    sel, data_pos = scan
    if len(sel) != len(comps):
        return None
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in sel:
        c = by_id.get(cs)
        if c is None or (0, td) not in huff or (1, ta) not in huff:
            return None
        if c["tq"] not in qt:
            return None
        order.append((c, huff[(0, td)], huff[(1, ta)]))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    br = _BitReader(d, data_pos)
    preds = [0] * len(order)
    # zigzag coefficient vectors per component, MCU-ordered
    coefs: list[list[np.ndarray]] = [[] for _ in order]
    blkpos: list[list[tuple[int, int]]] = [[] for _ in order]
    n_mcus = mcus_x * mcus_y
    for mi in range(n_mcus):
        if dri and mi and mi % dri == 0:
            br.restart()
            preds = [0] * len(order)
        my, mx = divmod(mi, mcus_x)
        for ci, (c, dct, act) in enumerate(order):
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    s = br.decode_huff(dct)
                    diff = _extend(br.receive(s), s) if s else 0
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = br.decode_huff(act)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC overflow")
                        zz[k] = _extend(br.receive(s), s)
                        k += 1
                    coefs[ci].append(zz)
                    blkpos[ci].append((my * c["v"] + v, mx * c["h"] + hh))

    planes = []
    for ci, (c, _, _) in enumerate(order):
        q = qt[c["tq"]]
        zz = np.stack(coefs[ci]) * q  # (nblocks, 64) dequantized
        nat = np.zeros_like(zz)
        nat[:, ZZ] = zz  # de-zigzag
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        # batched IDCT: X = Bᵀ C B
        spatial = np.einsum("ij,njk,kl->nil", _B.T, blocks, _B) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
        for blk, (by, bx) in zip(spatial, blkpos[ci]):
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
        # crop to component dims, upsample to full-image grid
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _build_encoder(bits, vals):
    """symbol -> (code, length) canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def put(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.cnt += length
        while self.cnt >= 8:
            self.cnt -= 8
            b = (self.buf >> self.cnt) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.cnt:
            self.put(0x7F, 7 - ((self.cnt - 1) % 8) + 1)  # pad with 1s


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane (H, W multiples of 8) → quantized zigzag
    vectors indexed [by, bx, 64]."""
    hh, ww = plane.shape
    x = plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    x = x.astype(np.float64) - 128.0
    c = np.einsum("ij,rbjk,kl->rbil", _B, x, _B.T)
    zz = c.reshape(hh // 8, ww // 8, 64)[:, :, ZZ]
    return np.round(zz / q).astype(np.int64)


def _encode_block(bw, zz, pred, dc_enc, ac_enc) -> int:
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    s = mag.bit_length()
    bw.put(*dc_enc[s])
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*ac_enc[0xF0])  # ZRL
            run -= 16
        s = abs(v).bit_length()
        bw.put(*ac_enc[(run << 4) | s])
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        bw.put(*ac_enc[0x00])  # EOB
    return dc


def _pad_to(img: np.ndarray, mult: int) -> np.ndarray:
    h, w = img.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    return img


def make_jpeg(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: bool = False,
) -> bytes:
    """Encode a uint8 grayscale ``(h, w)`` or RGB ``(h, w, 3)`` image
    as baseline JPEG. ``quant`` is a 64-entry zigzag-order table
    shared by all components (default all-ones: visually lossless,
    and bit-exact for flat-8×8-tile images). ``subsample=True`` emits
    4:2:0 chroma (color only)."""
    img = np.asarray(img, dtype=np.uint8)
    q = (
        np.ones(64, dtype=np.int64)
        if quant is None
        else np.asarray(quant, dtype=np.int64).reshape(64)
    )
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [_pad_to(img, 8)]
        samp = [(1, 1)]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        cb = np.clip(
            np.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255
        )
        cr = np.clip(
            np.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255
        )
        if subsample:
            ypl = _pad_to(y.astype(np.uint8), 16)
            sh, sw = ypl.shape
            cpl = []
            for c in (cb, cr):
                c = _pad_to(c.astype(np.uint8), 16).astype(np.float64)
                c = c.reshape(sh // 2, 2, sw // 2, 2).mean(axis=(1, 3))
                cpl.append(np.clip(np.round(c), 0, 255).astype(np.uint8))
            planes = [ypl, cpl[0], cpl[1]]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [
                _pad_to(p.astype(np.uint8), 8) for p in (y, cb, cr)
            ]
            samp = [(1, 1)] * 3

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: one shared table, id 0, 8-bit precision
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + b"\x00"
    out += bytes(int(v) for v in q)
    # SOF0
    ncomp = 1 if gray else 3
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    # DHT: luma DC (class 0 id 0) + luma AC (class 1 id 0), shared by
    # every component via the SOS table selectors.
    for cls, (bits, vals) in ((0, DC_LUMA), (1, AC_LUMA)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (2 + len(body)).to_bytes(2, "big") + body
    # SOS
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    zz_per_comp = [_fdct_quant(p, q) for p in planes]
    mcus_y = planes[0].shape[0] // (8 * vmax)
    mcus_x = planes[0].shape[1] // (8 * hmax)
    dc_enc = _build_encoder(*DC_LUMA)
    ac_enc = _build_encoder(*AC_LUMA)
    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for v in range(vs):
                    for hh in range(hs):
                        zz = zz_per_comp[ci][my * vs + v, mx * hs + hh]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci], dc_enc, ac_enc
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
