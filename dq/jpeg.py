"""Baseline JPEG (ITU-T T.81 SOF0 sequential DCT) in pure numpy + stdlib.

Both directions, zero codec libraries: the encoder exists so the decoder is
roundtrip-testable (JPEG is lossy — tests pin bounded error on smooth
content and EXACT roundtrip on uniform grayscale at quality 100, where the
all-ones quant table and a DC-only spectrum make every step integer-safe).

Spec subset (asserted, never silently mis-parsed):
- decode: SOF0 only (progressive SOF2 / extended / arithmetic variants
  raise MediaDecodeError), 8-bit precision, 1 or 3 components, sampling
  factors 1-2 per axis (covers 4:4:4, 4:2:0, 4:2:2), DHT-driven canonical
  Huffman, DQT 8-bit tables, DRI + RSTn restart markers, APPn/COM skipped,
  0xFF00 byte unstuffing.
- encode: Annex K quant tables scaled by the IJG quality curve, Annex K
  Huffman tables (written to the stream as DHT — the decoder always reads
  tables from the file, so the constants only shape compression, not
  correctness), JFIF APP0, gray or YCbCr at 4:4:4 / 4:2:0 / 4:2:2, no
  restart markers.

Decode math: canonical Huffman per T.81 §C.2, DC prediction + EXTEND
(§F.2.2.1), run/size AC with ZRL/EOB (§F.2.2.2), dequant → inverse zigzag
→ orthonormal 8x8 IDCT (matrix form) → level shift → chroma replication
upsample → BT.601 YCbCr→RGB.
"""

from __future__ import annotations

import struct

import numpy as np


def _err(msg: str) -> None:
    from dq.codecs import MediaDecodeError

    raise MediaDecodeError(msg)


# --------------------------------------------------------------- tables -----

# Annex K.1/K.2 quantization tables (luminance, chrominance)
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)


def _zigzag() -> np.ndarray:
    """Flat (row*8+col) index of the i-th coefficient in zigzag order."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)  # row values on diagonal s
        rows = rng if s % 2 else reversed(rng)
        out.extend(r * 8 + (s - r) for r in rows)
    return np.array(out, dtype=np.int64)


_ZZ = _zigzag()

# Annex K.3 Huffman table specs: (bits[1..16] counts, values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
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
_AC_CHROMA = (
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

for _bits, _vals in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
    assert sum(_bits) == len(_vals)


def _canonical_codes(bits: list[int], vals: list[int]) -> list[tuple[int, int, int]]:
    """(value, code, length) triples per T.81 §C.2 canonical assignment."""
    out, code, k = [], 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((vals[k], code, ln))
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.sqrt(0.25)
    d[0] = np.sqrt(0.125)
    return d


_D = _dct_matrix()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _size_cat(v: int) -> int:
    return int(abs(v)).bit_length()


# -------------------------------------------------------------- encoder -----


class _BitWriter:
    """MSB-first bit packer with 0xFF00 byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.acc &= (1 << self.n) - 1
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _box_down(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Box-mean downsample by (fy, fx) with edge replication to even dims."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ph, pw = (-h) % fy, (-w) % fx
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    h, w = plane.shape
    return plane.reshape(h // fy, fy, w // fx, fx).mean(axis=(1, 3))


def _pad_to(plane: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, out_h - h), (0, out_w - w)), mode="edge")


_SAMPLING = {"444": [(1, 1), (1, 1), (1, 1)], "420": [(2, 2), (1, 1), (1, 1)],
             "422": [(2, 1), (1, 1), (1, 1)]}


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h,w) gray or (h,w,3) RGB -> baseline JFIF bytes.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (exists so the decoder's restart path is
    roundtrip-testable; production encoders use it for error resilience)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"unsupported array shape {a.shape}")
    if subsampling not in _SAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(_SAMPLING)}")
    h, w = a.shape[:2]
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError("image dims out of JPEG range")

    if gray:
        planes = [a.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        r, g, bch = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128.0
        samp = _SAMPLING[subsampling]
        (hy, vy), _, _ = samp
        planes = [y - 128.0,
                  _box_down(cb, vy, hy) - 128.0,
                  _box_down(cr, vy, hy) - 128.0]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    n_mcux = -(-w // (8 * hmax))
    n_mcuy = -(-h // (8 * vmax))

    quant = [_scaled_quant(_QUANT_LUMA, quality),
             _scaled_quant(_QUANT_CHROMA, quality)]
    qid = [0] + [1] * (len(planes) - 1)

    # quantized zigzag blocks per component, indexed [comp][by][bx]
    comp_blocks: list[np.ndarray] = []
    for ci, (plane, (hi, vi)) in enumerate(zip(planes, samp)):
        gw, gh = n_mcux * hi * 8, n_mcuy * vi * 8
        p = _pad_to(plane, gh, gw)
        nby, nbx = gh // 8, gw // 8
        blocks = np.zeros((nby, nbx, 64), dtype=np.int64)
        q = quant[qid[ci]].reshape(-1)
        for by in range(nby):
            for bx in range(nbx):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = (_D @ blk @ _D.T).reshape(-1)
                blocks[by, bx] = np.round(coef[_ZZ] / q[_ZZ]).astype(np.int64)
        comp_blocks.append(blocks)

    # Huffman encode maps
    def enc_map(spec: tuple) -> dict[int, tuple[int, int]]:
        return {v: (c, ln) for v, c, ln in _canonical_codes(*spec)}

    dc_maps = [enc_map(_DC_LUMA)] + [enc_map(_DC_CHROMA)] * (len(planes) - 1)
    ac_maps = [enc_map(_AC_LUMA)] + [enc_map(_AC_CHROMA)] * (len(planes) - 1)

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu_i = 0
    rst = 0
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()  # byte-align (1-padded) before the raw marker
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * len(planes)
            mcu_i += 1
            for ci, (hi, vi) in enumerate(samp):
                for by in range(vi):
                    for bx in range(hi):
                        zz = comp_blocks[ci][my * vi + by, mx * hi + bx]
                        dc = int(zz[0])
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        s = _size_cat(diff)
                        code, ln = dc_maps[ci][s]
                        bw.write(code, ln)
                        if s:
                            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if k > last_nz:
                                code, ln = ac_maps[ci][0x00]  # EOB
                                bw.write(code, ln)
                                break
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_maps[ci][0xF0]  # ZRL
                                bw.write(code, ln)
                                run -= 16
                            s = _size_cat(v)
                            code, ln = ac_maps[ci][(run << 4) | s]
                            bw.write(code, ln)
                            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    n_q = 1 if gray else 2
    for t in range(n_q):
        out += seg(0xFFDB, bytes([t]) + bytes(int(x) for x in quant[t].reshape(-1)[_ZZ]))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(planes)))
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, qid[ci]])
    out += seg(0xFFC0, bytes(sof))
    hts = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        hts += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, vals) in hts:
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# -------------------------------------------------------------- decoder -----


class _BitReader:
    """MSB-first bit reader over entropy-coded data: 0xFF00 unstuffing,
    markers captured (never consumed as bits)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None or self.pos >= len(self.data):
            _err("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                _err("truncated JPEG entropy stream")
            nb = self.data[self.pos]
            if nb == 0x00:
                self.pos += 1
            else:
                self.marker = nb
                self.pos += 1
                _err(f"marker 0xff{nb:02x} inside entropy segment")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        v = (self.acc >> self.n) & 1
        self.acc &= (1 << self.n) - 1
        return v

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def restart(self, m: int) -> None:
        """Byte-align and consume the expected RSTm marker."""
        self.acc = 0
        self.n = 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            _err("missing restart marker")
        got = self.data[self.pos + 1]
        if got != 0xD0 + m:
            _err(f"expected RST{m}, found 0xff{got:02x}")
        self.pos += 2


def _decode_sym(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        v = table.get((ln, code))
        if v is not None:
            return v
    _err("invalid Huffman code")
    raise AssertionError  # unreachable


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes -> uint8 (h,w) gray or (h,w,3) RGB."""
    b = bytes(b)
    if b[:2] != b"\xff\xd8":
        _err("not a JPEG (bad SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    restart_interval = 0
    while True:
        if pos + 4 > len(b):
            _err("truncated JPEG (no SOS)")
        if b[pos] != 0xFF:
            _err(f"expected marker at {pos}, found 0x{b[pos]:02x}")
        marker = b[pos + 1]
        if marker == 0xD9:
            _err("EOI before SOS")
        (length,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        body = b[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            _err("truncated JPEG segment")
        pos += 2 + length
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    _err("16-bit quant tables unsupported (baseline is 8-bit)")
                vals = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int64)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZZ] = vals
                quant[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = {
                    (ln, code): v for v, code, ln in _canonical_codes(bits, vals)
                }
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, ih, iw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                _err(f"unsupported precision {prec}")
            if nc not in (1, 3):
                _err(f"unsupported component count {nc}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    _err(f"sampling factor {hi}x{vi} unsupported (1-2 only)")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            sof = (ih, iw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            _err(
                f"unsupported SOF 0xff{marker:02x} — this decoder covers "
                "baseline sequential (SOF0) only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if sof is None:
                _err("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan.append({"id": cs, "dc": tdta >> 4, "ac": tdta & 0x0F})
            break
        # APPn / COM / others: skipped by the length walk
    ih, iw, comps = sof
    if len(scan) != len(comps):
        _err("scan/frame component count mismatch")
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        if s["id"] not in by_id:
            _err(f"scan references unknown component {s['id']}")
        c = by_id[s["id"]]
        c["dc"], c["ac"] = s["dc"], s["ac"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    n_mcux = -(-iw // (8 * hmax))
    n_mcuy = -(-ih // (8 * vmax))
    planes = []
    for c in comps:
        if c["tq"] not in quant:
            _err(f"missing quant table {c['tq']}")
        if (0, c["dc"]) not in huff or (1, c["ac"]) not in huff:
            _err("missing Huffman table")
        planes.append(
            np.zeros((n_mcuy * c["v"] * 8, n_mcux * c["h"] * 8), dtype=np.float64)
        )

    br = _BitReader(b, pos)
    pred = [0] * len(comps)
    mcu_i = 0
    rst = 0
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.restart(rst)
                rst = (rst + 1) & 7
                pred = [0] * len(comps)
            mcu_i += 1
            for ci, c in enumerate(comps):
                dc_tbl, ac_tbl = huff[(0, c["dc"])], huff[(1, c["ac"])]
                q = quant[c["tq"]].reshape(-1)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        s = _decode_sym(br, dc_tbl)
                        diff = _extend(br.receive(s), s) if s else 0
                        pred[ci] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_sym(br, ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                _err("AC run past block end")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZZ] = zz * q
                        blk = _D.T @ coef.reshape(8, 8) @ _D
                        py, px = (my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8
                        planes[ci][py : py + 8, px : px + 8] = blk

    full = []
    for c, p in zip(comps, planes):
        cw = -(-iw * c["h"] // hmax)
        ch = -(-ih * c["v"] // vmax)
        p = p[:ch, :cw]
        if c["v"] != vmax or c["h"] != hmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:ih, :iw] + 128.0)
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, bl], axis=2)), 0, 255).astype(np.uint8)
