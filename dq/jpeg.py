"""JPEG (ITU-T T.81) in pure numpy + stdlib: baseline sequential (SOF0)
AND progressive (SOF2, spectral selection + successive approximation).

Both directions, zero codec libraries: the encoder exists so the decoder is
roundtrip-testable. JPEG is lossy, so the oracles are (a) bounded error on
smooth content, (b) EXACT roundtrip on uniform grayscale at quality 100
(all-ones quant table + DC-only spectrum make every step integer-safe), and
(c) for progressive: the scan script transmits the SAME quantized
coefficients as the baseline form, so decode(progressive) must equal
decode(baseline) bit-for-bit on every input.

Spec subset (asserted, never silently mis-parsed):
- decode: SOF0 and SOF2 (multi-scan coefficient accumulation; DC/AC first
  + refinement scans per T.81 §G.2 with EOB runs; extended-sequential /
  lossless / arithmetic variants raise MediaDecodeError), 8-bit precision,
  1 or 3 components, sampling factors 1-2 per axis (4:4:4, 4:2:0, 4:2:2),
  DHT-driven canonical Huffman, DQT 8-bit tables, DRI + RSTn restart
  markers (DC predictors and EOB runs reset), APPn/COM skipped, 0xFF00
  byte unstuffing.
- encode: Annex K quant tables scaled by the IJG quality curve, Annex K
  Huffman tables for sequential scans (written to the stream as DHT — the
  decoder always reads tables from the file, so the constants only shape
  compression, not correctness), JFIF APP0, gray or YCbCr at 4:4:4 /
  4:2:0 / 4:2:2; progressive=True emits an SA scan script (DC Al=1→0, AC
  band splits at Al=1→0) with a complete 256-symbol AC table.

Decode math: canonical Huffman per T.81 §C.2, DC prediction + EXTEND
(§F.2.2.1), run/size AC with ZRL/EOB (§F.2.2.2), progressive refinement
correction bits (§G.1.2.3, mirrored from the libjpeg advance walk), dequant
→ inverse zigzag → orthonormal 8x8 IDCT (matrix form) → level shift →
chroma replication upsample → BT.601 YCbCr→RGB.
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
    progressive: bool = False,
) -> bytes:
    """uint8 (h,w) gray or (h,w,3) RGB -> baseline (SOF0) or progressive
    (SOF2) JFIF bytes.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (exists so the decoder's restart path is
    roundtrip-testable; production encoders use it for error resilience).
    ``progressive`` emits an SA+spectral-selection scan script carrying the
    SAME quantized coefficients as the baseline form — decode() of the two
    encodings is pixel-identical (the pytest oracle)."""
    if progressive and restart_interval:
        raise ValueError("restart markers are a baseline-encoder option here")
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

    if progressive:
        return _encode_progressive(comp_blocks, samp, quant, qid, gray, h, w,
                                   n_mcux, n_mcuy)

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


def _scan_units(comp: dict, geom: dict) -> tuple[int, int]:
    """Non-interleaved scan block grid for one component (T.81 A.2.2: the
    real data grid padded to 8, NOT the MCU-padded grid)."""
    cw = -(-geom["iw"] * comp["h"] // geom["hmax"])
    ch = -(-geom["ih"] * comp["v"] // geom["vmax"])
    return -(-ch // 8), -(-cw // 8)


def _decode_scan(
    b: bytes,
    pos: int,
    scan: list[dict],
    comps: list[dict],
    geom: dict,
    quant: dict,
    huff: dict,
    coefs: list[np.ndarray],
    progressive: bool,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> int:
    """Entropy-decode one scan into the per-component zigzag coefficient
    arrays; returns the stream position of the next marker."""
    interleaved = len(scan) > 1
    if progressive:
        if ss == 0 and se != 0:
            _err("progressive scan mixes DC and AC bands (Ss=0 needs Se=0)")
        if ss > 0 and interleaved:
            _err("progressive AC scan must be non-interleaved")
        if ah not in (0,) and ah != al + 1:
            _err(f"successive approximation Ah={ah} Al={al} out of sequence")
    elif not (ss == 0 and se == 63 and ah == 0 and al == 0):
        _err("baseline scan must cover the full band at full precision")

    br = _BitReader(b, pos)
    pred = {c["idx"]: 0 for c in scan}
    eobrun = 0
    rst = 0
    unit_i = 0

    def maybe_restart() -> None:
        nonlocal rst, eobrun, pred
        if restart_interval and unit_i and unit_i % restart_interval == 0:
            br.restart(rst)
            rst = (rst + 1) & 7
            pred = {k: 0 for k in pred}
            eobrun = 0

    def baseline_block(c: dict, zz: np.ndarray) -> None:
        dc_tbl, ac_tbl = huff[(0, c["dc"])], huff[(1, c["ac"])]
        s = _decode_sym(br, dc_tbl)
        diff = _extend(br.receive(s), s) if s else 0
        pred[c["idx"]] += diff
        zz[0] = pred[c["idx"]]
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

    def dc_block(c: dict, zz: np.ndarray) -> None:
        if ah == 0:  # first DC scan: shifted diffs
            s = _decode_sym(br, huff[(0, c["dc"])])
            diff = _extend(br.receive(s), s) if s else 0
            pred[c["idx"]] += diff
            zz[0] = pred[c["idx"]] << al
        elif br.bit():  # refinement: one raw bit ORed in (G.2)
            zz[0] = int(zz[0]) | (1 << al)

    def ac_first_block(zz: np.ndarray, ac_tbl: dict) -> None:
        nonlocal eobrun
        if eobrun:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _decode_sym(br, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.receive(r)
                break
            k += r
            if k > se:
                _err("AC run past band end")
            zz[k] = _extend(br.receive(s), s) << al
            k += 1

    def ac_refine_block(zz: np.ndarray, ac_tbl: dict) -> None:
        # T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine: correction bits for
        # already-nonzero coefficients are interleaved in position order
        nonlocal eobrun
        p1, m1 = 1 << al, -1 << al

        def refine_at(k: int) -> None:
            v = int(zz[k])
            if br.bit() and (v & p1) == 0:
                zz[k] = v + (p1 if v >= 0 else m1)

        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _decode_sym(br, ac_tbl)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s:
                    if s != 1:
                        _err("AC refinement size must be 1")
                    newval = p1 if br.bit() else m1
                elif r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # advance past r zero-history coefficients, refining the
                # nonzero ones passed on the way
                while k <= se:
                    if int(zz[k]):
                        refine_at(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                k += 1
        if eobrun:
            while k <= se:
                if int(zz[k]):
                    refine_at(k)
                k += 1
            eobrun -= 1

    if interleaved:
        for my in range(geom["n_mcuy"]):
            for mx in range(geom["n_mcux"]):
                maybe_restart()
                unit_i += 1
                for c in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = coefs[c["idx"]][my * c["v"] + by, mx * c["h"] + bx]
                            if not progressive:
                                baseline_block(c, zz)
                            else:
                                dc_block(c, zz)
    else:
        c = scan[0]
        nby, nbx = _scan_units(c, geom)
        ac_tbl = huff.get((1, c["ac"])) if (progressive and ss > 0) else None
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart()
                unit_i += 1
                zz = coefs[c["idx"]][by, bx]
                if not progressive:
                    baseline_block(c, zz)
                elif ss == 0:
                    dc_block(c, zz)
                elif ah == 0:
                    ac_first_block(zz, ac_tbl)
                else:
                    ac_refine_block(zz, ac_tbl)

    # discard pad bits, land on the next marker
    if br.marker is not None:
        return br.pos - 2
    pos = br.pos
    if pos < len(b) and b[pos] != 0xFF:
        _err("trailing garbage after scan data")
    return pos


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline (SOF0) or progressive (SOF2, spectral selection +
    successive approximation) JFIF/JPEG bytes -> uint8 (h,w) gray or
    (h,w,3) RGB."""
    b = bytes(b)
    if b[:2] != b"\xff\xd8":
        _err("not a JPEG (bad SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    geom: dict = {}
    coefs: list[np.ndarray] = []
    progressive = False
    restart_interval = 0
    n_scans = 0
    while True:
        if pos + 2 > len(b):
            _err("truncated JPEG (no EOI)")
        if b[pos] != 0xFF:
            _err(f"expected marker at {pos}, found 0x{b[pos]:02x}")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # parameterless
            pos += 2
            continue
        if pos + 4 > len(b):
            _err("truncated JPEG segment header")
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
                quant[tq] = vals.copy()  # kept in zigzag order
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if sof is not None:
                _err("multiple SOF segments")
            progressive = marker == 0xC2
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
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq, "idx": ci})
            sof = (ih, iw, comps)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            geom = {
                "ih": ih, "iw": iw, "hmax": hmax, "vmax": vmax,
                "n_mcux": -(-iw // (8 * hmax)), "n_mcuy": -(-ih // (8 * vmax)),
            }
            coefs = [
                np.zeros((geom["n_mcuy"] * c["v"], geom["n_mcux"] * c["h"], 64),
                         dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            _err(
                f"unsupported SOF 0xff{marker:02x} — this decoder covers "
                "baseline sequential (SOF0) and progressive (SOF2) only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if sof is None:
                _err("SOS before SOF")
            ns = body[0]
            by_id = {c["id"]: c for c in sof[2]}
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                if cs not in by_id:
                    _err(f"scan references unknown component {cs}")
                c = dict(by_id[cs])
                c["dc"], c["ac"] = tdta >> 4, tdta & 0x0F
                scan.append(c)
            s_s, s_e, a = body[1 + 2 * ns : 4 + 2 * ns]
            a_h, a_l = a >> 4, a & 0x0F
            for c in scan:
                if c["tq"] not in quant:
                    _err(f"missing quant table {c['tq']}")
                if s_s == 0 and a_h == 0 and (0, c["dc"]) not in huff:
                    _err("missing DC Huffman table")
                if s_e > 0 and (1, c["ac"]) not in huff:
                    _err("missing AC Huffman table")
            pos = _decode_scan(
                b, pos, scan, sof[2], geom, quant, huff, coefs, progressive,
                s_s, s_e, a_h, a_l, restart_interval,
            )
            n_scans += 1
        # APPn / COM / others: skipped by the length walk
    if sof is None or n_scans == 0:
        _err("JPEG carries no decodable scan")

    ih, iw, comps = sof
    full = []
    for c, cf in zip(comps, coefs):
        q = quant[c["tq"]]
        nby, nbx = cf.shape[:2]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        for by in range(nby):
            for bx in range(nbx):
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZZ] = cf[by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _D.T @ coef.reshape(8, 8) @ _D
                )
        cw = -(-iw * c["h"] // geom["hmax"])
        ch = -(-ih * c["v"] // geom["vmax"])
        p = plane[:ch, :cw]
        if c["v"] != geom["vmax"] or c["h"] != geom["hmax"]:
            p = np.repeat(np.repeat(p, geom["vmax"] // c["v"], axis=0),
                          geom["hmax"] // c["h"], axis=1)
        full.append(p[:ih, :iw] + 128.0)
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, bl], axis=2)), 0, 255).astype(np.uint8)


# -------------------------------------------------- progressive encoder -----
# Exists so the progressive DECODER is roundtrip-testable: the scan script
# below (SA DC Al=1->0; spectral-selection AC bands at Al=1 then a
# refinement pass to Al=0) transmits exactly the same quantized
# coefficients as the baseline encoder, so decode(progressive bytes) must
# equal decode(baseline bytes) BIT-EXACTLY — that equality is the pytest
# oracle. The Annex K AC tables lack the EOBn (r>0) symbols progressive
# scans emit, so AC scans use a complete 256-symbol table written to DHT
# (255 codes at 9 bits + 1 at 10 — any valid table works, the decoder
# always reads tables from the stream).

_PROG_AC = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
            list(range(256)))
_EOB_MAX = 0x7FFF


class _EobRuns:
    """End-of-band run accumulator for progressive AC scans: counts blocks,
    buffers each run block's correction bits (refinement scans), flushes as
    EOBn symbols + the covered blocks' bits in block order."""

    def __init__(self, bw: _BitWriter, ac_map: dict) -> None:
        self.bw = bw
        self.ac_map = ac_map
        self.groups: list[list[int]] = []

    def add(self, correction_bits: list[int]) -> None:
        self.groups.append(correction_bits)
        if len(self.groups) == _EOB_MAX:
            self.flush()

    def flush(self) -> None:
        while self.groups:
            run = len(self.groups)
            r = min(14, run.bit_length() - 1)
            chunk = min(run, (1 << (r + 1)) - 1)
            code, ln = self.ac_map[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(chunk - (1 << r), r)
            for grp in self.groups[:chunk]:
                for bit in grp:
                    self.bw.write(bit, 1)
            self.groups = self.groups[chunk:]


def _ac_first_emit(bw, ac_map, runs: _EobRuns, zz: np.ndarray,
                   ss: int, se: int, al: int) -> None:
    vals = [int(v) for v in zz[ss : se + 1]]
    t = [(abs(v) >> al) for v in vals]
    if not any(t):
        runs.add([])
        return
    runs.flush()
    last = max(i for i, tv in enumerate(t) if tv)
    r = 0
    for i in range(last + 1):
        if t[i] == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_map[0xF0]
            bw.write(code, ln)
            r -= 16
        s = t[i].bit_length()
        code, ln = ac_map[(r << 4) | s]
        bw.write(code, ln)
        amp = t[i] if vals[i] > 0 else -t[i]
        bw.write(amp if amp >= 0 else amp + (1 << s) - 1, s)
        r = 0
    if last < se - ss:  # trailing zeros -> this block ends an EOB run member
        runs.add([])


def _ac_refine_emit(bw, ac_map, runs: _EobRuns, zz: np.ndarray,
                    ss: int, se: int, al: int) -> None:
    # items per position: 'z' zero-history, ('c', bit) correction for an
    # already-significant coef, ('n', sign) newly significant — then emit
    # by simulating the decoder's advance walk so correction bits land in
    # exactly the positions the decoder reads them
    items = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        tv = abs(v) >> al
        if tv == 0:
            items.append(("z",))
        elif tv == 1:
            items.append(("n", 1 if v > 0 else 0))
        else:
            items.append(("c", tv & 1))
    n_positions = [i for i, it in enumerate(items) if it[0] == "n"]
    if not n_positions:
        runs.add([bit for kind, *rest in items if kind == "c" for bit in rest])
        return
    runs.flush()
    last_n = n_positions[-1]
    zeros = 0
    buf: list[int] = []
    for i in range(last_n + 1):
        kind = items[i][0]
        if kind == "z":
            zeros += 1
            if zeros == 16:
                code, ln = ac_map[0xF0]
                bw.write(code, ln)
                for bit in buf:
                    bw.write(bit, 1)
                buf = []
                zeros = 0
        elif kind == "c":
            buf.append(items[i][1])
        else:
            code, ln = ac_map[(zeros << 4) | 1]
            bw.write(code, ln)
            bw.write(items[i][1], 1)
            for bit in buf:
                bw.write(bit, 1)
            buf = []
            zeros = 0
    tail = [it[1] for it in items[last_n + 1 :] if it[0] == "c"]
    if last_n < len(items) - 1:
        runs.add(tail)  # decoder still expects a symbol for the tail


def _encode_progressive(comp_blocks, samp, quant, qid, gray, h, w,
                        n_mcux, n_mcuy) -> bytes:
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    ncomp = len(comp_blocks)

    def enc_map(spec):
        return {v: (c, ln) for v, c, ln in _canonical_codes(*spec)}

    dc_maps = [enc_map(_DC_LUMA)] + [enc_map(_DC_CHROMA)] * (ncomp - 1)
    ac_map = enc_map(_PROG_AC)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for t in range(1 if gray else 2):
        out += seg(0xFFDB, bytes([t]) + bytes(int(x) for x in quant[t].reshape(-1)[_ZZ]))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, qid[ci]])
    out += seg(0xFFC2, bytes(sof))
    out += seg(0xFFC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + bytes(_DC_LUMA[1]))
    if not gray:
        out += seg(0xFFC4, bytes([0x01]) + bytes(_DC_CHROMA[0]) + bytes(_DC_CHROMA[1]))
    out += seg(0xFFC4, bytes([0x10]) + bytes(_PROG_AC[0]) + bytes(_PROG_AC[1]))

    def sos_header(comp_ids, tables, ss, se, ah, al):
        body = bytearray([len(comp_ids)])
        for cid, tb in zip(comp_ids, tables):
            body += bytes([cid, tb])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, bytes(body))

    def scan_grid(ci):
        """Non-interleaved block grid (real data padded to 8, per T.81)."""
        hi, vi = samp[ci]
        return -(-(-(-h * vi // vmax)) // 8), -(-(-(-w * hi // hmax)) // 8)

    # scan 1: DC first, interleaved, Al=1 (arithmetic-shifted diffs)
    bw = _BitWriter()
    pred = [0] * ncomp
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            for ci, (hi, vi) in enumerate(samp):
                for by in range(vi):
                    for bx in range(hi):
                        val = int(comp_blocks[ci][my * vi + by, mx * hi + bx][0]) >> 1
                        diff = val - pred[ci]
                        pred[ci] = val
                        s = _size_cat(diff)
                        code, ln = dc_maps[ci][s]
                        bw.write(code, ln)
                        if s:
                            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += sos_header([ci + 1 for ci in range(ncomp)],
                      [0x00 if ci == 0 else 0x10 for ci in range(ncomp)],
                      0, 0, 0, 1)
    out += bw.out

    # AC bands: comp0 split (exercises spectral selection), others full
    bands = [(0, 1, 5), (0, 6, 63)] + [(ci, 1, 63) for ci in range(1, ncomp)]

    for al in (1,):  # AC first scans at Al=1
        for ci, ss, se in bands:
            bw = _BitWriter()
            runs = _EobRuns(bw, ac_map)
            nby, nbx = scan_grid(ci)
            for by in range(nby):
                for bx in range(nbx):
                    _ac_first_emit(bw, ac_map, runs, comp_blocks[ci][by, bx],
                                   ss, se, al)
            runs.flush()
            bw.flush()
            out += sos_header([ci + 1], [0x00], ss, se, 0, al)
            out += bw.out

    # DC refinement: Ah=1 -> Al=0, raw bits, interleaved
    bw = _BitWriter()
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            for ci, (hi, vi) in enumerate(samp):
                for by in range(vi):
                    for bx in range(hi):
                        bw.write(int(comp_blocks[ci][my * vi + by, mx * hi + bx][0]) & 1, 1)
    bw.flush()
    out += sos_header([ci + 1 for ci in range(ncomp)], [0x00] * ncomp, 0, 0, 1, 0)
    out += bw.out

    # AC refinement: Ah=1 -> Al=0
    for ci, ss, se in bands:
        bw = _BitWriter()
        runs = _EobRuns(bw, ac_map)
        nby, nbx = scan_grid(ci)
        for by in range(nby):
            for bx in range(nbx):
                _ac_refine_emit(bw, ac_map, runs, comp_blocks[ci][by, bx],
                                ss, se, 0)
        runs.flush()
        bw.flush()
        out += sos_header([ci + 1], [0x00], ss, se, 1, 0)
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)
