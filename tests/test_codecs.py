"""dq.codecs: pure numpy/stdlib PNG/BMP/WAV codecs — roundtrip exactness,
spec-subset rejection, deterministic resample. No Spark in this module."""

import numpy as np
import pytest

from dq import codecs


def _img(h, w, ch, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    return a[:, :, 0] if ch == 1 else a


# ---- PNG --------------------------------------------------------------------


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip_all_filters_and_colors(filter_type, ch):
    """Every scanline filter x every supported color type roundtrips the
    pixel array bit-exactly (the decoder's five unfilter paths are each
    exercised against the encoder's matching filter)."""
    arr = _img(11, 7, ch, seed=filter_type * 10 + ch)
    out = codecs.decode_png(codecs.encode_png(arr, filter_type=filter_type))
    assert out.dtype == np.uint8 and out.shape == arr.shape
    assert (out == arr).all()


def test_png_one_pixel_and_one_row_edges():
    for shape in [(1, 1, 3), (1, 9, 3), (9, 1, 3)]:
        arr = _img(*shape, seed=3)
        for ft in range(5):
            assert (codecs.decode_png(codecs.encode_png(arr, ft)) == arr).all()


def test_png_decoder_parses_header_synth_prefix():
    """dq.multimodal.png_header emits the same IHDR layout the full encoder
    does — the sniffer corpus and the codec agree on the byte layout."""
    from dq.multimodal import png_header

    full = codecs.encode_png(_img(480, 640, 4, seed=1))
    assert full[:33] == png_header(640, 480)


def test_png_rejects_corruption_and_unsupported():
    arr = _img(6, 5, 3)
    good = bytearray(codecs.encode_png(arr))
    with pytest.raises(codecs.MediaDecodeError, match="magic"):
        codecs.decode_png(b"\x00" + bytes(good[1:]))
    flipped = bytearray(good)
    flipped[40] ^= 0xFF  # inside IDAT/IHDR body -> CRC mismatch
    with pytest.raises(codecs.MediaDecodeError, match="CRC|truncated|inflate"):
        codecs.decode_png(bytes(flipped))
    with pytest.raises(codecs.MediaDecodeError, match="truncated|missing|IDAT"):
        codecs.decode_png(bytes(good[: len(good) // 2]))
    # 16-bit depth is outside the subset -> explicit rejection, never garbage
    import struct
    import zlib

    ihdr = struct.pack(">II5B", 5, 6, 16, 2, 0, 0, 0)
    hdr16 = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    with pytest.raises(codecs.MediaDecodeError, match="unsupported"):
        codecs.decode_png(hdr16)


# ---- BMP --------------------------------------------------------------------


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])  # every row-padding residue
def test_bmp_roundtrip_padding_widths(w):
    arr = _img(5, w, 3, seed=w)
    out = codecs.decode_bmp(codecs.encode_bmp(arr))
    assert (out == arr).all()


def test_bmp_rejects_non_subset():
    with pytest.raises(codecs.MediaDecodeError, match="magic|truncated"):
        codecs.decode_bmp(b"BM" + b"\x00" * 10)
    good = bytearray(codecs.encode_bmp(_img(4, 4, 3)))
    good[28] = 8  # bpp=8 (palette) is outside the subset
    with pytest.raises(codecs.MediaDecodeError, match="unsupported"):
        codecs.decode_bmp(bytes(good))


def test_bmp_sniffer_geometry_matches_codec():
    from dq.multimodal import sniff_header_one

    arr = _img(9, 13, 3)
    got = sniff_header_one(codecs.encode_bmp(arr))
    assert (got["sniffed_format"], got["width"], got["height"]) == ("bmp", 13, 9)


# ---- WAV --------------------------------------------------------------------


@pytest.mark.parametrize("ch", [1, 2, 4])
def test_wav_roundtrip(ch):
    rng = np.random.RandomState(ch)
    samples = rng.randint(-(2**15), 2**15, size=(321, ch)).astype(np.int16)
    rate, out = codecs.decode_wav(codecs.encode_wav(samples, 16000))
    assert rate == 16000 and out.shape == (321, ch)
    assert (out == samples).all()


def test_wav_mono_1d_input_roundtrips_as_one_channel():
    samples = np.arange(-50, 50, dtype=np.int16)
    rate, out = codecs.decode_wav(codecs.encode_wav(samples, 8000))
    assert out.shape == (100, 1) and (out[:, 0] == samples).all()


def test_wav_rejects_non_pcm16():
    samples = np.zeros(8, dtype=np.int16)
    good = bytearray(codecs.encode_wav(samples, 8000))
    bad = bytearray(good)
    bad[20] = 3  # IEEE float format code
    with pytest.raises(codecs.MediaDecodeError, match="non-PCM"):
        codecs.decode_wav(bytes(bad))
    bad = bytearray(good)
    bad[34] = 8  # 8-bit depth
    with pytest.raises(codecs.MediaDecodeError, match="bit depth"):
        codecs.decode_wav(bytes(bad))
    with pytest.raises(codecs.MediaDecodeError, match="magic"):
        codecs.decode_wav(b"RIFFxxxxWAVX")


def test_wav_header_matches_sniffer():
    from dq.multimodal import sniff_header_one

    b = codecs.encode_wav(np.zeros((10, 2), dtype=np.int16), 44100)
    got = sniff_header_one(b)
    assert (got["sniffed_format"], got["channels"], got["sample_rate_hz"]) == (
        "wav", 2, 44100,
    )


# ---- resample ---------------------------------------------------------------


def test_resize_nearest_floor_map_and_identity():
    arr = _img(8, 12, 3, seed=9)
    assert (codecs.resize_nearest(arr, 12, 8) == arr).all()  # identity dims
    small = codecs.resize_nearest(arr, 3, 2)
    assert small.shape == (2, 3, 3)
    # the floor map is the spec: out[i,j] == in[(i*h)//oh, (j*w)//ow]
    for i in range(2):
        for j in range(3):
            assert (small[i, j] == arr[(i * 8) // 2, (j * 12) // 3]).all()
    with pytest.raises(ValueError):
        codecs.resize_nearest(arr, 0, 2)


def test_resize_then_encode_is_deterministic():
    arr = _img(20, 30, 3, seed=4)
    a = codecs.encode_png(codecs.resize_nearest(arr, 10, 7))
    b = codecs.encode_png(codecs.resize_nearest(arr, 10, 7))
    assert a == b


# ---- feature extractors over decoded media ----------------------------------


def test_image_feature_reflects_pixels_not_bytes():
    """The real feature is a function of decoded PIXELS: two encodings of
    the SAME pixels (different scanline filters -> different bytes) give
    the identical feature, while different pixels differ. The fake tier is
    byte-driven and therefore splits the re-encodings — the observable
    real-vs-fake distinction."""
    from dq.multimodal import _decode_real, _fake_feature, image_feature

    arr = _img(10, 10, 3, seed=5)
    b0, b1 = codecs.encode_png(arr, 0), codecs.encode_png(arr, 4)
    assert b0 != b1
    assert _decode_real(b0, "image") == _decode_real(b1, "image")
    assert _decode_real(b0, "image") == image_feature(arr)
    assert _fake_feature(b0) != _fake_feature(b1)
    other = _img(10, 10, 3, seed=6)
    assert _decode_real(codecs.encode_png(other), "image") != image_feature(arr)


def test_audio_feature_from_decoded_samples():
    from dq.multimodal import FEATURE_DIM, _decode_real, audio_feature

    rng = np.random.RandomState(11)
    samples = rng.randint(-9000, 9000, size=(400, 2)).astype(np.int16)
    feat = _decode_real(codecs.encode_wav(samples, 16000), "audio")
    assert len(feat) == FEATURE_DIM
    assert feat == audio_feature(samples)
    norm = float(np.linalg.norm(np.array(feat, dtype=np.float32)))
    assert norm == pytest.approx(1.0, abs=1e-5)


def test_decode_real_dispatch_and_honest_boundary():
    from dq.multimodal import _decode_real

    # a JPEG magic now routes to the REAL baseline decoder: corrupt bytes
    # under a supported magic are MediaDecodeError, not NotImplementedError
    with pytest.raises(codecs.MediaDecodeError):
        _decode_real(b"\xff\xd8\xff\xe0 jpeg-ish", "image")
    with pytest.raises(NotImplementedError, match="codec libraries"):
        _decode_real(b"random opus payload", "audio")
    with pytest.raises(codecs.MediaDecodeError):
        from dq.multimodal import png_header

        _decode_real(png_header(4, 4) + b"garbage-not-idat", "image")


# ---- GIF --------------------------------------------------------------------


def test_gif_roundtrip_palette_exact():
    """GIF is lossless on palette indices: decode returns exactly
    palette[indices] for noisy and structured content."""
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
    idx = rng.randint(0, 256, size=(45, 37)).astype(np.uint8)
    out = codecs.decode_gif(codecs.encode_gif(idx, pal))
    assert out.dtype == np.uint8 and out.shape == (45, 37, 3)
    assert (out == pal[idx]).all()


def test_gif_lzw_width_growth_and_clear_resets():
    """>4096 dictionary entries force width growth to 12 bits and dict-full
    CLEAR resets; structured content also compresses (LZW is real, not a
    literal-only emitter)."""
    idx = ((np.arange(300)[:, None] * 7 + np.arange(400)[None, :]) % 64).astype(np.uint8)
    pal = (np.arange(64 * 3).reshape(64, 3) % 256).astype(np.uint8)
    b = codecs.encode_gif(idx, pal)
    assert (codecs.decode_gif(b) == pal[idx]).all()
    assert len(b) < idx.size // 4  # genuine compression on structured input
    noisy = np.random.RandomState(3).randint(0, 256, size=(200, 300)).astype(np.uint8)
    pal256 = np.random.RandomState(4).randint(0, 256, size=(256, 3)).astype(np.uint8)
    assert (codecs.decode_gif(codecs.encode_gif(noisy, pal256)) == pal256[noisy]).all()


def test_gif_kwkwk_runs_and_small_palettes():
    """Long identical runs hit the KwKwK code-equals-next-entry case; a
    2-color palette uses the minimum code size floor (mcs=2)."""
    idx = np.zeros((20, 50), dtype=np.uint8)
    idx[5:, :] = 1
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    assert (codecs.decode_gif(codecs.encode_gif(idx, pal)) == pal[idx]).all()


def test_gif_rejects_non_subset():
    with pytest.raises(codecs.MediaDecodeError, match="magic"):
        codecs.decode_gif(b"NOPE")
    with pytest.raises(codecs.MediaDecodeError, match="truncated"):
        codecs.decode_gif(b"GIF89a" + b"\x00" * 4)
    good = bytearray(codecs.encode_gif(
        np.zeros((4, 4), dtype=np.uint8), np.zeros((4, 3), dtype=np.uint8)))
    # flip the interlace bit in the image descriptor's packed byte
    desc = good.index(0x2C, 13)
    flipped = bytearray(good)
    flipped[desc + 9] |= 0x40
    with pytest.raises(codecs.MediaDecodeError, match="interlaced"):
        codecs.decode_gif(bytes(flipped))
    with pytest.raises(ValueError, match="palette"):
        codecs.encode_gif(np.zeros((2, 2), dtype=np.uint8),
                          np.zeros((300, 3), dtype=np.uint8))


def _pal32():
    return (np.arange(32)[:, None] * np.array([11, 5, 3])[None, :] % 256).astype(np.uint8)


def test_gif_anim_full_frame_roundtrip():
    """Full-screen frames with no transparency composite to exactly
    palette[frame] per frame; decode_gif stays the first composited frame."""
    pal = _pal32()
    frames = [((np.arange(10)[:, None] + np.arange(14)[None, :] + 5 * f) % 32
               ).astype(np.uint8) for f in range(4)]
    b = codecs.encode_gif_anim(frames, pal, delay_cs=4)
    out = codecs.decode_gif_frames(b)
    assert len(out) == 4
    for f, o in zip(frames, out):
        assert (o == pal[f]).all()
    assert (codecs.decode_gif(b) == pal[frames[0]]).all()


def test_gif_anim_offsets_transparency_disposal():
    """Partial-rect frames composite at their offsets; GCE transparency
    keeps underlying pixels; disposal 2 restores the rect to background
    for the NEXT frame; disposal 3 is rejected, never misrendered."""
    pal = _pal32()
    f1 = np.full((12, 16), 3, dtype=np.uint8)
    f2 = np.full((4, 6), 7, dtype=np.uint8)
    f2[1:3, 2:4] = 0  # transparent holes
    b = codecs.encode_gif_anim([f1, f2], pal, offsets=[(0, 0), (5, 4)],
                               screen_wh=(16, 12), transparent=0)
    o = codecs.decode_gif_frames(b)
    exp2 = pal[f1].copy()
    region = exp2[4:8, 5:11]
    mask = f2 != 0
    region[mask] = pal[f2][mask]
    assert (o[1] == exp2).all()
    # disposal 2: rect returns to the background color before frame 3
    f3 = np.full((3, 3), 9, dtype=np.uint8)
    b3 = codecs.encode_gif_anim([f1, f3, f3], pal,
                                offsets=[(0, 0), (2, 2), (10, 8)],
                                screen_wh=(16, 12), disposals=[0, 2, 0])
    o3 = codecs.decode_gif_frames(b3)
    exp_last = pal[f1].copy()
    exp_last[2:5, 2:5] = pal[0]
    exp_last[8:11, 10:13] = pal[f3]
    assert (o3[2] == exp_last).all()
    raw = bytearray(b3)
    i = bytes(raw).find(b"\x21\xf9\x04")
    raw[i + 3] = (raw[i + 3] & ~0x1C) | (3 << 2)
    with pytest.raises(codecs.MediaDecodeError, match="restore-previous"):
        codecs.decode_gif_frames(bytes(raw))


# ---- JPEG -------------------------------------------------------------------


def _gradient_rgb(h, w):
    return np.clip(
        np.arange(h)[:, None, None] * 2.5
        + np.arange(w)[None, :, None] * 1.5
        + np.array([10, 60, 120])[None, None, :],
        0, 255,
    ).astype(np.uint8)


def test_jpeg_uniform_gray_quality100_exact():
    """All-ones quant tables + a DC-only spectrum make every step integer-
    safe: uniform grayscale roundtrips bit-exactly at quality 100."""
    for val in (0, 1, 128, 137, 255):
        u = np.full((24, 17), val, dtype=np.uint8)
        out = codecs.decode_jpeg(codecs.encode_jpeg(u, quality=100))
        assert out.shape == u.shape and (out == u).all()


def test_jpeg_smooth_gray_bounded_error():
    g = np.clip(np.arange(40)[:, None] * 2.5 + np.arange(56)[None, :] * 1.5,
                0, 255).astype(np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(g, quality=95))
    assert int(np.abs(out.astype(int) - g.astype(int)).max()) <= 4


@pytest.mark.parametrize("subsampling", ["444", "420", "422"])
def test_jpeg_color_roundtrip_bounded_error(subsampling):
    """Color roundtrips within normal quantization error across all three
    sampling layouts, on odd (non-multiple-of-8/16) dims."""
    base = _gradient_rgb(33, 29)
    out = codecs.decode_jpeg(codecs.encode_jpeg(base, quality=90,
                                                subsampling=subsampling))
    assert out.shape == base.shape
    d = np.abs(out.astype(int) - base.astype(int))
    assert int(d.max()) <= 20 and float(d.mean()) <= 3.0


def test_jpeg_restart_markers_roundtrip():
    base = _gradient_rgb(33, 29)
    b = codecs.encode_jpeg(base, quality=90, subsampling="420",
                           restart_interval=2)
    assert b"\xff\xdd" in b and b"\xff\xd0" in b  # DRI segment + RST0
    d = np.abs(codecs.decode_jpeg(b).astype(int) - base.astype(int))
    assert int(d.max()) <= 20


def test_jpeg_deterministic_bytes_and_features():
    """Encoding is byte-deterministic (the synth corpus contract) and the
    decoded pixels drive image_feature identically across calls."""
    from dq.multimodal import image_feature

    base = _gradient_rgb(20, 22)
    b1, b2 = codecs.encode_jpeg(base), codecs.encode_jpeg(base)
    assert b1 == b2
    assert image_feature(codecs.decode_jpeg(b1)) == image_feature(codecs.decode_jpeg(b2))


def test_jpeg_rejects_non_subset():
    good = bytearray(codecs.encode_jpeg(np.full((9, 9), 7, dtype=np.uint8)))
    with pytest.raises(codecs.MediaDecodeError, match="SOI"):
        codecs.decode_jpeg(b"\x00" + bytes(good[1:]))
    # SOF2 is now a SUPPORTED format, so a baseline-shaped scan relabeled
    # progressive dies on the scan-shape check, not the SOF marker
    sof = bytes(good).find(b"\xff\xc0")
    prog = bytearray(good)
    prog[sof + 1] = 0xC2
    with pytest.raises(codecs.MediaDecodeError, match="progressive scan"):
        codecs.decode_jpeg(bytes(prog))
    # arithmetic-coded sequential (SOF9) stays out of scope
    arith = bytearray(good)
    arith[sof + 1] = 0xC9
    with pytest.raises(codecs.MediaDecodeError, match="SOF0.*SOF2|unsupported SOF"):
        codecs.decode_jpeg(bytes(arith))
    with pytest.raises(codecs.MediaDecodeError, match="truncated"):
        codecs.decode_jpeg(bytes(good[: len(good) // 3]))


@pytest.mark.parametrize("subsampling", ["444", "420", "422"])
def test_jpeg_progressive_equals_baseline_pixels(subsampling):
    """The progressive scan script (SA DC Al=1->0, spectral-selection AC
    bands at Al=1 then refinement to Al=0) transmits the SAME quantized
    coefficients as the baseline form — decode of the two encodings must be
    pixel-identical on every input, including noisy content (dense
    refinement correction bits) and near-empty content (multi-block EOB
    runs)."""
    rng = np.random.RandomState(5)
    corpora = [
        _gradient_rgb(33, 29),
        rng.randint(0, 256, size=(24, 31, 3)).astype(np.uint8),
    ]
    for base in corpora:
        b0 = codecs.decode_jpeg(codecs.encode_jpeg(base, quality=80,
                                                   subsampling=subsampling))
        b1 = codecs.decode_jpeg(codecs.encode_jpeg(base, quality=80,
                                                   subsampling=subsampling,
                                                   progressive=True))
        assert (b0 == b1).all()


def test_jpeg_progressive_gray_and_eob_runs():
    sparse = np.zeros((64, 64), dtype=np.uint8)
    sparse[30, 30] = 255
    for img in (sparse,
                np.clip(np.arange(40)[:, None] * 2.5
                        + np.arange(56)[None, :] * 1.5, 0, 255).astype(np.uint8)):
        b0 = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90))
        prog = codecs.encode_jpeg(img, quality=90, progressive=True)
        assert b"\xff\xc2" in prog  # SOF2 actually emitted
        assert (codecs.decode_jpeg(prog) == b0).all()


def test_jpeg_progressive_rejects_out_of_sequence_refinement():
    """A refinement scan with Ah != Al+1 is out of SA sequence (T.81 G.1)
    and must be rejected, not silently misdecoded."""
    good = bytearray(codecs.encode_jpeg(np.full((9, 9), 7, dtype=np.uint8),
                                        progressive=True))
    # find the DC refinement SOS (Ss=0, Se=0, Ah=1, Al=0) and corrupt Ah
    i = 0
    while True:
        i = bytes(good).find(b"\xff\xda", i + 1)
        assert i > 0
        ln = int.from_bytes(good[i + 2 : i + 4], "big")
        ns = good[i + 4]
        ss, se, a = good[i + 5 + 2 * ns : i + 8 + 2 * ns]
        if ss == 0 and a >> 4 == 1:
            good[i + 7 + 2 * ns] = 0x30  # Ah=3, Al=0: skips two levels
            break
    with pytest.raises(codecs.MediaDecodeError, match="out of sequence"):
        codecs.decode_jpeg(bytes(good))


def test_gif_jpeg_sniffer_geometry_matches_codec():
    """The header sniffer's GIF/JPEG geometry equals the real decoder's
    pixel-array shape (the same cross-check PNG/BMP already have)."""
    from dq.multimodal import sniff_header_one

    pal = np.array([[0, 0, 0], [9, 9, 9]], dtype=np.uint8)
    gif = codecs.encode_gif((np.arange(77).reshape(7, 11) % 2).astype(np.uint8), pal)
    s = sniff_header_one(gif)
    assert (s["sniffed_format"], s["width"], s["height"]) == ("gif", 11, 7)
    assert codecs.decode_gif(gif).shape == (7, 11, 3)
    jpg = codecs.encode_jpeg(_gradient_rgb(13, 19), subsampling="420")
    s = sniff_header_one(jpg)
    assert (s["sniffed_format"], s["width"], s["height"]) == ("jpeg", 19, 13)
    assert codecs.decode_jpeg(jpg).shape == (13, 19, 3)


def test_decode_image_dispatch_covers_all_four_containers():
    """codecs.decode_image routes by magic to every real image decoder and
    rejects unknown containers with NotImplementedError."""
    rgb = _gradient_rgb(10, 12)
    pal = np.array([[0, 0, 0], [200, 10, 10]], dtype=np.uint8)
    idx = (np.arange(120).reshape(10, 12) % 2).astype(np.uint8)
    assert (codecs.decode_image(codecs.encode_png(rgb)) == rgb).all()
    assert (codecs.decode_image(codecs.encode_bmp(rgb)) == rgb).all()
    assert (codecs.decode_image(codecs.encode_gif(idx, pal)) == pal[idx]).all()
    assert codecs.decode_image(codecs.encode_jpeg(rgb)).shape == rgb.shape
    with pytest.raises(NotImplementedError, match="image container"):
        codecs.decode_image(b"II*\x00 tiff-ish")
