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

    with pytest.raises(NotImplementedError, match="codec libraries"):
        _decode_real(b"\xff\xd8\xff\xe0 jpeg-ish", "image")
    with pytest.raises(NotImplementedError, match="codec libraries"):
        _decode_real(b"random opus payload", "audio")
    with pytest.raises(codecs.MediaDecodeError):
        from dq.multimodal import png_header

        _decode_real(png_header(4, 4) + b"garbage-not-idat", "image")
