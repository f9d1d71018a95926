"""Multimodal plumbing: schema, determinism, stubbed decoders."""

import pytest

from dq import multimodal


def test_synth_deterministic(spark):
    a = multimodal.synth_media(spark, n=16).toPandas()
    b = multimodal.synth_media(spark, n=16).toPandas()
    assert (a["asset_id"] == b["asset_id"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["content"], b["content"]))


def test_fake_features_shape_and_determinism(spark):
    assets = multimodal.synth_media(spark, n=12)
    f1 = multimodal.extract_features(assets, fake=True).toPandas().sort_values("asset_id")
    f2 = multimodal.extract_features(assets, fake=True).toPandas().sort_values("asset_id")
    assert (f1["sha256"].values == f2["sha256"].values).all()
    assert all(len(v) == multimodal.FEATURE_DIM for v in f1["feature"])
    assert (f1["n_bytes"] > 0).all()


def test_real_decode_raises_on_undecodable_corpus(spark):
    """The opaque synth corpus (png-header+garbage images, opus, av1) must
    FAIL loudly under fake=False — truncated PNGs are MediaDecodeError,
    opus/av1 NotImplementedError — never silently hash-featurized."""
    assets = multimodal.synth_media(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|MediaDecodeError|decoder"):
        multimodal.extract_features(assets, fake=False).collect()


def test_real_decode_end_to_end_over_decodable_corpus(spark):
    """fake=False over synth_media_decodable runs the REAL codecs in the
    Arrow workers end-to-end: deterministic, unit-norm features, and for a
    planted PNG the Spark-side feature equals the local decode+featurize
    oracle (UDF body == test oracle, CLAUDE.md invariant)."""
    import numpy as np

    from dq import codecs
    from dq.multimodal import FEATURE_DIM, image_feature

    assets = multimodal.synth_media_decodable(spark, n=18)
    f1 = multimodal.extract_features(assets, fake=False).toPandas().sort_values("asset_id")
    f2 = multimodal.extract_features(assets, fake=False).toPandas().sort_values("asset_id")
    assert len(f1) == 18
    assert (f1["sha256"].values == f2["sha256"].values).all()
    for v in f1["feature"]:
        assert len(v) == FEATURE_DIM
        assert float(np.linalg.norm(np.array(v, dtype=np.float32))) == pytest.approx(
            1.0, abs=1e-5
        )
    # local oracle for asset 0 (a PNG)
    content = bytes(assets.toPandas().set_index("asset_id").loc[0, "content"])
    want = image_feature(codecs.decode_png(content))
    got = list(f1.set_index("asset_id").loc[0, "feature"])
    assert got == pytest.approx(want, abs=1e-6)


def test_real_resize_decodes_and_resamples(spark):
    """fake=False resize decodes PNG/BMP/GIF/JPEG pixels, floor-resamples,
    and digests the re-encoded PNG — equal to the local codec oracle."""
    import hashlib

    from dq import codecs

    assets = multimodal.synth_media_decodable(spark, n=12)
    out = {
        r.asset_id: r
        for r in multimodal.resize_images(assets, max_side=8, fake=False).collect()
    }
    pdf = assets.toPandas().set_index("asset_id")
    imgs = pdf[pdf["media_type"] == "image"]
    assert set(out) == set(imgs.index)
    # the 5-kind cycle puts all four image containers in a 12-asset corpus
    assert {bytes(c)[:2] for c in imgs["content"]} >= {b"\x89P", b"BM", b"GI", b"\xff\xd8"}
    for aid, row in imgs.iterrows():
        arr = codecs.decode_image(bytes(row["content"]))
        r = out[aid]
        assert (r.width, r.height) == (arr.shape[1], arr.shape[0])
        assert max(r.out_width, r.out_height) <= 8
        want = hashlib.sha256(
            codecs.encode_png(codecs.resize_nearest(arr, r.out_width, r.out_height))
        ).hexdigest()
        assert r.resized_sha256 == want


def test_real_frame_sampling_decodes_animated_gif(spark):
    """fake=False frame sampling multi-frame-decodes the animated-GIF
    video assets in the Arrow workers: one row per composited frame, the
    Spark-side pixel digest equals the local codec oracle, and the frame
    count matches the synth encoder's script (3 + i%3)."""
    import hashlib

    from dq import codecs

    assets = multimodal.synth_media_decodable(spark, n=12)
    frames = multimodal.sample_frames(assets, fake=False).toPandas()
    pdf = assets.toPandas().set_index("asset_id")
    vids = pdf[pdf["media_type"] == "video"]
    assert len(vids) == 2 and set(frames["asset_id"]) == set(vids.index)
    for aid, row in vids.iterrows():
        local = codecs.decode_gif_frames(bytes(row["content"]))
        got = frames[frames["asset_id"] == aid].sort_values("frame_index")
        assert list(got["frame_index"]) == list(range(len(local)))
        assert len(local) == 3 + aid % 3
        want = [hashlib.sha256(f.tobytes()).hexdigest() for f in local]
        assert list(got["frame_sha256"]) == want


def test_frame_sampling_video_only(spark):
    assets = multimodal.synth_media(spark, n=12)
    frames = multimodal.sample_frames(assets, fake=True).toPandas()
    kinds = assets.toPandas().set_index("asset_id")["media_type"]
    assert (kinds.loc[frames["asset_id"].unique()] == "video").all()
    per_asset = frames.groupby("asset_id")["frame_index"].apply(list)
    for idxs in per_asset:
        assert idxs == list(range(len(idxs)))


def test_resize_images_geometry_and_determinism(spark):
    """Aspect ratio preserved, long side clamped, never upscaled; the fake
    resized digest is deterministic; the real path stays stubbed."""
    import pytest

    from dq import multimodal

    assets = multimodal.synth_media(spark, n=12)
    out = {r.asset_id: r for r in multimodal.resize_images(assets, max_side=100, fake=True).collect()}
    assert out  # images only (every 3rd synth asset)
    for r in out.values():
        assert max(r.out_width, r.out_height) <= 100
        assert r.out_width >= 1 and r.out_height >= 1
        # 640x480 -> 100x75 exactly (integer floor of the aspect ratio)
        assert (r.width, r.height) == (640, 480)
        assert (r.out_width, r.out_height) == (100, 75)
    again = {r.asset_id: r.resized_sha256
             for r in multimodal.resize_images(assets, max_side=100, fake=True).collect()}
    assert again == {k: v.resized_sha256 for k, v in out.items()}
    # small images are NOT upscaled
    small = {r.asset_id: r for r in multimodal.resize_images(assets, max_side=2000, fake=True).collect()}
    assert all((r.out_width, r.out_height) == (640, 480) for r in small.values())
    # opaque-corpus images are truncated PNGs: real resize fails loudly
    with pytest.raises(Exception, match="MediaDecodeError|NotImplementedError|decod"):
        multimodal.resize_images(assets, fake=False).collect()


def test_sniff_header_one_parses_real_containers():
    """Pure-function oracle: spec-valid PNG/JPEG/GIF/WAV headers parse to
    their true geometry/audio params; garbage and truncated bytes are
    all-None, never an exception."""
    from dq.multimodal import png_header, sniff_header_one

    png = sniff_header_one(png_header(640, 480) + b"\x00" * 32)
    assert (png["sniffed_format"], png["width"], png["height"]) == ("png", 640, 480)

    # JPEG: SOI + APP0 (empty) + SOF0 for a 1-component 320x200 frame
    jpeg_bytes = (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x04\x00\x00"
        + b"\xff\xc0\x00\x0b\x08" + (200).to_bytes(2, "big")
        + (320).to_bytes(2, "big") + b"\x01\x11\x00\x00"
    )
    jpeg = sniff_header_one(jpeg_bytes)
    assert (jpeg["sniffed_format"], jpeg["width"], jpeg["height"]) == ("jpeg", 320, 200)

    gif = sniff_header_one(
        b"GIF89a" + (13).to_bytes(2, "little") + (11).to_bytes(2, "little") + b"\x00" * 8
    )
    assert (gif["sniffed_format"], gif["width"], gif["height"]) == ("gif", 13, 11)

    wav_bytes = (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")          # PCM
        + (2).to_bytes(2, "little")          # channels
        + (44100).to_bytes(4, "little")      # sample rate
        + (176400).to_bytes(4, "little") + (4).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    wav = sniff_header_one(wav_bytes)
    assert (wav["sniffed_format"], wav["channels"], wav["sample_rate_hz"]) == ("wav", 2, 44100)

    for junk in (None, b"", b"\x00\x01\x02", b"\x89PNG\r\n\x1a\n" + b"\x00" * 4):
        assert sniff_header_one(junk)["sniffed_format"] is None


def test_sniff_headers_over_synth_assets(spark):
    """Synth image payloads carry a REAL PNG header: every image sniffs as
    png 640x480 with format_ok TRUE; opus/av1 have no parser here, so they
    sniff as None with format_ok NULL (unverifiable, not wrong)."""
    from dq import multimodal

    rows = multimodal.sniff_headers(multimodal.synth_media(spark, n=24)).collect()
    assert len(rows) == 24
    for r in rows:
        if r.media_type == "image":
            assert (r.sniffed_format, r.width, r.height) == ("png", 640, 480)
            assert r.format_ok is True
        else:
            assert r.sniffed_format is None and r.format_ok is None


def test_sniff_headers_flags_mislabeled_asset(spark):
    """A GIF payload DECLARED as png gets format_ok FALSE — the mislabel
    verdict the operator exists for."""
    from dq.multimodal import sniff_headers
    from dq.schema import MEDIA_ASSETS

    gif_bytes = (
        b"GIF89a" + (5).to_bytes(2, "little") + (7).to_bytes(2, "little") + b"\x00" * 16
    )
    df = spark.createDataFrame(
        [(1, "u://x", "image", bytearray(gif_bytes), 5, 7, None, "png")],
        schema=MEDIA_ASSETS,
    )
    r = sniff_headers(df).collect()[0]
    assert r.sniffed_format == "gif" and r.declared_codec == "png"
    assert r.format_ok is False
    assert (r.width, r.height) == (5, 7)
