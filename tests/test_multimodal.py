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


def test_real_decoder_stubbed(spark):
    assets = multimodal.synth_media(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|decoders"):
        multimodal.extract_features(assets, fake=False).collect()


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
    with pytest.raises(Exception, match="NotImplementedError|real decoders"):
        multimodal.resize_images(assets, fake=False).collect()
