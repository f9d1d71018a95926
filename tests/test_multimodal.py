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
