"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema (dq.schema.MEDIA_ASSETS),
deterministic synthesis, Arrow-batched ``mapInPandas`` operators with
explicit output schemas, partition-preserving shapes. The actual codec work
(image decode, audio resample, video frame extraction) requires libraries
not present in this container, so each decoder is STUBBED: by default it
raises NotImplementedError; with ``fake=True`` it produces a deterministic
hash-derived feature so the full pipeline is testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from dq.schema import MEDIA_ASSETS

FEATURE_DIM = 16

_FEATURES_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, sha256 string, "
    "feature array<float>"
)
_FRAMES_SCHEMA = "asset_id long, frame_index int, frame_sha256 string"


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake assets (binary payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128 + int(rng.randint(0, 512)))
        rows.append(
            (
                i,
                f"https://media.example.com/{kind}/{i}",
                kind,
                bytearray(payload),
                640 if kind == "image" else None,
                480 if kind == "image" else None,
                int(rng.randint(1000, 60000)) if kind != "image" else None,
                {"image": "png", "audio": "opus", "video": "av1"}[kind],
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_ASSETS)


def _decode_real(content: bytes, media_type: str):
    raise NotImplementedError(
        "real decoders (PIL/libav) are not available in this container; "
        "pass fake=True for the deterministic stand-in"
    )


def _fake_feature(content: bytes) -> list[float]:
    """Deterministic unit-norm feature from the payload digest."""
    digest = hashlib.sha256(content).digest()
    v = np.frombuffer(digest[:FEATURE_DIM * 2], dtype=np.uint8)[:FEATURE_DIM].astype(np.float32)
    v = v - v.mean()
    n = float(np.linalg.norm(v))
    return (v / n if n else v).tolist()


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas operator: binary -> (digest, feature vector).

    Batch shape: iterator of Arrow record batches; per-batch vectorized
    digesting; output schema fixed so downstream plans are stable.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # content is nullable (MEDIA_ASSETS): a NULL payload must yield
            # a zero-byte row, not a task-killing TypeError in the worker
            content = pdf["content"].map(lambda b: b if b is not None else b"")
            feats = [
                _fake_feature(c) if fake else _decode_real(c, m)
                for c, m in zip(content, pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(len).astype("int64"),
                    "sha256": content.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": feats,
                }
            )

    return df.mapInPandas(op, schema=_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, fake: bool = False) -> DataFrame:
    """mapInPandas operator: video 'frame sampling' plumbing.

    Real impl would demux + decode keyframes; the fake samples the payload
    every ``every_n_bytes`` and emits per-frame digests (1 row per frame —
    an exploding operator, so its output schema carries the frame index).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_sha = [], [], []
            for aid, content, mtype in zip(pdf["asset_id"], pdf["content"], pdf["media_type"]):
                if mtype != "video" or content is None:
                    continue
                if not fake:
                    _decode_real(content, mtype)
                for k, off in enumerate(range(0, len(content), every_n_bytes)):
                    chunk = bytes(content[off : off + every_n_bytes])
                    out_ids.append(aid)
                    out_idx.append(k)
                    out_sha.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {"asset_id": pd.Series(out_ids, dtype="int64"),
                 "frame_index": pd.Series(out_idx, dtype="int32"),
                 "frame_sha256": pd.Series(out_sha, dtype="object")}
            )

    return df.mapInPandas(op, schema=_FRAMES_SCHEMA)


_RESIZE_SCHEMA = (
    "asset_id long, width int, height int, out_width int, out_height int, "
    "resized_sha256 string"
)


def resize_images(df: DataFrame, max_side: int = 256, fake: bool = False) -> DataFrame:
    """mapInPandas operator: image 'resize' plumbing (the third leg of the
    decode / feature-extract / resize / frame-sample family).

    Real impl decodes and resamples pixels (PIL — absent here, stubbed);
    the geometry is REAL either way: the output dims preserve aspect ratio
    with the long side clamped to ``max_side`` (integer floor, never
    upscaled), which is the contract a training-prep resize must honor.
    The fake 'resized payload' is a deterministic digest of
    (payload, out_w, out_h) so downstream dedup over resized assets is
    exercisable. Non-image rows are dropped (filtering operator — the
    output schema carries no media_type)."""

    def _out_dims(w: int, h: int) -> tuple[int, int]:
        long_side = max(w, h)
        if long_side <= max_side:
            return w, h
        if w >= h:
            return max_side, max(1, (h * max_side) // w)
        return max(1, (w * max_side) // h), max_side

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("asset_id", "width", "height", "out_width", "out_height",
                     "resized_sha256")}
            for aid, content, mtype, w, h in zip(
                pdf["asset_id"], pdf["content"], pdf["media_type"],
                pdf["width"], pdf["height"],
            ):
                if mtype != "image" or content is None or pd.isna(w) or pd.isna(h):
                    continue
                if not fake:
                    _decode_real(content, mtype)
                ow, oh = _out_dims(int(w), int(h))
                digest = hashlib.sha256(
                    bytes(content) + ow.to_bytes(4, "big") + oh.to_bytes(4, "big")
                ).hexdigest()
                rows["asset_id"].append(aid)
                rows["width"].append(int(w))
                rows["height"].append(int(h))
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["resized_sha256"].append(digest)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(rows["asset_id"], dtype="int64"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "out_width": pd.Series(rows["out_width"], dtype="int32"),
                    "out_height": pd.Series(rows["out_height"], dtype="int32"),
                    "resized_sha256": pd.Series(rows["resized_sha256"], dtype="object"),
                }
            )

    return df.mapInPandas(op, schema=_RESIZE_SCHEMA)
