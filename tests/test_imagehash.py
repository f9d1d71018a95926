"""dq.imagehash — dHash near-dup mining: UDF≡python twin, planted-pair
recall on real encoded images, hot-bucket cap, undecodable-row handling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dq import codecs
from dq.imagehash import (
    dhash_batch,
    dhash_one,
    hamming_near_dups,
    image_dhashes,
    image_near_dups,
    synth_images_neardup,
)

N = 48


@pytest.fixture(scope="module")
def assets(spark):
    df = synth_images_neardup(spark, n=N).cache()
    df.count()
    return df


def test_udf_matches_python_twin(spark, assets):
    """Spark hash column == decode+dhash_one per row, bit-for-bit."""
    got = {r.doc: r.h for r in image_dhashes(assets).collect()}
    raw = {r.asset_id: bytes(r.content) for r in assets.collect()}
    want = {i: dhash_one(codecs.decode_image(b)) for i, b in raw.items()}
    assert got == want


def test_cross_container_dup_is_hamming_zero(assets):
    """Same pixels as PNG and BMP hash identically — the dup byte-level
    dedup cannot see."""
    pairs = {
        (r.id_a, r.id_b): r.hamming for r in image_near_dups(assets).collect()
    }
    for i in range(0, N, 6):
        assert pairs.get((i, N + i)) == 0


def test_patch_edit_recall_and_no_false_positives(assets):
    pairs = {
        (r.id_a, r.id_b): r.hamming for r in image_near_dups(assets).collect()
    }
    planted = {(i, N + i) for i in range(N) if i % 6 in (0, 3)}
    edits = [(i, N + i) for i in range(3, N, 6)]
    # small-patch edits: most land within the radius (corner patch flips
    # at most a couple of gradient signs)
    hit = sum(1 for p in edits if p in pairs)
    assert hit >= len(edits) - 1
    # every surviving non-planted pair is a real low-Hamming collision
    # between distinct bases — none expected on this corpus
    assert set(pairs) <= planted


def test_dhash_grayscale_and_alpha_paths():
    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, size=(20, 30)).astype(np.uint8)
    h1 = dhash_one(gray)
    h2 = dhash_one(gray[:, :, None])          # HxWx1
    rgb = np.stack([gray] * 3, axis=2)
    rgba = np.concatenate([rgb, 255 * np.ones_like(gray)[:, :, None]], axis=2)
    assert h1 == h2 == dhash_one(rgb) == dhash_one(rgba)  # alpha ignored
    assert -(1 << 63) <= h1 < (1 << 63)


def test_undecodable_rows_flow_as_null(spark):
    import pandas as pd

    s = dhash_batch(pd.Series([None, b"not an image", b"\x89PNG\r\n\x1a\ntrunc"]))
    assert list(s.isna()) == [True, True, True]
    df = spark.createDataFrame(
        [(1, bytearray(b"junk"))], "asset_id long, content binary"
    )
    assert image_dhashes(df).count() == 0


def test_hot_bucket_cap_bounds_family_fanout(spark):
    """A planted m-copy identical-hash family exceeds the bucket cap in all
    four chunks and produces ZERO candidate rows (the sha2/byte tier owns
    exact families); distinct hashes nearby still pair."""
    m = 40
    rows = [(i, 0x1234_5678_9ABC_DEF0) for i in range(m)]
    rows += [(1000, 0x7654_3210_0FED_CBA9), (1001, 0x7654_3210_0FED_CBA8)]
    hashes = spark.createDataFrame(rows, "doc long, h long")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_near_dups(hashes, bucket_max_docs=8).collect()
    }
    assert pairs == {(1000, 1001): 1}
    # uncapped: the family explodes into m*(m-1)/2 pairs
    un = hamming_near_dups(hashes, bucket_max_docs=None).count()
    assert un == m * (m - 1) // 2 + 1


def test_binary_never_shuffles(assets):
    plan = (
        image_near_dups(assets)._jdf.queryExecution().executedPlan().toString()
    )
    import re

    for ex in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "content" not in ex
