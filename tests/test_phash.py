"""Perceptual image hashing + Hamming-banded near-dup pairs."""

from __future__ import annotations

import numpy as np
import pytest

from knightshift_spark.operators.media_codecs import (
    encode_ppm,
    phash64,
    resize_bilinear,
)


def _img(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    """Deterministic structured test image (gradients + blobs — pHash on
    pure iid noise is meaningless; real images have low-freq structure)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (
        128
        + 60 * np.sin(x / (6 + seed % 5))
        + 50 * np.cos(y / (4 + seed % 3))
        + rng.normal(0, 6, (h, w))
    )
    img = np.stack([base, np.roll(base, seed % 7, axis=1), base[::-1]], axis=2)
    return np.clip(img, 0, 255).astype(np.uint8)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_phash_invariances():
    img = _img(1)
    assert phash64(img) == phash64(img.copy())
    # resize: the defining robustness of a perceptual hash
    resized = resize_bilinear(img, 32, 24)
    assert _ham(phash64(img), phash64(resized)) <= 10  # 50% downscale
    # mild noise
    noisy = np.clip(
        img.astype(int) + np.random.default_rng(0).integers(-8, 9, img.shape),
        0, 255,
    ).astype(np.uint8)
    assert _ham(phash64(img), phash64(noisy)) <= 12
    # different scenes are far apart
    dists = [_ham(phash64(_img(s)), phash64(_img(s + 50))) for s in range(2, 8)]
    assert min(dists) > 20, dists  # measured 26-38


def test_spark_phash_and_neardup_pairs(spark):
    from pyspark.sql import functions as F

    from knightshift_spark.operators.multimodal import (
        image_phash,
        phash_neardup_pairs,
    )

    rows = []
    for i in range(8):
        img = _img(i * 100)
        rows.append((i, bytearray(encode_ppm(img))))
        # planted near-dup: the same scene at another resolution
        rows.append((i + 1000, bytearray(encode_ppm(resize_bilinear(img, 48, 36)))))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = image_phash(media)
    assert hashes.count() == 16
    # measured: planted twins at distance 4-14, cross-scene min 22 —
    # radius 15 separates cleanly and stays under the bands=16 guarantee
    pairs = phash_neardup_pairs(hashes, max_distance=15, bands=16).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # every planted twin found, nothing across scenes
    assert {(i, i + 1000) for i in range(8)} <= got
    assert all(b - a == 1000 for a, b in got)
    for r in pairs:
        assert r["distance"] <= 15


def test_pigeonhole_recall_is_exact(spark):
    """Within the guarantee radius (< bands), banding loses NOTHING:
    pairs equal the brute-force Hamming scan."""
    import itertools

    from knightshift_spark.operators.multimodal import phash_neardup_pairs

    rng = np.random.default_rng(3)
    base = int(rng.integers(0, 1 << 63))
    hashes = [(0, base)]
    for i in range(1, 12):
        h = base
        for bit in rng.choice(64, size=i % 5, replace=False):
            h ^= 1 << int(bit)
        hashes.append((i, h - (1 << 64) if h >= (1 << 63) else h))
    df = spark.createDataFrame(hashes, "media_id long, phash long")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in phash_neardup_pairs(df, max_distance=3, bands=4).collect()
    }
    want = set()
    for (ia, ha), (ib, hb) in itertools.combinations(hashes, 2):
        d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
        if d <= 3:
            want.add((min(ia, ib), max(ia, ib), d))
    assert got == want


def test_param_validation(spark):
    from knightshift_spark.operators.multimodal import phash_neardup_pairs

    df = spark.createDataFrame([(1, 0)], "media_id long, phash long")
    with pytest.raises(ValueError, match="divide"):
        phash_neardup_pairs(df, bands=5)
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_neardup_pairs(df, max_distance=4, bands=4)
