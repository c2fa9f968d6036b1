"""Perceptual-hash media near-dup: locality of the hash, exact-pair
recovery through the banded join, and no all-pairs anywhere."""

from __future__ import annotations

import numpy as np


def _media(spark, payloads):
    rows = [(i, bytearray(p), "image") for i, p in enumerate(payloads)]
    return spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string"
    )


def test_identical_payloads_hash_equal(spark):
    from flink_rtcef_spark.operators.multimodal import (
        extract_features,
        fake_decode,
        perceptual_hash,
    )

    p = bytes(range(200)) * 3
    df = _media(spark, [p, p])
    h = [
        r["phash"]
        for r in perceptual_hash(extract_features(df, fake_decode)).collect()
    ]
    assert h[0] == h[1]


def test_perturbation_is_hamming_local(spark):
    from flink_rtcef_spark.operators.multimodal import (
        extract_features,
        fake_decode,
        perceptual_hash,
    )

    rng = np.random.RandomState(5)
    base = bytes(rng.randint(0, 256, 4096, dtype=np.uint8).tolist())
    tweaked = bytearray(base)
    tweaked[10] ^= 1  # one-byte flip
    other = bytes(rng.randint(0, 256, 4096, dtype=np.uint8).tolist())
    df = _media(spark, [base, bytes(tweaked), other])
    got = {
        r["media_id"]: r["phash"]
        for r in perceptual_hash(extract_features(df, fake_decode)).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(got[0], got[1]) <= 3          # near-identical media
    assert ham(got[0], got[2]) > 3           # unrelated media


def test_media_near_dup_finds_the_pair(spark):
    from flink_rtcef_spark.operators.multimodal import media_near_dup

    rng = np.random.RandomState(9)
    base = bytes(rng.randint(0, 256, 4096, dtype=np.uint8).tolist())
    tweaked = bytearray(base)
    tweaked[0] ^= 2
    others = [
        bytes(rng.randint(0, 256, 4096, dtype=np.uint8).tolist()) for _ in range(4)
    ]
    df = _media(spark, [base, bytes(tweaked)] + others)
    pairs = {(r["id_a"], r["id_b"]) for r in media_near_dup(df).collect()}
    assert (0, 1) in pairs
    # unrelated media never pair up
    assert all(p == (0, 1) for p in pairs)
