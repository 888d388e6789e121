"""Image codecs: lossless round-trips, lossy PSNR >= 40 dB, phash stability
(the north_rule per-row invariant: decoded-pixel allclose + caption equality
is wired end-to-end in test_images_pipeline.py)."""

from __future__ import annotations

import numpy as np
import pytest

from stac_to_geocore_spark.images.codecs import (
    decode_image,
    encode_image,
    phash64,
    psnr,
)

RNG = np.random.default_rng(7)


def _img(h=48, w=64):
    return RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["ppm", "png"])
def test_lossless_roundtrip_exact(fmt):
    px = _img()
    back = decode_image(encode_image(px, fmt), fmt)
    assert back.shape == px.shape
    assert (back == px).all()


def test_qjpg_lossy_psnr_above_bar():
    px = _img(128, 128)
    back = decode_image(encode_image(px, "qjpg"), "qjpg")
    assert back.shape == px.shape
    assert psnr(px, back) >= 40.0  # BASELINE.json input_hint bar
    assert not (back == px).all()  # actually lossy


def test_psnr_identical_is_inf():
    px = _img()
    assert psnr(px, px) == float("inf")


def test_unknown_format_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        encode_image(_img(), "jpegxl")
    with pytest.raises(NotImplementedError):
        decode_image(b"????", "webp")


def test_phash_deterministic_and_robust():
    px = _img(64, 64)
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    # mild noise -> small hamming distance; different image -> large
    noisy = np.clip(px.astype(np.int16) + RNG.integers(-8, 9, px.shape), 0, 255).astype(np.uint8)
    other = _img(64, 64)

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(h1, phash64(noisy)) <= 14
    assert ham(h1, phash64(other)) >= 18


def test_phash_any_aspect_ratio():
    assert isinstance(phash64(_img(33, 97)), int)
