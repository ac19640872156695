"""Shear-warp (gather-free) vs gather-warp equivalence tests."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from aide_tpu.ops import warp


def _smooth(n=6, size=64, seed=0):
    rng = np.random.default_rng(seed)
    small = rng.random((8, 8, 3)).astype(np.float32)
    img = np.asarray(
        Image.fromarray((small * 255).astype(np.uint8), "RGB").resize(
            (size, size), Image.BILINEAR
        )
    ).astype(np.float32) / 255.0
    return np.stack([img] * n)


class TestShearWarp:
    @pytest.mark.parametrize("sign", [90.0, -90.0])
    def test_exact_90_degrees(self, sign):
        imgs = _smooth(1)
        g = np.asarray(
            warp.augment(jnp.asarray(imgs), jnp.asarray([sign]), jnp.zeros(1), method="gather")
        )
        s = np.asarray(
            warp.augment(jnp.asarray(imgs), jnp.asarray([sign]), jnp.zeros(1), method="shear")
        )
        assert np.abs(g - s).max() < 1e-5

    def test_matches_gather_interior(self):
        imgs = _smooth(6)
        degs = jnp.asarray([0.0, 23.0, -37.0, 52.0, -60.0, 45.0])
        flips = jnp.asarray([0.0, 1.0, 0.0, 1.0, 0.0, 1.0])
        g = np.asarray(warp.augment(jnp.asarray(imgs), degs, flips, method="gather"))
        s = np.asarray(warp.augment(jnp.asarray(imgs), degs, flips, method="shear"))
        diff = np.abs(g[:, 16:48, 16:48] - s[:, 16:48, 16:48]).mean()
        assert diff < 0.005, diff

    def test_roundtrip(self):
        imgs = _smooth(4)
        degs = jnp.asarray([31.0, -55.0, 10.0, 60.0])
        flips = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        aug = warp.augment(jnp.asarray(imgs), degs, flips)
        rec = np.asarray(warp.invert(aug, degs, flips))
        err = np.abs(rec[:, 20:44, 20:44] - imgs[:, 20:44, 20:44]).mean()
        assert err < 0.01, err

    def test_per_image_fill(self):
        imgs = _smooth(2)
        fill = jnp.asarray([[5.0, 6.0, 7.0], [1.0, 2.0, 3.0]])
        out = np.asarray(
            warp.augment(
                jnp.asarray(imgs), jnp.asarray([40.0, -40.0]), jnp.zeros(2), fill=fill
            )
        )
        assert np.allclose(out[0, 0, 0], [5.0, 6.0, 7.0], atol=1e-5)
        assert np.allclose(out[1, 0, 0], [1.0, 2.0, 3.0], atol=1e-5)

    def test_zero_rotation_identity(self):
        imgs = _smooth(1)
        out = np.asarray(
            warp.augment(jnp.asarray(imgs), jnp.zeros(1), jnp.zeros(1), method="shear")
        )
        assert np.abs(out - imgs).max() < 1e-5
