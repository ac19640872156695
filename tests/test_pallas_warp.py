"""Pallas fused warp kernel vs the XLA shear path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from aide_tpu.ops import warp
from aide_tpu.ops.pallas_warp import warp_rotate_flip


def _smooth(n=6, size=64, seed=0):
    rng = np.random.default_rng(seed)
    small = rng.random((8, 8, 3)).astype(np.float32)
    img = np.asarray(
        Image.fromarray((small * 255).astype(np.uint8), "RGB").resize(
            (size, size), Image.BILINEAR
        )
    ).astype(np.float32) / 255.0
    return jnp.asarray(np.stack([img] * n))


DEGS = jnp.asarray([0.0, 23.0, -37.0, 52.0, -60.0, 45.0])
FLIPS = jnp.asarray([0.0, 1.0, 0.0, 1.0, 0.0, 1.0])


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.slow
def test_matches_xla_shear_exactly(inverse):
    imgs = _smooth()
    fill = jnp.asarray(
        np.random.default_rng(1).normal(size=(6, 3)).astype(np.float32)
    )
    ref_fn = warp.invert if inverse else warp.augment
    ref = np.asarray(ref_fn(imgs, DEGS, FLIPS, fill, method="shear"))
    out = np.asarray(
        warp_rotate_flip(imgs, DEGS, FLIPS, fill, inverse=inverse, interpret=True)
    )
    assert np.abs(ref - out).max() < 1e-5


def test_auto_method_resolution():
    # on the CPU test backend 'auto' must resolve to the XLA shear path
    assert warp._resolve_method("auto") == "shear"
    assert warp._resolve_method("gather") == "gather"
