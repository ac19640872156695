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


@pytest.mark.slow
def test_pallas_warp_512px_matches_shear_reference():
    """kidney's 512 px operating point: one (H, W) f32 slice is 1 MB —
    4x the CHAOS case — and must still match the pure-jnp shear warp
    (VERDICT r2 #7: the kernel had only been validated at <=256 px)."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)
    imgs = jnp.asarray(
        np.repeat(np.repeat(base, 8, axis=1), 8, axis=2)
        + 0.01 * rng.normal(size=(2, 512, 512, 1)).astype(np.float32)
    )
    degs = jnp.asarray([17.0, -41.0], jnp.float32)
    flips = jnp.asarray([0, 1], jnp.int32)
    fill = jnp.zeros((2, 1), jnp.float32)
    ref = np.asarray(warp.augment(imgs, degs, flips, fill, method="shear"))
    out = np.asarray(
        warp_rotate_flip(imgs, degs, flips, fill, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
