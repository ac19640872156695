"""On-device augmentation / inverse-augmentation tests.

The key invariant (SURVEY §7 "hard parts"): aug -> inverse-aug must be
(approximately) identity away from the rotation-fill border, and the on-device
warp of a *normalized* image with fill=(0-mean)/std must match
normalize-after-warp (the reference's ordering, transform.py:139-172).
"""

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from aide_tpu.ops import tta, warp


def _smooth_image(h=64, w=64, c=3, seed=0):
    rng = np.random.default_rng(seed)
    small = rng.random((h // 8, w // 8, c)).astype(np.float32)
    img = Image.fromarray((small * 255).astype(np.uint8), "RGB").resize(
        (w, h), Image.BILINEAR
    )
    return np.asarray(img).astype(np.float32) / 255.0


class TestWarp:
    def test_zero_rotation_identity(self):
        img = _smooth_image()[None]
        out = warp.augment(jnp.asarray(img), jnp.zeros(1), jnp.zeros(1))
        assert np.allclose(np.asarray(out), img, atol=1e-5)

    def test_flip_only_matches_numpy(self):
        img = _smooth_image()[None]
        out = warp.augment(jnp.asarray(img), jnp.zeros(1), jnp.ones(1))
        assert np.allclose(np.asarray(out), img[:, :, ::-1], atol=1e-5)

    def test_rotate_matches_pil(self):
        """Device rotation vs PIL bilinear rotate: agree in the interior."""
        img = _smooth_image(c=3)
        deg = 23.0
        ours = np.asarray(
            warp.augment(jnp.asarray(img[None]), jnp.asarray([deg]), jnp.zeros(1))
        )[0]
        pil = np.stack(
            [
                np.asarray(
                    Image.fromarray(img[..., ch], mode="F").rotate(
                        deg, Image.BILINEAR
                    )
                )
                for ch in range(3)
            ],
            axis=-1,
        )
        # compare away from fill borders
        inner = (slice(16, 48), slice(16, 48))
        diff = np.abs(ours[inner] - pil[inner])
        assert diff.mean() < 0.02, diff.mean()

    def test_aug_inverse_roundtrip(self):
        img = _smooth_image()[None]
        deg = jnp.asarray([31.0])
        flip = jnp.asarray([1.0])
        aug = warp.augment(jnp.asarray(img), deg, flip)
        rec = np.asarray(warp.invert(aug, deg, flip))
        inner = (slice(0, 1), slice(20, 44), slice(20, 44))
        err = np.abs(rec[inner] - img[inner]).mean()
        assert err < 0.02, err

    def test_normalize_commutes_with_fill(self):
        """warp(normalize(x), fill=(0-mean)/std) == normalize(warp(x, fill=0))."""
        img = _smooth_image()[None]
        mean = img.mean(axis=(1, 2), keepdims=True)
        std = img.std(axis=(1, 2), keepdims=True) + 1e-6
        deg, flip = jnp.asarray([40.0]), jnp.asarray([0.0])

        a = warp.augment(
            jnp.asarray((img - mean) / std),
            deg,
            flip,
            fill=jnp.asarray((-mean / std)[:, 0, 0, :]),
        )
        b = (np.asarray(warp.augment(jnp.asarray(img), deg, flip, 0.0)) - mean) / std
        assert np.abs(np.asarray(a) - b).max() < 1e-4


class TestTTA:
    def test_view_params_shapes_and_range(self):
        key = jax.random.key(0)
        deg, flip = tta.sample_view_params(key, 4, 8, 60.0)
        assert deg.shape == (4, 8) and flip.shape == (4, 8)
        assert float(jnp.max(jnp.abs(deg))) <= 60.0
        assert set(np.unique(np.asarray(flip))) <= {0.0, 1.0}

    def test_make_invert_views_roundtrip(self):
        img = _smooth_image(h=32, w=32)[None].repeat(2, axis=0)
        key = jax.random.key(1)
        deg, flip = tta.sample_view_params(key, 3, 2, 45.0)
        views = tta.make_views(jnp.asarray(img), deg, flip)
        assert views.shape == (3, 2, 32, 32, 3)
        rec = np.asarray(tta.invert_views(views, deg, flip))
        ref = np.broadcast_to(img[None], rec.shape)
        err = np.abs(
            rec[:, :, 10:22, 10:22] - ref[:, :, 10:22, 10:22]
        ).mean()
        assert err < 0.05

    def test_sharpen_modes(self):
        p = jnp.asarray([[0.7, 0.3]])
        s1 = tta.sharpen(p, 2.0, "pow_t")
        s2 = tta.sharpen(p, 0.5, "pow_inv_t")
        assert np.allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
        assert float(s1[0, 0]) > 0.7  # sharpening increases confidence
        sid = tta.sharpen(p, 1.0, "pow_t")
        assert np.allclose(np.asarray(sid), np.asarray(p), atol=1e-6)

    def test_weightmap(self):
        p = jnp.asarray([[[[0.5, 0.5]], [[1.0, 0.0]]]])  # (1,2,1,2)
        w = tta.confidence_weightmap(p)
        assert np.allclose(np.asarray(w)[0, :, 0, 0], [0.0, 1.0], atol=1e-6)

    def test_ensemble_identity_views(self):
        """With zero-rotation views the pseudo label equals mean softmax."""
        logits = jnp.asarray(
            np.random.default_rng(5).normal(size=(4, 2, 8, 8, 2)).astype(np.float32)
        )
        deg = jnp.zeros((4, 2))
        flip = jnp.zeros((4, 2))
        pseudo, wmap = tta.ensemble_pseudo_labels(logits, deg, flip, 1.0)
        expect = np.asarray(jax.nn.softmax(logits, axis=-1)).mean(axis=0)
        assert np.allclose(np.asarray(pseudo), expect, atol=1e-5)
        assert wmap.shape == (2, 8, 8, 1)


class TestNonSquare:
    def test_augment_invert_nonsquare_routes_to_gather(self):
        """Non-square images are valid API inputs: auto/shear/pallas all
        route to the gather path (the 3-shear formulation needs a square
        canvas for its 90-degree composition)."""
        import pytest  # noqa: F401

        img = jnp.asarray(
            np.stack([_smooth_image(h=8, w=16), _smooth_image(h=8, w=16, seed=1)])
        )
        deg = jnp.asarray([30.0, -75.0])
        hf = jnp.asarray([0.0, 1.0])
        ref = warp.augment(img, deg, hf, 0.0, method="gather")
        for method in ("auto", "shear", "pallas"):
            out = warp.augment(img, deg, hf, 0.0, method=method)
            assert out.shape == img.shape
            back = warp.invert(out, deg, hf, 0.0, method=method)
            assert back.shape == img.shape
            assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_pallas_direct_call_rejects_nonsquare(self):
        import pytest

        from aide_tpu.ops.pallas_warp import warp_rotate_flip

        img = jnp.asarray(_smooth_image(h=8, w=16))[None]
        with pytest.raises(ValueError, match="square"):
            warp_rotate_flip(img, jnp.zeros(1), jnp.zeros(1), 0.0)


def test_make_views_numpy_fill():
    """A NumPy (B, C) per-image fill must tile across views exactly like a
    jnp fill (regression: the isinstance check skipped np.ndarray)."""
    img = jnp.asarray(
        np.stack([_smooth_image(h=16, w=16), _smooth_image(h=16, w=16, seed=1)])
    )
    b, c = img.shape[0], img.shape[-1]
    deg = jnp.asarray(np.full((3, b), 20.0, np.float32))
    hf = jnp.zeros((3, b))
    fill_np = np.arange(b * c, dtype=np.float32).reshape(b, c)
    out_np = tta.make_views(img, deg, hf, fill_np)
    out_j = tta.make_views(img, deg, hf, jnp.asarray(fill_np))
    assert out_np.shape == (3,) + img.shape
    assert np.allclose(np.asarray(out_np), np.asarray(out_j))
