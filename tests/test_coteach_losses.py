"""Co-teaching loss library semantics tests (hand-constructed rankings)."""

import numpy as np
import jax.numpy as jnp
import pytest

from aide_tpu.ops import coteach, losses


def _confident_logits(pred, scale=8.0):
    """Binary map -> confident logits (B,H,W,2)."""
    p = np.asarray(pred, np.float32)
    return jnp.asarray(np.stack([(1 - p) * scale, p * scale], axis=-1))


def _batch_with_known_ranking():
    """4 images; image quality vs targets degrades with index for net1 and
    improves for net2, so the two nets rank oppositely."""
    rng = np.random.default_rng(0)
    targets = (rng.random((4, 8, 8)) > 0.5).astype(np.int32)
    preds1 = []
    preds2 = []
    for i in range(4):
        noise_lvl = i / 4.0
        flip = rng.random((8, 8)) < noise_lvl
        preds1.append(np.where(flip, 1 - targets[i], targets[i]))
        flip2 = rng.random((8, 8)) < (0.75 - noise_lvl)
        preds2.append(np.where(flip2, 1 - targets[i], targets[i]))
    return (
        _confident_logits(np.stack(preds1)),
        _confident_logits(np.stack(preds2)),
        jnp.asarray(targets),
    )


class TestDropImage:
    def test_exchange_uses_other_nets_ranking(self):
        l1, l2, t = _batch_with_known_ranking()
        # per-image losses define each net's ranking
        def per_img(lg):
            ce = jnp.mean(
                losses.cross_entropy_2d(lg, t, reduction="none"), axis=(1, 2)
            )
            return ce + losses.dice_loss(lg, t, reduction="none")

        v1, v2 = np.asarray(per_img(l1)), np.asarray(per_img(l2))
        keep1 = np.argsort(v1)[:3]  # net1's best images
        keep2 = np.argsort(v2)[:3]
        loss1, loss2 = coteach.coteach_drop_image(l1, l2, t, forget_rate=0.25)
        # net1 trains on net2's selection and vice versa
        assert np.allclose(float(loss1), v1[keep2].mean(), atol=1e-5)
        assert np.allclose(float(loss2), v2[keep1].mean(), atol=1e-5)

    def test_forget_zero_keeps_everything(self):
        l1, l2, t = _batch_with_known_ranking()
        loss1, _ = coteach.coteach_drop_image(l1, l2, t, forget_rate=0.0)
        def per_img(lg):
            ce = jnp.mean(
                losses.cross_entropy_2d(lg, t, reduction="none"), axis=(1, 2)
            )
            return ce + losses.dice_loss(lg, t, reduction="none")
        assert np.allclose(float(loss1), float(per_img(l1).mean()), atol=1e-5)


class TestWeightImage:
    def test_drop_weighting(self):
        l1, l2, t = _batch_with_known_ranking()
        def per_img(lg):
            ce = jnp.mean(
                losses.cross_entropy_2d(lg, t, reduction="none"), axis=(1, 2)
            )
            return ce + losses.dice_loss(lg, t, reduction="none")
        v1, v2 = np.asarray(per_img(l1)), np.asarray(per_img(l2))
        order2 = np.argsort(v2)
        expect1 = v1[order2[:3]].mean() + 0.1 * v1[order2[3:]].mean()
        loss1, _ = coteach.coteach_weight_image(l1, l2, t, forget_rate=0.25)
        assert np.allclose(float(loss1), expect1, atol=1e-5)


class TestDropRegion:
    def test_patch_exchange_shapes_and_finiteness(self):
        l1, l2, t = _batch_with_known_ranking()
        loss1, loss2 = coteach.coteach_drop_region_ce(
            l1, l2, t, forget_rate=0.25, scale=0.5
        )
        assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))

    def test_identical_nets_symmetric(self):
        l1, _, t = _batch_with_known_ranking()
        a, b = coteach.coteach_drop_region_ce(l1, l1, t, forget_rate=0.5)
        assert np.allclose(float(a), float(b), atol=1e-6)


class TestDropImageDropPixel:
    def test_runs_and_pixel_term_nonnegative(self):
        l1, l2, t = _batch_with_known_ranking()
        base1, base2 = coteach.coteach_drop_image(l1, l2, t, forget_rate=0.25)
        full1, full2 = coteach.coteach_drop_image_drop_pixel(
            l1, l2, t, forget_rate=0.25
        )
        # adds a 0.25-weighted foreground pixel loss on the dropped images
        assert float(full1) >= float(base1) - 1e-5
        assert float(full2) >= float(base2) - 1e-5


class TestPixelCoreg:
    def test_retention_bounds(self):
        l1, l2, t = _batch_with_known_ranking()
        loss, retention = coteach.pixel_coreg_focal_two_model(
            l1, l2, t, forget_rate=0.3, kd_weight=0.5
        )
        assert np.isfinite(float(loss))
        assert 0.0 <= float(retention) <= 1.0


class TestPixelCoregThreeModel:
    def test_three_model_runs(self):
        l1, l2, t = _batch_with_known_ranking()
        l3 = l1 * 0.9 + l2 * 0.1
        loss, retention = coteach.pixel_coreg_focal(
            l1, l2, l3, t, forget_rate=0.3, kd_weight=0.5
        )
        assert np.isfinite(float(loss))
        assert 0.0 <= float(retention) <= 1.0


class TestMulticlassWeightmap:
    def test_binary_matches_reference_formula(self):
        import jax.numpy as jnp
        from aide_tpu.ops import tta

        p = jnp.asarray([[[[0.5, 0.5], [0.9, 0.1]]]])
        w = np.asarray(tta.confidence_weightmap(p))[0, 0, :, 0]
        assert abs(w[0] - 0.0) < 1e-6
        assert abs(w[1] - (1 - 4 * 0.9 * 0.1)) < 1e-6

    def test_multiclass_entropy_bounds(self):
        import jax.numpy as jnp
        from aide_tpu.ops import tta

        uniform = jnp.full((1, 1, 1, 5), 0.2)
        certain = jnp.asarray([0.96, 0.01, 0.01, 0.01, 0.01]).reshape(1, 1, 1, 5)
        wu = float(tta.confidence_weightmap(uniform)[0, 0, 0, 0])
        wc = float(tta.confidence_weightmap(certain)[0, 0, 0, 0])
        assert wu < 0.01
        assert wc > 0.8


class TestDropRegionCeilMode:
    def test_partial_edge_patches_match_torch_ceil_pool(self):
        """h=10, scale=0.3 -> ph=3, kh=3: ceil-mode pooling emits a 4th
        partial patch row/col the reference's MaxPool2d(ceil_mode=True)
        includes (coteach_loss.py:174). Oracle: torch."""
        import torch

        rng = np.random.default_rng(7)
        logits1 = rng.normal(size=(2, 10, 10, 2)).astype(np.float32)
        logits2 = rng.normal(size=(2, 10, 10, 2)).astype(np.float32)
        targets = (rng.random((2, 10, 10)) > 0.5).astype(np.int32)

        loss1, loss2 = coteach.coteach_drop_region_ce(
            jnp.asarray(logits1), jnp.asarray(logits2), jnp.asarray(targets),
            forget_rate=0.25, scale=0.3,
        )

        pool = torch.nn.MaxPool2d(kernel_size=3, stride=3, ceil_mode=True)
        tl1 = pool(torch.from_numpy(logits1).permute(0, 3, 1, 2))
        tl2 = pool(torch.from_numpy(logits2).permute(0, 3, 1, 2))
        tt = pool(torch.from_numpy(targets.astype(np.float32))[:, None]).long()[:, 0]
        assert tl1.shape[-1] == 4  # the partial patch exists
        ce = torch.nn.CrossEntropyLoss(reduction="none")
        c1 = ce(tl1, tt).reshape(2, -1).numpy()
        c2 = ce(tl2, tt).reshape(2, -1).numpy()
        npatch = c1.shape[1]
        k = int(0.75 * npatch)
        idx1 = np.argsort(c1, axis=1)[:, :k]
        idx2 = np.argsort(c2, axis=1)[:, :k]
        exp1 = np.take_along_axis(c1, idx2, axis=1).mean()
        exp2 = np.take_along_axis(c2, idx1, axis=1).mean()
        assert np.allclose(float(loss1), exp1, atol=1e-5)
        assert np.allclose(float(loss2), exp2, atol=1e-5)
