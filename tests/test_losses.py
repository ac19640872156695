"""Loss semantics tests.

torch (CPU) is available in the image and serves as the behavioural oracle
for the reference's loss contracts (the reference is pure torch); expected
values are recomputed with torch.nn.functional here, not imported from the
reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from aide_tpu.ops import losses


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(np.float32)


@pytest.fixture
def logits_targets():
    logits = _rand((4, 8, 8, 2), seed=1)  # NHWC
    rng = np.random.default_rng(2)
    targets = rng.integers(0, 2, size=(4, 8, 8)).astype(np.int64)
    return logits, targets


def _to_torch_nchw(logits):
    return torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))


class TestCrossEntropy:
    def test_matches_torch_mean(self, logits_targets):
        logits, targets = logits_targets
        ours = losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(targets))
        ref = F.cross_entropy(_to_torch_nchw(logits), torch.from_numpy(targets))
        assert np.allclose(float(ours), float(ref), atol=1e-4)

    def test_matches_torch_none(self, logits_targets):
        logits, targets = logits_targets
        ours = losses.cross_entropy_2d(
            jnp.asarray(logits), jnp.asarray(targets), reduction="none"
        )
        ref = F.cross_entropy(
            _to_torch_nchw(logits), torch.from_numpy(targets), reduction="none"
        )
        assert np.allclose(np.asarray(ours), ref.numpy(), atol=1e-4)

    def test_class_weight_mean_matches_torch(self, logits_targets):
        logits, targets = logits_targets
        w = [0.3, 0.7]
        ours = losses.cross_entropy_2d(
            jnp.asarray(logits), jnp.asarray(targets), class_weight=w
        )
        ref = F.cross_entropy(
            _to_torch_nchw(logits),
            torch.from_numpy(targets),
            weight=torch.tensor(w),
        )
        assert np.allclose(float(ours), float(ref), atol=1e-4)

    def test_onehot_targets_argmaxed(self, logits_targets):
        """4-D targets are argmaxed to indices (loss2d.py:11-12)."""
        logits, targets = logits_targets
        onehot = np.eye(2, dtype=np.float32)[targets]  # (B,H,W,2)
        a = losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(onehot))
        b = losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(targets))
        assert np.allclose(float(a), float(b), atol=1e-6)

    def test_ignore_index(self, logits_targets):
        logits, targets = logits_targets
        t = targets.copy()
        t[0, :4] = 255
        ours = losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(t))
        ref = F.cross_entropy(
            _to_torch_nchw(logits), torch.from_numpy(t), ignore_index=255
        )
        assert np.allclose(float(ours), float(ref), atol=1e-4)


class TestDice:
    def _torch_dice(self, logits, targets, smooth=1.0, reduction="mean"):
        """DiceLoss semantics (loss2d.py:35-61) recomputed with torch."""
        inp = _to_torch_nchw(logits)
        n = targets.shape[0]
        inp = F.softmax(inp, dim=1)
        iflat = inp[:, 1].reshape(n, -1)
        tflat = torch.from_numpy(targets).reshape(n, -1).float()
        inter = (iflat * tflat).sum(1)
        loss = 1.0 - (2 * inter + smooth) / (iflat.sum(1) + tflat.sum(1) + smooth)
        return loss.sum() / n if reduction == "mean" else loss

    def test_mean(self, logits_targets):
        logits, targets = logits_targets
        ours = losses.dice_loss(jnp.asarray(logits), jnp.asarray(targets))
        ref = self._torch_dice(logits, targets)
        assert np.allclose(float(ours), float(ref), atol=1e-4)

    def test_none(self, logits_targets):
        logits, targets = logits_targets
        ours = losses.dice_loss(
            jnp.asarray(logits), jnp.asarray(targets), reduction="none"
        )
        ref = self._torch_dice(logits, targets, reduction="none")
        assert np.allclose(np.asarray(ours), ref.numpy(), atol=1e-4)

    def test_multiclass_onehot_sums_classes(self):
        logits = _rand((2, 8, 8, 5), seed=3)
        rng = np.random.default_rng(4)
        idx = rng.integers(0, 5, size=(2, 8, 8))
        onehot = np.eye(5, dtype=np.float32)[idx]
        ours = losses.multiclass_dice_loss(jnp.asarray(logits), jnp.asarray(onehot))
        # oracle: softmax once, per-class binary dice on probabilities, sum
        probs = F.softmax(_to_torch_nchw(logits), dim=1).numpy()
        total = 0.0
        for c in range(5):
            iflat = probs[:, c].reshape(2, -1)
            tflat = onehot[..., c].reshape(2, -1)
            inter = (iflat * tflat).sum(1)
            loss = 1.0 - (2 * inter + 1.0) / (iflat.sum(1) + tflat.sum(1) + 1.0)
            total += loss.sum() / 2
        assert np.allclose(float(ours), total, atol=1e-4)


class TestCombined:
    def test_cem_dice_image_is_ce_plus_dice(self, logits_targets):
        logits, targets = logits_targets
        v = losses.cem_dice_loss_image(jnp.asarray(logits), jnp.asarray(targets))
        assert v.shape == (4,)
        ce = np.asarray(
            losses.cross_entropy_2d(
                jnp.asarray(logits), jnp.asarray(targets), reduction="none"
            )
        ).mean(axis=(1, 2))
        dc = np.asarray(
            losses.multiclass_dice_loss(
                jnp.asarray(logits), jnp.asarray(targets), reduction="none"
            )
        )
        assert np.allclose(np.asarray(v), ce + dc, atol=1e-4)

    def test_mse_consistency_matches_torch(self, logits_targets):
        logits, _ = logits_targets
        probs = np.asarray(
            jnp.asarray(_rand((4, 8, 8, 2), seed=9))
        )
        probs = np.abs(probs)
        probs = probs / probs.sum(-1, keepdims=True)
        ours = losses.multiclass_mse_loss(jnp.asarray(logits), jnp.asarray(probs))
        ref = F.mse_loss(
            F.softmax(_to_torch_nchw(logits), dim=1),
            _to_torch_nchw(probs),
        )
        assert np.allclose(float(ours), float(ref), atol=1e-6)

    def test_focal_loss_finite(self, logits_targets):
        logits, targets = logits_targets
        v = losses.focal_loss(jnp.asarray(logits), jnp.asarray(targets))
        assert np.isfinite(float(v))

    def test_kl_bidirectional_symmetric_zero(self, logits_targets):
        logits, _ = logits_targets
        kl = losses.kl_bidirectional(jnp.asarray(logits), jnp.asarray(logits))
        assert np.allclose(np.asarray(kl), 0.0, atol=1e-6)
